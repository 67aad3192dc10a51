"""Numerics tests for softmax variants (SURVEY.md §4 test-pyramid item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops import (
    SOFTMAX_MAPPING,
    clipped_softmax,
    clipped_softmax1,
    softmax_1,
    softmax_n,
    vanilla_softmax,
)
from outeffhop_tpu.ops.softmax_variants import alpha_clipped_softmax


def naive_softmax_n(x, n, axis=-1):
    # Direct, unstabilized formula — ground truth on moderate inputs.
    e = np.exp(np.asarray(x, dtype=np.float64))
    return e / (n + e.sum(axis=axis, keepdims=True))


@pytest.mark.parametrize("n", [0, 1, 4])
def test_softmax_n_matches_closed_form(n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 7)).astype(np.float32) * 3
    got = softmax_n(jnp.asarray(x), n)
    want = naive_softmax_n(x, n)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_softmax_1_rows_sum_below_one():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    p = softmax_1(x)
    sums = np.asarray(p.sum(axis=-1))
    assert (sums < 1.0).all()
    assert (np.asarray(p) >= 0).all()


def test_softmax_1_not_shift_invariant_but_stable():
    """The denominator's +1 must be shifted by exp(-max): check against the
    closed form at large logit magnitudes where the naive formula overflows."""
    x = jnp.array([[1000.0, 999.0, 998.0]])
    p = softmax_1(x)
    # exp(1000) >> 1, so effectively plain softmax here
    want = naive_softmax_n(np.array([[0.0, -1.0, -2.0]]), 0)
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-5)
    assert np.isfinite(np.asarray(p)).all()

    # Very negative logits: denominator dominated by the +1 term → p ≈ exp(x)
    x2 = jnp.array([[-50.0, -51.0]])
    p2 = np.asarray(softmax_1(x2))
    np.testing.assert_allclose(p2, np.exp(np.array([[-50.0, -51.0]])), rtol=1e-5)

    # shift-variance: softmax_1(x) != softmax_1(x + c)
    x3 = jnp.array([[0.0, 1.0, 2.0]])
    a = np.asarray(softmax_1(x3))
    b = np.asarray(softmax_1(x3 + 5.0))
    assert np.abs(a - b).max() > 1e-3


def test_clipped_softmax_reaches_exact_zero_and_one():
    x = jnp.array([[10.0, -10.0, -10.0, -10.0]])
    p = np.asarray(clipped_softmax(x, gamma=-0.1, eta=1.1))
    assert p[0, 0] == 1.0
    assert (p[0, 1:] == 0.0).all()


def test_clipped_softmax_formula():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9)).astype(np.float32)
    gamma, eta = -0.03, 1.02
    got = np.asarray(clipped_softmax(jnp.asarray(x), gamma=gamma, eta=eta))
    sm = naive_softmax_n(x, 0)
    want = np.clip(sm * (eta - gamma) + gamma, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_clipped_softmax1_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 9)).astype(np.float32)
    gamma, eta = -0.025, 1.1
    got = np.asarray(clipped_softmax1(jnp.asarray(x), gamma=gamma, eta=eta))
    sm = naive_softmax_n(x, 1)
    want = np.clip(sm * (eta - gamma) + gamma, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


REFERENCE_KEYS = [
    "vanilla", "softmax1", "entmax",
    "clipped(0:1.0003)", "clipped(0:1.001)", "clipped(0:1.002)",
    "clipped(0:1.003)", "clipped(0:1.004)", "clipped(0:1.01)",
    "clipped(0:1.02)", "clipped(0:1.03)", "clipped(0:1.1)",
    "clipped(-.1:1)", "clipped(-.00001:1)", "clipped(-.00003:1)",
    "clipped(-.0001:1)", "clipped(-.0003:1)", "clipped(-.0005:1)",
    "clipped(-.001:1)", "clipped(-.002:1)", "clipped(-.0025:1)",
    "clipped(-.003:1)", "clipped(-.004:1)", "clipped(-.005:1)",
    "clipped(-.01:1)", "clipped(-.015:1)", "clipped(-.02:1)",
    "clipped(-.025:1)", "clipped(-.03:1)", "clipped(-.04:1)",
    "clipped(-.001:1.001)", "clipped(-.002:1.002)", "clipped(-.003:1.003)",
    "clipped(-.005:1.005)", "clipped(-.01:1.01)", "clipped(-.03:1.03)",
    "clipped(-.1:1.1)",
    "clippedsoftmax1(-.025:1)", "clippedsoftmax1(-.00001:1)",
    "clippedsoftmax1(-.0001:1)",
]


def test_registry_keys_match_reference():
    # Exact key parity with transformers_language/models/softmax.py:22-64
    assert set(SOFTMAX_MAPPING.keys()) == set(REFERENCE_KEYS)


def test_registry_quirks_preserved():
    """Reference preserves two name/param mismatches (softmax.py:53,61)."""
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 8)).astype(np.float32))
    got = np.asarray(SOFTMAX_MAPPING["clippedsoftmax1(-.025:1)"](x))
    want = np.asarray(clipped_softmax1(x, gamma=-0.025, eta=1.1))  # eta=1.1!
    np.testing.assert_allclose(got, want)

    got2 = np.asarray(SOFTMAX_MAPPING["clipped(-.005:1.005)"](x))
    want2 = np.asarray(clipped_softmax(x, gamma=-0.003, eta=1.005))  # gamma=-0.003!
    np.testing.assert_allclose(got2, want2)


def test_alpha_clipped_softmax():
    fn = alpha_clipped_softmax(alpha=12.0, max_seq_length=128)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 128)).astype(np.float32))
    got = np.asarray(fn(x))
    want = np.asarray(clipped_softmax(x, gamma=-12.0 / 128, eta=1.0))
    np.testing.assert_allclose(got, want)


def test_softmax_1_grad_finite():
    x = jnp.asarray(np.random.default_rng(6).normal(size=(4, 8)).astype(np.float32))
    g = jax.grad(lambda t: softmax_1(t).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_vanilla_matches_jax():
    x = jnp.asarray(np.random.default_rng(7).normal(size=(3, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(vanilla_softmax(x)), np.asarray(jax.nn.softmax(x, axis=-1))
    )
