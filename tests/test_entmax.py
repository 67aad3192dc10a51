"""Entmax/sparsemax numerics + gradient tests, cross-checked against the
reference algorithms re-implemented in pure numpy (not against torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops import entmax15, entmax_bisect, sparsemax
from outeffhop_tpu.ops.entmax import alpha_from_pre_alpha


def np_sparsemax(x):
    """Ground-truth sparsemax (Martins & Astudillo 2016) per row."""
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    for i in range(x.shape[0]):
        z = np.sort(x[i])[::-1]
        css = np.cumsum(z) - 1
        k = np.arange(1, len(z) + 1)
        support = k * z > css
        k_z = k[support][-1]
        tau = css[support][-1] / k_z
        out[i] = np.maximum(x[i] - tau, 0)
    return out


def test_sparsemax_simplex_projection():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 13)).astype(np.float32) * 2
    got = np.asarray(sparsemax(jnp.asarray(x)))
    want = np_sparsemax(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)
    assert (got >= 0).all()


def test_sparsemax_shift_invariant():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 7)).astype(np.float32))
    a = np.asarray(sparsemax(x))
    b = np.asarray(sparsemax(x + 100.0))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_entmax15_properties():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 11)).astype(np.float32) * 3)
    p = np.asarray(entmax15(x))
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
    assert (p >= 0).all()
    # sparser than softmax: at least some exact zeros at scale 3
    assert (p == 0).sum() > 0
    # order-preserving
    xi = np.asarray(x)
    for r in range(xi.shape[0]):
        order = np.argsort(xi[r])
        assert (np.diff(p[r][order]) >= -1e-6).all()


def test_entmax15_matches_bisect():
    """Exact sort-based entmax15 must agree with the 1.5-alpha bisection."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 9)).astype(np.float32) * 2)
    a = np.asarray(entmax15(x))
    b = np.asarray(entmax_bisect(x, alpha=1.5, n_iter=50))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4)


def test_entmax_bisect_alpha2_is_sparsemax():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    a = np.asarray(entmax_bisect(x, alpha=2.0, n_iter=50))
    b = np.asarray(sparsemax(x))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4)


def test_entmax_bisect_alpha_near_1_is_softmax():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    a = np.asarray(entmax_bisect(x, alpha=1.02, n_iter=50))
    b = np.asarray(jax.nn.softmax(x, axis=-1))
    np.testing.assert_allclose(a, b, rtol=0.15, atol=0.02)


def test_entmax15_gradient_formula():
    """Backward: dX = dY*sqrt(Y) - (sum(dY*sqrt(Y))/sum(sqrt(Y)))*sqrt(Y)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))
    y, vjp = jax.vjp(entmax15, x)
    (dx,) = vjp(dy)
    g = np.sqrt(np.asarray(y))
    dxe = np.asarray(dy) * g
    q = dxe.sum(-1, keepdims=True) / g.sum(-1, keepdims=True)
    want = dxe - q * g
    np.testing.assert_allclose(np.asarray(dx), want, rtol=1e-4, atol=1e-5)


def test_sparsemax_gradient_zeros_masked():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32) * 3)
    dy = jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))
    y, vjp = jax.vjp(sparsemax, x)
    (dx,) = vjp(dy)
    y, dx = np.asarray(y), np.asarray(dx)
    assert (dx[y == 0] == 0).all()
    # gradient sums to ~0 over support per row (projection property)
    np.testing.assert_allclose(dx.sum(-1), 0.0, atol=1e-5)


def test_entmax_bisect_alpha_gradient_finite_diff():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float64))
    alpha0 = 1.7

    def loss(a):
        p = entmax_bisect(x.astype(jnp.float32), alpha=a, n_iter=50)
        return jnp.sum(p * p)

    g = float(jax.grad(loss)(jnp.float32(alpha0)))
    eps = 1e-3
    fd = (float(loss(alpha0 + eps)) - float(loss(alpha0 - eps))) / (2 * eps)
    assert abs(g - fd) < 5e-2, (g, fd)


def test_entmax_axis_argument():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(4, 5, 6)).astype(np.float32))
    a = np.asarray(entmax15(x, axis=1))
    b = np.moveaxis(np.asarray(entmax15(jnp.moveaxis(x, 1, -1))), -1, 1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_alpha_chooser_map():
    p = jnp.array([-10.0, 0.0, 10.0])
    a = np.asarray(alpha_from_pre_alpha(p))
    np.testing.assert_allclose(a[1], 2.0, rtol=1e-6)
    assert a[0] >= 1.0001 and a[2] <= 3.0


def test_entmax_bisect_per_row_alpha():
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    alphas = jnp.array([[1.3], [1.5], [2.0]])
    p = np.asarray(entmax_bisect(x, alpha=alphas))
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
    # row 1 must match scalar-alpha call
    p15 = np.asarray(entmax_bisect(x[1:2], alpha=1.5))
    np.testing.assert_allclose(p[1:2], p15, rtol=1e-5, atol=1e-6)
