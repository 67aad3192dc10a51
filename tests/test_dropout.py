"""Dropout unit tests — incl. the uint8-threshold variant
(--dropout_rng_bits 8: four thresholds per generated 32-bit word)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.models import common


@pytest.fixture(autouse=True)
def _restore_dropout_bits():
    yield
    common.set_dropout_rng_bits(32)


def test_dropout_deterministic_and_zero_rate_passthrough():
    x = jnp.ones((4, 8))
    rng = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(common.dropout(x, 0.5, rng, True), x)
    np.testing.assert_array_equal(common.dropout(x, 0.0, rng, False), x)
    np.testing.assert_array_equal(common.dropout(x, 0.5, None, False), x)


@pytest.mark.parametrize("bits", [32, 8])
def test_dropout_keep_fraction_and_unbiasedness(bits):
    common.set_dropout_rng_bits(bits)
    rate = 0.1
    x = jnp.ones((256, 1024), jnp.float32)
    y = np.asarray(common.dropout(x, rate, jax.random.PRNGKey(3), False))
    kept = (y != 0).mean()
    # 8-bit path: keep prob rounds to round(0.9*256)/256 = 230/256
    expect_keep = round((1 - rate) * 256) / 256 if bits == 8 else (1 - rate)
    assert abs(kept - expect_keep) < 0.01
    # survivor rescale keeps the expectation exact regardless of rounding
    assert abs(y.mean() - 1.0) < 0.01
    # survivors are scaled by exactly 1/actual_keep
    nz = y[y != 0]
    np.testing.assert_allclose(nz, 1.0 / expect_keep, rtol=1e-6)


def test_dropout_u8_odd_sizes_and_grad():
    common.set_dropout_rng_bits(8)
    # size not divisible by 4 exercises the bitcast slice
    x = jnp.arange(1, 1 + 7 * 13, dtype=jnp.float32).reshape(7, 13)
    y = common.dropout(x, 0.25, jax.random.PRNGKey(0), False)
    assert y.shape == x.shape
    # keep prob that rounds to 1 -> passthrough
    np.testing.assert_array_equal(
        common.dropout(x, 1e-4, jax.random.PRNGKey(0), False), x
    )
    # gradient flows only through the kept mask
    g = jax.grad(lambda v: common.dropout(v, 0.25, jax.random.PRNGKey(0), False).sum())(x)
    mask = np.asarray(y != 0)
    t = round(0.75 * 256)
    np.testing.assert_allclose(np.asarray(g)[mask], 256.0 / t, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(g)[~mask], 0.0)


def test_dropout_u8_jits_under_vmap_and_scan_shapes():
    common.set_dropout_rng_bits(8)

    @jax.jit
    def f(rng, x):
        return common.dropout(x, 0.5, rng, False)

    x = jnp.ones((3, 5, 17))
    y = f(jax.random.PRNGKey(1), x)
    assert y.shape == x.shape
    kept = float((y != 0).mean())
    assert 0.3 < kept < 0.7
