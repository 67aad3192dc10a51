"""Quantizer unit tests (SURVEY.md §4 test-pyramid item 2): round-trip, STE
gradient, per-channel reshape, range-setter edge cases."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.quant import (
    QParams,
    dequantize,
    fake_quant,
    qparams_from_range_asymmetric,
    qparams_from_range_symmetric,
    round_ste,
    scale_grad,
    to_integer,
)
from outeffhop_tpu.quant.fake_quant import reshape_per_channel


def np_fake_quant_asym(x, x_min, x_max, n_bits=8, eps=1e-8):
    """Reference formula transcription (uniform_quantizers.py:92-148,204-224)."""
    x_min = np.minimum(x_min, 0.0)
    x_max = np.maximum(x_max, eps)
    int_max = 2.0**n_bits - 1
    delta = (x_max - x_min) / int_max
    zero_float = -x_min / delta
    scale = np.maximum(delta, eps)
    zp = np.clip(np.round(zero_float), 0, int_max)
    x_int = np.clip(np.round(x / scale) + zp, 0, int_max)
    return scale * (x_int - zp)


def test_asymmetric_matches_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64,)).astype(np.float32) * 4 + 1
    qp = qparams_from_range_asymmetric(x.min(), x.max(), n_bits=8)
    got = np.asarray(fake_quant(jnp.asarray(x), qp))
    want = np_fake_quant_asym(x, x.min(), x.max())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_asymmetric_grid_contains_zero():
    # min>0 is clamped to 0 so zero is always representable
    qp = qparams_from_range_asymmetric(0.5, 3.0, n_bits=8)
    z = np.asarray(fake_quant(jnp.zeros(()), qp))
    assert z == 0.0
    assert float(qp.x_min) <= 0.0


def test_range_setter_min_positive_clamped():
    # x_min forced <= 0, x_max forced >= eps (uniform_quantizers.py:198-200)
    qp = qparams_from_range_asymmetric(2.0, 5.0)
    assert float(qp.zero_point) == 0.0  # zero_float = -min(2,0)/delta = 0
    qp2 = qparams_from_range_asymmetric(-1.0, -0.5)  # max clamped to eps
    assert float(qp2.x_max) >= 0.0


def test_symmetric_signed_grid():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64,)).astype(np.float32)
    qp = qparams_from_range_symmetric(x.min(), x.max(), n_bits=8)
    assert qp.signed
    assert qp.int_min == -128 and qp.int_max == 127
    got = np.asarray(fake_quant(jnp.asarray(x), qp))
    absmax = max(abs(min(x.min(), 0)), x.max())
    delta = absmax / 127
    want = np.clip(np.round(x / delta), -128, 127) * delta
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_symmetric_unsigned_grid():
    x = np.abs(np.random.default_rng(2).normal(size=(32,))).astype(np.float32)
    qp = qparams_from_range_symmetric(x.min(), x.max(), n_bits=8)
    assert not qp.signed
    assert qp.int_min == 0 and qp.int_max == 255


def test_quantization_error_bound():
    rng = np.random.default_rng(3)
    x = rng.uniform(-2, 3, size=(1000,)).astype(np.float32)
    qp = qparams_from_range_asymmetric(x.min(), x.max(), n_bits=8)
    err = np.abs(np.asarray(fake_quant(jnp.asarray(x), qp)) - x)
    assert err.max() <= float(qp.scale) / 2 + 1e-6


def test_round_ste_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(round_ste(x * 3.0)))(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_fake_quant_ste_gradient():
    # inside range: dy/dx = 1; outside (clipped): 0
    qp = qparams_from_range_asymmetric(-1.0, 1.0, n_bits=8)
    g = jax.grad(lambda x: jnp.sum(fake_quant(x, qp)))(
        jnp.array([0.0, 0.5, -0.9, 100.0, -100.0])
    )
    g = np.asarray(g)
    np.testing.assert_allclose(g[:3], 1.0, atol=1e-6)
    np.testing.assert_allclose(g[3:], 0.0, atol=1e-6)


def test_learned_range_gradient_flows_to_delta():
    # learn_ranges parity: delta participates in autodiff through the STE graph
    qp = qparams_from_range_asymmetric(-1.0, 1.0, n_bits=8)
    x = jnp.linspace(-2, 2, 64)

    def loss(delta):
        qp2 = dataclasses.replace(qp, delta=delta)
        return jnp.sum(jnp.square(fake_quant(x, qp2) - x))

    g = float(jax.grad(loss)(qp.delta))
    assert np.isfinite(g) and g != 0.0


def test_scale_grad_lsq():
    g = jax.grad(lambda s: 2.0 * scale_grad(s, jnp.float32(0.25)))(jnp.float32(1.0))
    assert float(g) == 0.5


def test_grad_scaling_fake_quant():
    qp = qparams_from_range_asymmetric(-1.0, 1.0, n_bits=8)
    x = jnp.linspace(-0.5, 0.5, 16)

    def loss(delta, gs):
        qp2 = dataclasses.replace(qp, delta=delta)
        return jnp.sum(fake_quant(x, qp2, grad_scaling=gs))

    g_plain = float(jax.grad(loss)(qp.delta, False))
    g_scaled = float(jax.grad(loss)(qp.delta, True))
    expect = (qp.int_max * x.size) ** -0.5
    np.testing.assert_allclose(g_scaled, g_plain * expect, rtol=1e-5)


def test_per_channel_weights():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(8, 16)).astype(np.float32) * np.arange(1, 9)[:, None]
    qp = qparams_from_range_symmetric(
        jnp.asarray(w.min(axis=1)), jnp.asarray(w.max(axis=1)), n_bits=8
    )
    qp = reshape_per_channel(qp, w.ndim)
    assert qp.delta.shape == (8, 1)
    got = np.asarray(fake_quant(jnp.asarray(w), qp))
    for c in range(8):
        qpc = qparams_from_range_symmetric(w[c].min(), w[c].max(), n_bits=8, signed=True)
        want = np.asarray(fake_quant(jnp.asarray(w[c]), qpc))
        np.testing.assert_allclose(got[c], want, rtol=1e-5, atol=1e-6)


def test_integer_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(128,)).astype(np.float32)
    qp = qparams_from_range_symmetric(x.min(), x.max(), n_bits=8)
    xi = to_integer(jnp.asarray(x), qp)
    assert xi.dtype == jnp.int8
    # int-storage dequant must equal fake-quant exactly
    np.testing.assert_allclose(
        np.asarray(dequantize(xi, qp)),
        np.asarray(fake_quant(jnp.asarray(x), qp)),
        rtol=1e-6,
        atol=1e-7,
    )


def test_int16_storage():
    x = jnp.linspace(-4, 4, 100)
    qp = qparams_from_range_symmetric(-4.0, 4.0, n_bits=16, signed=True)
    xi = to_integer(x, qp)
    assert xi.dtype == jnp.int16
    np.testing.assert_allclose(np.asarray(dequantize(xi, qp)), np.asarray(x), atol=2e-4)


def test_learned_ranges_qat():
    """`learn_ranges`/`make_range_trainable` parity (`base_quantizers.py:40-46`,
    `quantization_manager.py:80-87`): QParams.delta/zero_float are pytree
    leaves, fake_quant is differentiable through the STE, and a few gradient
    steps on delta shrink the quantization MSE below the minmax-range MSE."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.fake_quant import (
        QParams, fake_quant, qparams_from_range_asymmetric,
    )

    import optax

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(0, 1, 4096), jnp.float32)
    # start from a deliberately 5x-too-wide range (poor calibration)
    bad = qparams_from_range_asymmetric(5 * jnp.min(x), 5 * jnp.max(x), n_bits=8)
    good = qparams_from_range_asymmetric(jnp.min(x), jnp.max(x), n_bits=8)

    def loss(leaves):
        delta, zero = leaves
        q = QParams(delta=delta, zero_float=zero, n_bits=8, symmetric=False)
        return jnp.mean((fake_quant(x, q) - x) ** 2)

    leaves = (bad.delta, bad.zero_float)
    mse0 = float(loss(leaves))
    g = jax.grad(loss)(leaves)
    assert all(bool(jnp.isfinite(t)) for t in jax.tree.leaves(g))
    assert float(jnp.abs(g[0])) > 0.0  # gradient actually reaches the scale

    tx = optax.adam(1e-3)
    st = tx.init(leaves)
    for _ in range(800):
        g = jax.grad(loss)(leaves)
        u, st = tx.update(g, st)
        leaves = optax.apply_updates(leaves, u)
    mse_learned = float(loss(leaves))
    mse_good = float(loss((good.delta, good.zero_float)))
    # recovers to within 10% of the well-calibrated range's MSE
    assert mse_learned < mse0 * 0.1
    assert mse_learned < mse_good * 1.1, (mse_learned, mse_good)


def test_grad_scaling_rescales_range_gradients():
    """LSQ grad scaling (`calculate_grad_scale`, uniform_quantizers.py:150-157):
    with grad_scaling=True the delta gradient is multiplied by
    1/sqrt(int_max * numel)."""
    import jax
    import jax.numpy as jnp
    from outeffhop_tpu.quant.fake_quant import QParams, fake_quant

    x = jnp.linspace(-1.0, 1.0, 64)

    def loss(delta, scaling):
        q = QParams(delta=delta, zero_float=jnp.zeros(()), n_bits=8,
                    symmetric=True, signed=True)
        return jnp.sum(fake_quant(x, q, grad_scaling=scaling) ** 2)

    g_plain = jax.grad(loss)(jnp.asarray(0.01), False)
    g_scaled = jax.grad(loss)(jnp.asarray(0.01), True)
    expect = float(g_plain) * (127 * 64) ** -0.5
    assert abs(float(g_scaled) - expect) < abs(expect) * 1e-4 + 1e-8


def test_fp8_round_trip_error_bounds():
    """e4m3 has a 3-bit mantissa: scaled round-trip relative error per element
    is bounded by ~2^-4 of the channel absmax; exact zeros/absmax preserved."""
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.fp8 import fp8_quantize, fp8_round_trip

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(16, 32).astype(np.float32))
    w = w.at[0, 0].set(0.0)
    out = fp8_round_trip(w, per_channel_axis=0)
    assert out.shape == w.shape and out.dtype == w.dtype
    err = np.abs(np.asarray(out) - np.asarray(w))
    absmax = np.abs(np.asarray(w)).max(axis=1, keepdims=True)
    assert float(out[0, 0]) == 0.0
    # worst-case e4m3 quantization step near absmax is absmax/2^3 * 0.5
    assert np.all(err <= absmax / 8.0 + 1e-6)
    # channel absmax element is exactly representable (maps to E4M3_MAX)
    vals, scale = fp8_quantize(w, per_channel_axis=0)
    assert vals.dtype == jnp.float8_e4m3fn
    i = int(np.abs(np.asarray(w)[3]).argmax())
    rt = float(vals[3, i].astype(jnp.float32) * scale[3, 0])
    assert abs(rt - float(w[3, i])) < 1e-6


def test_fp8_cast_params_skips_small_leaves():
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.fp8 import fp8_cast_params

    rs = np.random.RandomState(1)
    params = {
        "dense": {"weight": jnp.asarray(rs.randn(8, 4), jnp.float32),
                  "bias": jnp.asarray(rs.randn(8), jnp.float32)},
        "ln": {"weight": jnp.ones((4,)), "bias": jnp.zeros((4,))},
        "maybe": None,
        "ids": jnp.arange(4, dtype=jnp.int32),
    }
    out = fp8_cast_params(params)
    assert np.array_equal(out["dense"]["bias"], params["dense"]["bias"])
    assert np.array_equal(out["ln"]["weight"], params["ln"]["weight"])
    assert out["maybe"] is None
    assert np.array_equal(out["ids"], params["ids"])
    assert not np.array_equal(out["dense"]["weight"], params["dense"]["weight"])
    assert np.allclose(out["dense"]["weight"], params["dense"]["weight"], atol=0.2)
