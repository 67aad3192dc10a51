"""INT8 execution path: integer matmul kernel + Int8Dense numerics.

Contract (quant/int8_exec.py): with static input qparams, integer execution
equals the fake-quant simulation to float-associativity error; the Pallas
kernel (interpreter mode on CPU) matches the XLA dot_general path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops.int8_matmul import (
    w8a8_matmul_pallas,
    w8a8_matmul_xla,
)
from outeffhop_tpu.quant.fake_quant import (
    fake_quant,
    qparams_from_range_asymmetric,
    qparams_from_range_symmetric,
    reshape_per_channel,
)
from outeffhop_tpu.quant.int8_exec import (
    Int8Dense,
    build_int8_dense_map,
    int8_dense_apply,
    quantize_dense,
    quantize_dense_with_qparams,
)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).normal(size=shape).astype("float32") * scale
    )


def _dense_params(O, I, seed=0):
    return {"weight": _rand((O, I), seed, 0.1), "bias": _rand((O,), seed + 1, 0.01)}


# ---------------------------------------------------------------------------
# Kernel-level: Pallas (interpret) vs XLA vs integer numpy reference
# ---------------------------------------------------------------------------


def _int_args(M=48, K=96, N=72, seed=0, zp=-10.0):
    rs = np.random.RandomState(seed)
    x_int = jnp.asarray(rs.randint(-128, 128, (M, K)), jnp.int8)
    w_int = jnp.asarray(rs.randint(-128, 128, (K, N)), jnp.int8)
    x_scale = jnp.asarray(0.013, jnp.float32)
    x_zp = jnp.asarray(zp, jnp.float32)
    w_scale = jnp.asarray(rs.uniform(0.001, 0.02, N), jnp.float32)
    w_colsum = jnp.sum(w_int.astype(jnp.int32), axis=0).astype(jnp.float32)
    bias = jnp.asarray(rs.normal(size=N), jnp.float32)
    return x_int, w_int, x_scale, x_zp, w_scale, w_colsum, bias


def _numpy_reference(x_int, w_int, x_scale, x_zp, w_scale, w_colsum, bias):
    acc = np.asarray(x_int, np.int64) @ np.asarray(w_int, np.int64)
    corrected = acc.astype(np.float64) - float(x_zp) * np.asarray(w_colsum, np.float64)
    return corrected * float(x_scale) * np.asarray(w_scale, np.float64) + np.asarray(
        bias, np.float64
    )


def test_xla_path_matches_integer_reference():
    args = _int_args()
    got = w8a8_matmul_xla(*args)
    np.testing.assert_allclose(got, _numpy_reference(*args), rtol=1e-5)


def test_pallas_kernel_matches_xla_path():
    args = _int_args(M=40, K=80, N=56, seed=1)
    xla = w8a8_matmul_xla(*args)
    pallas = w8a8_matmul_pallas(*args, interpret=True, bm=32, bn=128, bk=128)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(xla), rtol=1e-5)


def test_pallas_kernel_multiblock_accumulation():
    # K spans several bk blocks; M/N ragged vs block sizes.
    args = _int_args(M=70, K=300, N=130, seed=2, zp=5.0)
    pallas = w8a8_matmul_pallas(*args, interpret=True, bm=32, bn=128, bk=128)
    # reference is float64; kernel epilogue is float32 → ~1e-4 relative
    np.testing.assert_allclose(
        np.asarray(pallas), _numpy_reference(*args), rtol=5e-4
    )


def test_pallas_kernel_no_bias():
    x_int, w_int, xs, xzp, ws, cs, _ = _int_args(seed=3)
    got = w8a8_matmul_pallas(
        x_int, w_int, xs, xzp, ws, cs, None, interpret=True, bm=32, bn=128, bk=128
    )
    ref = w8a8_matmul_xla(x_int, w_int, xs, xzp, ws, cs, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


# ---------------------------------------------------------------------------
# Int8Dense: freeze + apply
# ---------------------------------------------------------------------------


def test_quantize_dense_roundtrip_close():
    p = _dense_params(32, 64)
    ip = quantize_dense(p)
    assert ip.w_int.dtype == jnp.int8
    w_back = ip.w_int.astype(jnp.float32) * ip.w_scale[:, None]
    # per-channel int8 round-trip: ≤ delta/2 per element
    assert float(jnp.max(jnp.abs(w_back - p["weight"]) / ip.w_scale[:, None])) <= 0.5 + 1e-4


def test_static_int8_matches_fake_quant_simulation():
    """Integer execution == fake-quant simulation on the same grids."""
    O, I, B = 48, 96, 16
    p = _dense_params(O, I, seed=10)
    x = _rand((B, I), 11, 2.0)

    # per-channel symmetric weight grid (the default policy)
    absmax = jnp.max(jnp.abs(p["weight"]), axis=1)
    wqp = qparams_from_range_symmetric(-absmax, absmax, signed=True)
    wqp_bc = jax.tree.map(lambda d: d.reshape(-1, 1), wqp)  # broadcast vs (O, I)
    xqp = qparams_from_range_asymmetric(jnp.min(x), jnp.max(x))

    sim = fake_quant(x, xqp) @ fake_quant(
        p["weight"], wqp_bc, per_channel=True
    ).T + p["bias"]

    ip = quantize_dense_with_qparams(p, wqp)
    got = int8_dense_apply(ip, x, x_qp=xqp, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(sim), rtol=1e-4, atol=1e-4)


def test_dynamic_int8_close_to_float():
    p = _dense_params(32, 128, seed=20)
    x = _rand((8, 128), 21)
    ref = x @ p["weight"].T + p["bias"]
    got = int8_dense_apply(quantize_dense(p), x, use_pallas=False)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel


def test_int8_dense_apply_3d_input():
    p = _dense_params(16, 32, seed=30)
    x = _rand((2, 5, 32), 31)
    out = int8_dense_apply(quantize_dense(p), x, use_pallas=False)
    assert out.shape == (2, 5, 16)


def test_build_int8_dense_map_skips_fp32_and_asymmetric():
    w_sym = _rand((8, 16), 40)
    absmax = jnp.max(jnp.abs(w_sym), axis=1)
    qp_sym = qparams_from_range_symmetric(-absmax, absmax, signed=True)
    qp_asym = qparams_from_range_asymmetric(jnp.asarray(-1.0), jnp.asarray(1.0))
    discovered = {
        "enc.q|w": (w_sym, 0),
        "head|w": (w_sym, 0),  # fp32_head → qparams None
        "odd|w": (w_sym, 0),  # asymmetric grid
    }
    qps = {"enc.q|w": qp_sym, "head|w": None, "odd|w": qp_asym}
    m = build_int8_dense_map(discovered, qps)
    assert set(m) == {"enc.q|w"}
    assert m["enc.q|w"].bias is None


def test_int8_wired_through_model_dense():
    """common.dense consults the run-mode ctx's int8 map."""
    from outeffhop_tpu.models import common
    from outeffhop_tpu.quant.calibrate import QuantCtx
    from outeffhop_tpu.quant.config import QuantizedModelConfig

    p = _dense_params(24, 48, seed=50)
    x = _rand((4, 48), 51)
    ip = quantize_dense(p)
    ctx = QuantCtx.run(
        QuantizedModelConfig(), {}, {}, int8_dense={"blk.fc|w": ip}
    )
    got = common.dense(p, x, q=ctx.scoped("blk"), name="fc")
    expect = int8_dense_apply(ip, x, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5)
    # without the map, the float path is taken
    ctx2 = QuantCtx.run(QuantizedModelConfig(), {}, {})
    ref = common.dense(p, x, q=ctx2.scoped("blk"), name="fc")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(x @ p["weight"].T + p["bias"]), rtol=1e-5)


def test_int8_wired_dense_keeps_float_bias():
    """Int8Dense built without a bias (discover-pass map) must still add the
    param pytree's float bias in common.dense."""
    from outeffhop_tpu.models import common
    from outeffhop_tpu.quant.calibrate import QuantCtx
    from outeffhop_tpu.quant.config import QuantizedModelConfig
    from outeffhop_tpu.quant.int8_exec import Int8Dense

    p = _dense_params(16, 32, seed=60)
    p["bias"] = p["bias"] + 3.0  # decidedly nonzero
    x = _rand((4, 32), 61)
    ip_nobias = Int8Dense(
        w_int=quantize_dense(p).w_int,
        w_scale=quantize_dense(p).w_scale,
        w_colsum=quantize_dense(p).w_colsum,
        bias=None,
    )
    ctx = QuantCtx.run(QuantizedModelConfig(), {}, {}, int8_dense={"m.fc|w": ip_nobias})
    got = common.dense(p, x, q=ctx.scoped("m"), name="fc")
    ref = x @ p["weight"].T + p["bias"]
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel


def test_pallas_default_blocks_ragged_shapes():
    """Regression (ADVICE r1): default block sizes must round up to the int8
    TPU tile granularity (32, 128) for ragged shapes like M=40, never tiles
    of the raw ragged size."""
    args = _int_args(M=40, K=80, N=56, seed=4)
    got = w8a8_matmul_pallas(*args, interpret=True)  # default bm/bn/bk
    ref = w8a8_matmul_xla(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
