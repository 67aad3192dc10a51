"""Real INT8 execution: pre-quantized int8 weights + integer matmuls.

The reference's W8A8 stack is *simulation only* — fake-quant floats through
cuBLAS (`hijacker.py:78-101` caches dequantized weights at eval). This module
is the deployment half the TPU build adds on top of the same calibration
pipeline: weights stored as int8 with per-out-channel scales, activations
quantized on the fly (statically from frozen calibration ranges, or
dynamically per-tensor), and the matmul executed as int8×int8→int32 on the
MXU via `ops.int8_matmul` with a fused dequant epilogue.

Numerics contract: with static input qparams the result equals the fake-quant
simulation `fake_quant(x) @ fake_quant(w).T + b` to float-associativity error
(the integer grids are identical; only summation order differs) — tested in
tests/test_int8_exec.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.ops.int8_matmul import w8a8_matmul
from outeffhop_tpu.quant.fake_quant import (
    QParams,
    qparams_from_range_symmetric,
    to_integer,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Int8Dense:
    """A dense layer frozen for integer execution.

    w_int: (O, I) int8, symmetric per-out-channel grid;
    w_scale: (O,) f32; w_colsum: (O,) f32 = Σ_I w_int (zero-point correction);
    bias: (O,) f32 or None.
    """

    w_int: Array
    w_scale: Array
    w_colsum: Array
    bias: Optional[Array]


jax.tree_util.register_dataclass(
    Int8Dense, data_fields=["w_int", "w_scale", "w_colsum", "bias"], meta_fields=[]
)


def quantize_dense(params: Dict[str, Array], n_bits: int = 8) -> Int8Dense:
    """Freeze a {'weight': (O, I), 'bias': (O,)} dense param dict to int8
    storage with a symmetric per-out-channel grid (the default weight method,
    `quant_configs.py:13-16` + per-channel axis 0)."""
    w = params["weight"].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=1)
    qp = qparams_from_range_symmetric(-absmax, absmax, n_bits=n_bits, signed=True)
    scale = qp.scale  # (O,)
    w_int = jnp.clip(
        jnp.round(w / scale[:, None]), qp.int_min, qp.int_max
    ).astype(jnp.int8)
    return Int8Dense(
        w_int=w_int,
        w_scale=scale,
        w_colsum=jnp.sum(w_int.astype(jnp.int32), axis=1).astype(jnp.float32),
        bias=params.get("bias"),
    )


def quantize_dense_with_qparams(params: Dict[str, Array], qp: QParams) -> Int8Dense:
    """Freeze with externally computed (calibrated) symmetric weight qparams —
    keeps int8 storage bit-identical to the fake-quant simulation grid."""
    if not qp.symmetric:
        raise ValueError("int8 execution requires symmetric weight qparams")
    w = params["weight"].astype(jnp.float32)
    scale = qp.scale
    scale_col = scale.reshape(-1, 1) if scale.ndim > 0 else scale
    w_int = jnp.clip(jnp.round(w / scale_col), qp.int_min, qp.int_max).astype(jnp.int8)
    scale_vec = jnp.broadcast_to(scale.reshape(-1), (w.shape[0],))
    return Int8Dense(
        w_int=w_int,
        w_scale=scale_vec,
        w_colsum=jnp.sum(w_int.astype(jnp.int32), axis=1).astype(jnp.float32),
        bias=params.get("bias"),
    )


def _quantize_input(x: Array, x_qp: Optional[QParams]):
    """→ (x_int8, scale, zp_in_int8_grid). Static path converts the
    asymmetric uint8 grid to int8 by rebasing −128 (the MXU consumes int8);
    dynamic path is per-tensor symmetric from the current absmax."""
    if x_qp is not None:
        x_q = to_integer(x, x_qp)  # uint8 (asymmetric) or int8 (symmetric)
        zp = x_qp.zero_point.astype(jnp.float32)
        if x_q.dtype == jnp.uint8:
            x_q = (x_q.astype(jnp.int32) - 128).astype(jnp.int8)
            zp = zp - 128.0
        return x_q, x_qp.scale.astype(jnp.float32), zp
    absmax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
    scale = absmax / 127.0
    x_q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return x_q, scale, jnp.zeros((), jnp.float32)


def int8_dense_apply(
    ip: Int8Dense,
    x: Array,
    x_qp: Optional[QParams] = None,
    out_dtype=None,
    use_pallas: Optional[bool] = None,
) -> Array:
    """y = x @ Wᵀ + b executed in int8. x: (..., I) float; returns (..., O).

    `x_qp`: frozen per-tensor input qparams (static quantization, matches the
    calibrated simulation); None → dynamic per-tensor symmetric.
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    x_int, x_scale, x_zp = _quantize_input(x2, x_qp)
    y = w8a8_matmul(
        x_int,
        ip.w_int.T,  # (I, O) = (K, N)
        x_scale,
        x_zp,
        ip.w_scale,
        ip.w_colsum,
        ip.bias,
        out_dtype=jnp.float32,
        use_pallas=use_pallas,
    )
    return y.reshape(*lead, -1).astype(out_dtype)


def build_int8_dense_map(
    discovered_weights: Dict[str, tuple],
    weight_qparams: Dict[str, Optional[QParams]],
    params_by_site: Optional[Dict[str, Dict[str, Array]]] = None,
) -> Dict[str, Int8Dense]:
    """Freeze every calibrated symmetric dense weight site to Int8Dense.

    `discovered_weights` comes from the discover pass (name → (tensor, axis));
    weight names carry the '|w' suffix. Sites with qparams=None (fp32_head
    policies) or asymmetric grids are skipped — they stay on the float path.
    Bias lookup uses `params_by_site` when given (site name without suffix →
    dense param dict); otherwise biases ride the float residual epilogue of
    the caller.
    """
    out: Dict[str, Int8Dense] = {}
    for name, (w, axis) in discovered_weights.items():
        qp = weight_qparams.get(name)
        if qp is None or not qp.symmetric or w.ndim != 2 or axis != 0:
            continue
        site = name[: -len("|w")] if name.endswith("|w") else name
        params = {"weight": w}
        if params_by_site and site in params_by_site:
            params = params_by_site[site]
        out[name] = quantize_dense_with_qparams(params, qp)
    return out
