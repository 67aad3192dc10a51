"""Float8 (e4m3) weight quantization — the TPU-native analogue of the
reference's quanto-qfloat8 path (`validate_vit.py:487`:
``quantize(model, weights=quanto.qfloat8, ...)``; that driver ships with
broken imports upstream, so this re-creates the *capability*, not the code).

Weight-only float8: each float weight matrix is scaled per output channel to
the e4m3 representable range, cast to ``float8_e4m3fn``, and dequantized back
to the compute dtype. Quantization error is the e4m3 round-trip (4-bit
mantissa), exactly what qfloat8 weight quantization does on GPU. Activations
stay in the compute dtype (quanto's default for qfloat8 weights).

Storage-oriented callers can keep the ``(fp8, scale)`` pair from
:func:`fp8_quantize` for a 2x (vs bf16) / 4x (vs f32) footprint reduction; the
eval drivers use :func:`fp8_cast_params`, which folds the dequant back into
the param pytree so every model forward works unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

E4M3_MAX = 448.0  # max finite magnitude of float8_e4m3fn


def fp8_quantize(
    w: Array, per_channel_axis: Optional[int] = 0
) -> Tuple[Array, Array]:
    """Quantize a float array to (float8_e4m3fn values, float32 scales).

    ``w ≈ values.astype(f32) * scale`` with scales chosen so the largest
    magnitude per channel maps to E4M3_MAX (absmax scaling, the qfloat8
    recipe). ``per_channel_axis=None`` uses one per-tensor scale.
    """
    wf = w.astype(jnp.float32)
    if per_channel_axis is None:
        absmax = jnp.max(jnp.abs(wf))
    else:
        reduce_axes = tuple(i for i in range(wf.ndim) if i != per_channel_axis)
        absmax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / E4M3_MAX
    vals = (wf / scale).astype(jnp.float8_e4m3fn)
    return vals, scale


def fp8_dequantize(vals: Array, scale: Array, dtype=jnp.float32) -> Array:
    return (vals.astype(jnp.float32) * scale).astype(dtype)


def fp8_round_trip(
    w: Array, per_channel_axis: Optional[int] = 0
) -> Array:
    vals, scale = fp8_quantize(w, per_channel_axis)
    return fp8_dequantize(vals, scale, w.dtype)


def fp8_cast_params(params: Any, min_ndim: int = 2) -> Any:
    """Round-trip every float leaf with ndim >= ``min_ndim`` through scaled
    e4m3 (weight matrices / conv kernels / embeddings; biases, LN params and
    scalars stay untouched). Returns a pytree of the same structure/dtypes.

    Per-channel scales go on the out-features axis: axis 0 for this repo's
    (out, in) Linear layout (the INT8 stack's ``per_channel_axis=0``
    convention, models/common.py:dense) — EXCEPT the ViT patch-embed kernel,
    which is stored matmul-ready as (P*P*C, D) (models/vit.py:133-137) and so
    carries its filters on axis 1; scaling it per axis 0 would be per input
    row, coarser than quanto's per-filter qfloat8 granularity.
    """

    def cast(path, x):
        if x is None or not jnp.issubdtype(x.dtype, jnp.floating) or x.ndim < min_ndim:
            return x
        is_patch_embed = any(
            getattr(p, "key", None) == "patch_embed" for p in path
        )
        return fp8_round_trip(x, per_channel_axis=1 if is_patch_embed else 0)

    return jax.tree_util.tree_map_with_path(
        cast, params, is_leaf=lambda x: x is None
    )
