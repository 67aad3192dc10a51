"""Fused single-token decode attention over the serving engine's slot cache.

The decode hot loop the reference never had (it ships no serving stack;
SURVEY.md §7 step 6 makes it this framework's north-star new capability) is a
(slots, 1)-query attention against (slots, H, bucket, D) caches. The XLA
lowering of that path is a chain of small ops (two einsums, concat, f32 mask
add + clamp, softmax, slice, scale multiplies) whose intermediates bounce
through HBM — round-3 probe17 measured the INT8 cache variant 40% SLOWER than
bf16 because the int8→bf16 conversion and the per-token scale multiplies
materialize instead of fusing (VERDICT r3 #4).

This kernel does the whole step in VMEM, one program per slot:

    scores[h,t] = Σ_d q[h,d]·K[h,t,d]   (+ k_scale[h,t] dequant for int8)
    softmax_n over [scores · mask, score_new]  (phantom-n + optional clip)
    ctx[h,d]    = Σ_t probs[h,t]·V[h,t,d] + p_new[h]·v_new[h,d]

so the int8 cache is DMA'd from HBM as int8 (exactly half the bf16 traffic —
the whole point of the Int8KV format, `models/opt.py:56-77`) and every
intermediate stays in registers/VMEM. The additive mask arrives as a
(slots, 1, bucket) f32 row (same layout trick as the flash kernels' bias).

Numerics match `opt_attention`'s decode_fast XLA path (exact per-token
dequant: k_scale commutes with the QK contraction, v_scale folds into the
probs row) — tested in interpret mode against the jnp reference below.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outeffhop_tpu.ops.pallas_checks import validate_block_specs

Array = jax.Array

NEG_INF = -1e30


def _decode_kernel(
    q_ref,        # (1, H, D)        bf16 (scale already folded into q)
    k_ref,        # (1, H, B, D)     bf16 | int8
    v_ref,        # (1, H, B, D)     bf16 | int8
    k_new_ref,    # (1, H, D)        bf16
    v_new_ref,    # (1, H, D)        bf16
    mask_ref,     # (1, 1, B)        f32 additive (−1e30 at invalid positions)
    k_scale_ref,  # (1, H, B) f32 or None
    v_scale_ref,  # (1, H, B) f32 or None
    o_ref,        # (1, H, D)
    *,
    softmax_n: float,
    clip: Optional[Tuple[float, float]],
):
    q = q_ref[0]                     # (H, D)
    k = k_ref[0]                     # (H, B, D) — int8 converts in-register
    # per-head matvec as multiply+lane-reduce on the VPU: Mosaic cannot lower
    # a batched dot_general with a rank-2 operand (probe22 r4:
    # `failed to parse TPU_DotDimensionNumbersAttr`), and the step is
    # HBM-bandwidth-bound on the cache read, not FLOP-bound
    scores = jnp.sum(
        k.astype(jnp.float32) * q.astype(jnp.float32)[:, None, :], axis=-1
    )  # (H, B)
    if k_scale_ref is not None:
        scores = scores * k_scale_ref[0]
    scores = scores + mask_ref[0]    # (1, B) sublane-broadcast over H
    score_new = jnp.sum(
        (q * k_new_ref[0]).astype(jnp.float32), axis=-1, keepdims=True
    )  # (H, 1)

    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), score_new)
    if softmax_n:
        m = jnp.maximum(m, 0.0)  # phantom zero-logit joins the max shift
    p = jnp.exp(scores - m)          # (H, B); masked positions underflow to 0
    p_new = jnp.exp(score_new - m)   # (H, 1)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
    if softmax_n:
        denom = denom + softmax_n * jnp.exp(-m)
    p = p / denom
    p_new = p_new / denom
    if clip is not None:
        gamma, eta = clip
        p = jnp.clip(p * (eta - gamma) + gamma, 0.0, 1.0)
        p_new = jnp.clip(p_new * (eta - gamma) + gamma, 0.0, 1.0)
    if v_scale_ref is not None:
        p = p * v_scale_ref[0]       # exact dequant folded into the probs row
    ctx = jnp.sum(
        p[:, :, None] * v_ref[0].astype(jnp.float32), axis=1
    )  # (H, D)
    ctx = ctx + p_new.astype(jnp.float32) * v_new_ref[0].astype(jnp.float32)
    o_ref[0] = ctx.astype(o_ref.dtype)


def _kernel_nbits(q_ref, k_ref, v_ref, kn_ref, vn_ref, mask_ref, o_ref, **kw):
    _decode_kernel(q_ref, k_ref, v_ref, kn_ref, vn_ref, mask_ref, None, None,
                   o_ref, **kw)


def decode_attention(
    q: Array,
    k_cache: Array,
    v_cache: Array,
    k_new: Array,
    v_new: Array,
    mask: Array,
    k_scale: Optional[Array] = None,
    v_scale: Optional[Array] = None,
    *,
    softmax_n: float = 0.0,
    clip: Optional[Tuple[float, float]] = None,
    interpret: bool = False,
) -> Array:
    """Fused decode-step attention for every slot.

    Args:
      q: (S, H, D) current-token queries, score scale already folded in.
      k_cache, v_cache: (S, H, B, D) — bf16/f32, or int8 with `k_scale`/
        `v_scale` (S, H, B) f32 per-token-per-head dequant scales.
      k_new, v_new: (S, H, D) the current token's K/V (always compute dtype).
      mask: (S, B) additive f32 mask over cache positions (−big = invalid).
      softmax_n / clip: the fused softmax-variant decomposition.

    Returns (S, H, D) context in q's dtype.
    """
    s, h, d = q.shape
    b = k_cache.shape[2]
    int8 = k_scale is not None

    # per-program VMEM: one slot's K+V cache blocks (double-buffered by the
    # pipeline) + their in-kernel f32 upcasts + the f32 score rows. Mosaic's
    # scoped-vmem stack limit is 16 MB; bucket 2048 computes 24.2 MB here and
    # Mosaic reported exactly 24.00M before SIGABRTing the remote compile
    # (probe22b) — fail fast on the host with an actionable message instead.
    blk = h * b * d
    per_program = (
        2 * 2 * blk * k_cache.dtype.itemsize  # k+v blocks, double-buffered
        + 2 * blk * 4  # f32 working copies in the kernel body
        + 2 * h * b * 4  # score + prob rows
    )
    if per_program > 14 * 1024 * 1024:
        raise ValueError(
            f"decode_attention block (H={h}, bucket={b}, D={d}, "
            f"{k_cache.dtype}) needs ~{per_program / 2**20:.1f} MB of VMEM "
            "per program (> the ~14 MB budget); use the XLA decode path "
            "(EngineConfig.fused_decode=False) at this cache size"
        )
    mask3 = mask.reshape(s, 1, b).astype(jnp.float32)

    specs = [
        pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, h, b, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, h, b, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0)),
    ]
    shapes = [
        ((1, h, d), q.shape), ((1, h, b, d), k_cache.shape),
        ((1, h, b, d), v_cache.shape), ((1, h, d), k_new.shape),
        ((1, h, d), v_new.shape), ((1, 1, b), mask3.shape),
    ]
    args = [q, k_cache, v_cache, k_new, v_new, mask3]
    if int8:
        specs += [
            pl.BlockSpec((1, h, b), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, b), lambda i: (i, 0, 0)),
        ]
        shapes += [((1, h, b), k_scale.shape), ((1, h, b), v_scale.shape)]
        args += [k_scale, v_scale]
        kernel = functools.partial(_decode_kernel, softmax_n=softmax_n, clip=clip)
    else:
        kernel = functools.partial(_kernel_nbits, softmax_n=softmax_n, clip=clip)
    validate_block_specs(shapes, kernel="decode_attention")

    itemsize = k_cache.dtype.itemsize
    bytes_accessed = (
        (k_cache.size + v_cache.size) * itemsize
        + (q.size + k_new.size + v_new.size) * q.dtype.itemsize
        + s * b * 4
    )
    if int8:
        bytes_accessed += (k_scale.size + v_scale.size) * 4
    return pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, h, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * h * b * d,
            bytes_accessed=bytes_accessed,
            transcendentals=s * h * b,
        ),
        interpret=interpret,
    )(*args)


def decode_attention_reference(
    q, k_cache, v_cache, k_new, v_new, mask, k_scale=None, v_scale=None,
    *, softmax_n=0.0, clip=None,
):
    """jnp reference (the decode_fast XLA path restructured to this layout)."""
    kc = k_cache.astype(jnp.float32)
    scores = jnp.einsum("shd,shbd->shb", q.astype(jnp.float32), kc)
    if k_scale is not None:
        scores = scores * k_scale
    scores = scores + mask[:, None, :].astype(jnp.float32)
    score_new = jnp.sum(
        q.astype(jnp.float32) * k_new.astype(jnp.float32), -1, keepdims=True
    )
    full = jnp.concatenate([scores, score_new], axis=-1)
    from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn

    p = softmax_n_fn(full, softmax_n, axis=-1)
    if clip is not None:
        gamma, eta = clip
        p = jnp.clip(p * (eta - gamma) + gamma, 0.0, 1.0)
    probs, p_new = p[..., :-1], p[..., -1:]
    if v_scale is not None:
        probs = probs * v_scale
    ctx = jnp.einsum("shb,shbd->shd", probs, v_cache.astype(jnp.float32))
    ctx = ctx + p_new * v_new.astype(jnp.float32)
    return ctx.astype(q.dtype)
