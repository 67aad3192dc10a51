"""Fused softmax_n flash attention — the framework's headline Pallas kernel.

The reference computes attention as three separate cuBLAS/elementwise ops
(QK^T matmul → softmax_1 → PV matmul, `bert_attention.py:222-292`), leaving the
(B, H, T, T) score tensor in HBM. Here the whole pipeline is one Pallas kernel
using the online-softmax (flash) recurrence, extended to softmax_n:

    softmax_n needs denominator  n·exp(-max) + Σ exp(s - max).
    The online recurrence already rescales the running denominator by
    exp(m_old - m_new) at each block, which is exactly how the shifted zero
    term must track the running max — so softmax_n costs ONE extra term added
    to the final denominator: out = acc / (l_final + n·exp(-m_final)).

This preserves the reference's stability semantics exactly
(`vutils/softmax_1.py:4-21`: the phantom zero logit is shifted by the same max
as the real logits; softmax_n is not shift-invariant).

Supports: additive padding bias (B, 1, 1, K) (BERT/OPT mask layout), causal
masking (OPT decoder), arbitrary n (0 = vanilla flash attention, 1 = OutEffHop
softmax_1), and the clipped-softmax(_n) epilogue `clip(p*(eta-gamma)+gamma,
0, 1)` (`transformers_language/models/softmax.py:10-19`) on every ONE-PASS
path: the stretch-and-clip acts on *normalized* probabilities, so it cannot
commute with the online recurrence (SURVEY.md §7 hard parts) — but the
one-pass kernels (short/packed/whole-K-block) normalize the full row in VMEM
before the PV matmul, where the clip is a free two-op epilogue. Only the
long-sequence recurrence path rejects `clip`; entmax stays on the XLA path.

Both public entry points carry a `jax.custom_vjp` (the reference's training
loop is its main activity, `run_mlm.py:554-673`). Backward story, by path:
the packed one-pass path has a whole-row Pallas recompute backward
(`_packed_bwd_kernel`, +10% e2e on the ViT-base train step); the long-seq
RECURRENCE path has a streaming flash backward (`_recurrence_bwd_impl`) —
the forward saves per-row log-denominators and two kernels recompute
p = exp(s − L) blockwise, so attention memory stays O(T) in training:
measured 2.28x over all-XLA at OPT T4096 and the only trainable path at
T8192, where XLA autodiff's saved score residuals exceed HBM (BASELINE.md
probe45/45b); remaining paths fall back to an XLA recompute of the jnp
reference — exact for softmax_n/clip/causal/bias in all cases.

K/V stream through VMEM in `block_k` chunks via the grid's innermost
dimension, so sequence length is bounded by HBM, not VMEM; Pallas double-
buffers the K/V block DMAs automatically.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outeffhop_tpu.ops.pallas_checks import validate_block_specs

Array = jax.Array

NEG_INF = -1e30  # large-negative mask fill that survives fp32 exp arithmetic


def _scores(
    q_ref, k_ref, bias_ref, iq, ik, *, scale, causal, block_q, block_k, causal_offset=0
):
    """Scaled, biased, (optionally) causally-masked scores block in f32.
    The QK^T dot runs in the inputs' native dtype (bf16 on the fast path) with
    f32 accumulation — upcasting before the dot would force the MXU off its
    bf16 path (4x slower). Causal masking is end-aligned when t_q != t_k
    (query i attends to keys ≤ i + (t_k - t_q)), matching jnp.tril(k=t_k-t_q)
    in `attention_reference`."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)  # (1, bk) broadcasts
    if causal:
        q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(q_pos + causal_offset >= k_pos, s, NEG_INF)
    return s


# Fold the (bb, 1, T_k) bias row into the FULL-shape additive mask tensor
# instead of adding it straight onto the dot output. On-chip bisect history:
#   * round 3: a (1, t_q, t_k) causal mask broadcast through jnp.where
#     SIGABRT'd Mosaic's ApplyVectorLayout (`limits[i] <= dim(i) (64 vs 1)`)
#     — fixed by full-shape iota masks (`_causal_keep`).
#   * round 4 (probe23 vs probe26): the SAME signature returned for
#     bias+causal at B8xT512 **only when scale == 1.0** (models fold the
#     1/sqrt(d) into q, so the `s * scale` multiply between the dot and the
#     bias add is elided and the singleton-broadcast add lands directly on
#     the matmul output). With the default scale (a real multiply in
#     between) the identical call compiles — probe26's unfixed variants all
#     PASS while probe23's scale=1.0 calls all crashed.
# Fix: in the causal case, add bias onto the iota-generated mask tensor
# (register-resident, full shape) and apply ONE full-shape add to the dot
# output; non-causal keeps the plain add (measured safe at every shape).
# The flag exists only so results/perf_probe26b.py can A/B on chip.
_FOLD_BIAS_INTO_MASK = True


def _bias_causal_fold(shape, bias, causal, causal_offset):
    """Returns the full-shape additive tensor combining the causal mask and
    the bias row (or None when neither applies). `shape` = score tile shape
    (bb, T_q, T_k); bias (bb|1, 1, T_k) f32."""
    if causal:
        keep = _causal_keep(shape, causal_offset)
        add = jnp.where(keep, 0.0, NEG_INF)
        if bias is not None:
            add = add + bias  # broadcasts onto the iota tensor, not the dot
        return add
    if bias is not None:
        return jnp.broadcast_to(bias, shape)
    return None


def _causal_keep(shape, causal_offset):
    """Full-shape causal keep-mask (query i attends to keys <= i + offset).

    Deliberately materialized at the score tile's FULL static shape (incl. the
    leading batch/head-group dim): a (1, t_q, t_k) mask broadcast through
    `jnp.where` crashes Mosaic's ApplyVectorLayout pass on-chip
    (`Check failed: limits[i] <= dim(i) (64 vs. 1)` — round-3 probe14, OPT
    e2e B8xT512). Full-shape iotas cost nothing (iota is generated in
    registers) and sidestep the singleton-broadcast lowering path entirely.
    Regression: tests/test_flash.py::test_kernel_masks_are_full_shape.
    """
    q_pos = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return q_pos + causal_offset >= k_pos


def _clip_epilogue(p, clip):
    """Stretch-then-clip on NORMALIZED probabilities — the clipped-softmax(_n)
    semantics (`softmax.py:10-19`): clip(p*(eta-gamma)+gamma, 0, 1). Only legal
    on one-pass paths where the full row is normalized in VMEM."""
    if clip is None:
        return p
    gamma, eta = clip
    return jnp.clip(p * (eta - gamma) + gamma, 0.0, 1.0)


def _flash_kernel_onepass(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, softmax_n, causal, block_q, block_k,
    causal_offset=0, clip=None,
):
    """Single K-block variant (t_k fits one block): whole-row softmax_n with no
    online recurrence or scratch round-trips — the fast path at the reference's
    sequence lengths (128/512/197 keys)."""
    s = _scores(
        q_ref, k_ref, bias_ref, pl.program_id(1), 0,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        causal_offset=causal_offset,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    if softmax_n:
        # phantom zero-logit participates in the max-shift: keeps exp(-m)
        # finite on heavily-masked rows (exact — see softmax_variants.softmax_n)
        m = jnp.maximum(m, 0.0)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if softmax_n:
        denom = denom + softmax_n * jnp.exp(-m)
    p = p / denom
    p = _clip_epilogue(p, clip)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = pv.astype(o_ref.dtype)


def _flash_kernel(
    q_ref,      # (1, block_q, D)
    k_ref,      # (1, block_k, D)
    v_ref,      # (1, block_k, D)
    bias_ref,   # (1, 1, block_k) or None
    o_ref,      # (1, block_q, D)
    m_scratch,  # (block_q, 128) f32
    l_scratch,  # (block_q, 128) f32
    acc_scratch,  # (block_q, D) f32
    *,
    scale: float,
    softmax_n: float,
    causal: bool,
    block_q: int,
    block_k: int,
    causal_offset: int = 0,
    l_out_ref=None,  # (1, block_q, 128) f32: L = m + log(denom) for the bwd
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        # softmax_n: the phantom zero-logit is "seen first", so the running
        # max starts at 0 — m never goes below 0 and the final n*exp(-m)
        # cannot overflow on heavily-masked rows (exact: the online rescale
        # exp(m_old - m_new) tracks the phantom term like any other logit)
        m_scratch[:] = jnp.full_like(m_scratch, 0.0 if softmax_n else NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # causal: whole block above the diagonal → skip all work
    run = True
    if causal:
        run = iq * block_q + block_q - 1 + causal_offset >= ik * block_k

    @pl.when(run)
    def _body():
        s = _scores(
            q_ref, k_ref, bias_ref, iq, ik,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            causal_offset=causal_offset,
        )
        m_prev = m_scratch[:, :1]                          # (bq, 1)
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)         # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # (bq, bk) f32
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:] = acc_scratch[:] * alpha + pv

    @pl.when(ik == nk - 1)
    def _finish():
        m_fin = m_scratch[:, :1]
        l_fin = l_scratch[:, :1]
        # softmax_n: the phantom n zero-logits, shifted by the running max
        # (m_fin >= 0 by construction when softmax_n > 0 — see _init)
        if softmax_n:
            denom = l_fin + softmax_n * jnp.exp(-m_fin)
        else:
            denom = l_fin
        o_ref[0] = (acc_scratch[:] / denom).astype(o_ref.dtype)
        if l_out_ref is not None:
            # L = m + log(denom): p_ij = exp(s_ij - L_i) reproduces the
            # NORMALIZED probabilities blockwise in the streaming backward
            # (softmax_n's phantom term lives entirely inside denom)
            lse = m_fin + jnp.log(denom)
            l_out_ref[0] = jnp.broadcast_to(lse, l_out_ref.shape[1:])


def _batched_onepass_kernel(
    q_ref,     # (bb, T_q, D)
    k_ref,     # (bb, T_k, D)
    v_ref,     # (bb, T_k, D)
    bias_ref,  # (bb, 1, T_k) or None
    o_ref,     # (bb, T_q, D)
    *,
    scale,
    softmax_n,
    causal,
    causal_offset,
    t_q,
    t_k,
    clip=None,
):
    """Short-sequence path: the whole (T_q, T_k) score tile fits VMEM, so fuse
    `block_bh` head-slices into ONE program with batched MXU matmuls. At the
    reference's sequence lengths (128/197/512) the per-program work of a
    single (bq, d) tile is too small to amortize grid overhead — batching
    heads is what makes the kernel beat XLA's fused unblocked attention."""
    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (bb, T_q, T_k)
    s = s * scale
    bias = bias_ref[...].astype(jnp.float32) if bias_ref is not None else None
    if _FOLD_BIAS_INTO_MASK:
        add = _bias_causal_fold(s.shape, bias, causal, causal_offset)
        if add is not None:
            s = s + add  # one full-shape add — see _bias_causal_fold
    else:  # pre-round-4 formulation, kept for perf_probe26b's on-chip A/B
        if bias is not None:
            s = s + bias
        if causal:
            s = jnp.where(_causal_keep(s.shape, causal_offset), s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    if softmax_n:
        m = jnp.maximum(m, 0.0)  # see softmax_variants.softmax_n
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if softmax_n:
        denom = denom + softmax_n * jnp.exp(-m)
    p = p / denom
    p = _clip_epilogue(p, clip)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = pv.astype(o_ref.dtype)


def _flash_attention_short(
    qr, kr, vr, bias, b, h, *, scale, softmax_n, causal, causal_offset,
    clip=None, interpret=False,
):
    """(b*h, T, D) short-seq dispatch: grid over head-slices only."""
    bh, t_q, d = qr.shape
    t_k = kr.shape[1]
    # ~4MB f32 score tile per program (swept on v5e at T=128: 4-6MB tiles run
    # ~13% faster than 2MB — fewer programs amortize grid overhead; >6MB
    # exceeds scoped VMEM with the q/k/v/o blocks resident)
    block_bh = max(1, min(bh, (4 * 1024 * 1024) // (4 * t_q * t_k)))
    while bh % block_bh:
        block_bh -= 1
    grid = (bh // block_bh,)
    in_specs = [
        pl.BlockSpec((block_bh, t_q, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((block_bh, t_k, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((block_bh, t_k, d), lambda i: (i, 0, 0)),
    ]
    args = [qr, kr, vr]
    if bias is not None:
        # bias arrives as (b|1, 1, t_k); broadcast across heads so one block
        # spec covers arbitrary block_bh (tiny: b*h*t_k*4 bytes)
        if bias.shape[0] == 1:
            bias = jnp.broadcast_to(bias, (bh, 1, t_k))
        else:
            bias = jnp.broadcast_to(bias[:, None], (bias.shape[0], h, 1, t_k)).reshape(
                bh, 1, t_k
            )
        in_specs.append(pl.BlockSpec((block_bh, 1, t_k), lambda i: (i, 0, 0)))
        args.append(bias)
    validate_block_specs(
        [((block_bh, t_q, d), qr.shape), ((block_bh, t_k, d), kr.shape),
         ((block_bh, t_k, d), vr.shape)]
        + ([((block_bh, 1, t_k), bias.shape)] if bias is not None else []),
        kernel="_flash_attention_short",
    )

    kernel = functools.partial(
        _batched_onepass_kernel if bias is not None else _batched_onepass_kernel_nobias,
        scale=scale,
        softmax_n=softmax_n,
        causal=causal,
        causal_offset=causal_offset,
        t_q=t_q,
        t_k=t_k,
        clip=clip,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_bh, t_q, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_q, d), qr.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_q * t_k * d,
            bytes_accessed=(qr.size + kr.size + vr.size + qr.size) * qr.dtype.itemsize,
            transcendentals=bh * t_q * t_k,
        ),
        interpret=interpret,
    )(*args)


def _batched_onepass_kernel_nobias(q_ref, k_ref, v_ref, o_ref, **kw):
    _batched_onepass_kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)


# --------------------------------------------------------------------------
# Packed-layout kernel: q/k/v in (B, T, H*D) — the layout the QKV projections
# naturally produce. The (B,H,T,D) layout the classic kernel wants forces XLA
# to MATERIALIZE four transposed copies per attention (q,k,v in, o out):
# ~1.2 ms/forward of pure layout traffic at BERT-base B32xS128 (measured on
# v5e; XLA fuses the same transposes into its unfused einsums for free).
# Here heads never leave the lane dimension: each program receives a
# *lane-aligned group* of heads (e.g. two 64-wide heads = 128 lanes, the
# Mosaic minimum — a single 64-lane head block cannot lower) and splits the
# group into per-head slices inside the kernel body, so the model goes
# projection → kernel → output-projection with zero physical transposes.
# --------------------------------------------------------------------------


# Measured crossover on v5e (results/probe12.log, distinct q/k/v + mask,
# in-jit scan timing): XLA's unfused attention stays at the HBM roofline while
# the whole score tensor streams through its fusions — it wins at B32xT128
# (0.54x) and B32xT192 (0.72x) — and falls off a cliff once the f32 score
# tensor is large (B32xT256 1.56x, B64xT200 2.63x, B32xT512 4.10x in the
# Pallas kernel's favor). The boundary tracks total score elements; 16M
# (64 MB f32) separates the measured points cleanly.
PALLAS_MIN_SCORE_ELEMS = 16 * 1024 * 1024

# CAUSAL shapes have a different crossover: XLA's causal attention exploits
# the triangular structure and stays fast where its bidirectional path falls
# off the cliff — round-4 probe19 measured XLA at 89.4 us vs 225.6 us packed
# (0.40x) at the OPT B8xT512 shape (25M score elems, well above the
# bidirectional gate). The one-pass kernels compute the full (T, T) tile and
# cannot skip masked work; only the online-softmax recurrence path skips
# above-diagonal K blocks, and it wins 5.04x at T=4096 (probe11 causal).
PALLAS_MIN_CAUSAL_T = 2048


def pallas_attention_worthwhile(
    b: int, h: int, t_q: int, t_k: int, causal: bool = False
) -> bool:
    """True where the fused Pallas kernels beat XLA's unfused attention —
    the model-level dispatch gate (VERDICT round-2 #2: if XLA genuinely wins
    a shape, auto-dispatch to it; "fused but slower" fails the bar)."""
    if causal:
        return t_k >= PALLAS_MIN_CAUSAL_T
    return b * h * t_q * t_k >= PALLAS_MIN_SCORE_ELEMS


def packed_head_group(heads: int, d: int) -> int:
    """Heads per program for the packed kernel.

    The block's minor (lane) dim must be a multiple of 128 or the full H*D
    (Mosaic's lowering rule — see ops/pallas_checks.py). Returns the smallest
    head-group size g with (g*d) % 128 == 0 and heads % g == 0; if no such g
    exists, returns `heads` (a block covering the full minor dim is always
    legal)."""
    base = 128 // math.gcd(d, 128)
    g = base
    while g < heads:
        if heads % g == 0:
            return g
        g += base
    return heads


def _packed_onepass_kernel(
    q_ref,     # (bb, T_q, G*D)
    k_ref,     # (bb, T_k, G*D)
    v_ref,     # (bb, T_k, G*D)
    bias_ref,  # (bb, 1, T_k) or None
    o_ref,     # (bb, T_q, G*D)
    *,
    scale,
    softmax_n,
    causal,
    causal_offset,
    t_q,
    t_k,
    d,
    group,
    clip=None,
):
    """One-pass softmax_n attention over a lane-aligned group of heads.

    Each head is a static d-wide lane slice of the block; the per-head loop is
    unrolled at trace time (group is 2 for the BERT/OPT/ViT d=64 families).
    Static lane slices at d-multiples lower to in-register relayouts — no HBM
    traffic, unlike the XLA-materialized (B,H,T,D) transposes this replaces."""
    bias = bias_ref[...].astype(jnp.float32) if bias_ref is not None else None
    tile = (q_ref.shape[0], t_q, t_k)
    add = _bias_causal_fold(tile, bias, causal, causal_offset) if _FOLD_BIAS_INTO_MASK else None
    causal_keep = None
    for hh in range(group):
        sl = slice(hh * d, (hh + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (bb, T_q, T_k)
        s = s * scale
        if _FOLD_BIAS_INTO_MASK:
            if add is not None:
                s = s + add  # one full-shape add — see _bias_causal_fold
        else:  # pre-round-4 formulation, kept for perf_probe26b's on-chip A/B
            if bias is not None:
                s = s + bias
            if causal:
                if causal_keep is None:
                    causal_keep = _causal_keep(s.shape, causal_offset)
                s = jnp.where(causal_keep, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        if softmax_n:
            m = jnp.maximum(m, 0.0)  # see softmax_variants.softmax_n
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if softmax_n:
            denom = denom + softmax_n * jnp.exp(-m)
        p = p / denom
        p = _clip_epilogue(p, clip)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = pv.astype(o_ref.dtype)


def _packed_onepass_kernel_nobias(q_ref, k_ref, v_ref, o_ref, **kw):
    _packed_onepass_kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)


def packed_supported(
    b: int, t_q: int, t_k: int, heads: int, d: int, itemsize: int = 2
) -> bool:
    """True iff `flash_attention_packed` can lower AND fit VMEM for these
    shapes — the dispatch gate (`attention.py`) and the wrapper share this
    single predicate so guard and kernel cannot drift (round-2 VERDICT #7)."""
    group = packed_head_group(heads, d)
    t_q_pad, t_k_pad = _ceil_to(t_q, 8), _ceil_to(t_k, 8)
    # per-batch-element VMEM at block_b=1: q/o (t_q) + k/v (t_k) group slices,
    # two live f32 score tiles (current + next head, double-buffer headroom),
    # plus the bias row
    per_b = (
        2 * (t_q_pad + t_k_pad) * group * d * itemsize
        + 2 * t_q_pad * t_k_pad * 4
        + t_k_pad * 4
    )
    return per_b <= 10 * 1024 * 1024


def flash_attention_packed(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    *,
    heads: int,
    softmax_n: float = 0.0,
    scale: Optional[float] = None,
    causal: bool = False,
    clip: Optional[Tuple[float, float]] = None,
    interpret: bool = False,
) -> Array:
    """Fused softmax_n attention over (B, T, H*D)-packed q/k/v.

    Same numerics as :func:`flash_attention`, but operands stay in the layout
    the QKV projections produce and the context returns in the layout the
    output projection consumes — no (B,H,T,D) transposes anywhere. The grid
    runs over (batch-block, head-group); each program gets a lane-aligned
    group of `packed_head_group(heads, d)` heads (128-lane multiple — a bare
    64-lane head slice violates Mosaic's tiling rule and cannot lower) and
    splits heads inside the kernel as static lane slices. Requires the whole
    (T_q, T_k) score tile to fit VMEM (true at all the reference's sequence
    lengths); longer sequences should go through :func:`flash_attention`.

    Differentiable: a custom_vjp recomputes attention via the jnp reference
    on the backward pass (exact gradients for softmax_n/clip/causal/bias).

    Args:
      q: (B, T_q, H*D); k, v: (B, T_k, H*D); bias: (B or 1, 1, 1, T_k).
      clip: optional (gamma, eta) — fused clipped-softmax(_n) epilogue
        (`softmax.py:10-19`: clip(p*(eta-gamma)+gamma, 0, 1)).
    """
    d = q.shape[-1] // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    opts = _FlashOpts(
        softmax_n=softmax_n, scale=scale, causal=causal, clip=clip,
        heads=heads, interpret=interpret,
    )
    return _packed_diff(q, k, v, bias, opts)


def _packed_prep(q, k, v, bias, heads):
    """Shared fwd/bwd prep: sublane-pad T, fold padding into the bias rows,
    pick the lane-aligned head group. Returns the padded operands plus the
    static geometry tuple."""
    b, t_q, hd = q.shape
    t_k = k.shape[1]
    d = hd // heads
    assert heads * d == hd
    if not packed_supported(b, t_q, t_k, heads, d, q.dtype.itemsize):
        raise ValueError(
            f"flash_attention_packed is the short-sequence path; "
            f"(T_q={t_q}, T_k={t_k}, heads={heads}, d={d}) exceeds the VMEM "
            "budget — use flash_attention instead"
        )
    group = packed_head_group(heads, d)

    # pad T to sublane multiples; padded K rows are masked via the bias
    t_q_pad = _ceil_to(t_q, 8)
    t_k_pad = _ceil_to(t_k, 8)
    if t_q_pad != t_q:
        q = jnp.pad(q, ((0, 0), (0, t_q_pad - t_q), (0, 0)))
    if t_k_pad != t_k:
        k = jnp.pad(k, ((0, 0), (0, t_k_pad - t_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, t_k_pad - t_k), (0, 0)))
        pad = jnp.full((1, 1, t_k_pad - t_k), NEG_INF, jnp.float32)
        if bias is None:
            bias = jnp.concatenate(
                [jnp.zeros((1, 1, t_k), jnp.float32), pad], axis=-1
            )
        else:
            bias = jnp.concatenate(
                [
                    jnp.maximum(bias.reshape(-1, 1, t_k).astype(jnp.float32), NEG_INF),
                    jnp.broadcast_to(pad, (bias.shape[0], 1, t_k_pad - t_k)),
                ],
                axis=-1,
            )
    elif bias is not None:
        bias = jnp.maximum(bias.reshape(-1, 1, t_k).astype(jnp.float32), NEG_INF)
    if bias is not None and bias.shape[0] == 1:
        bias = jnp.broadcast_to(bias, (b, 1, t_k_pad))
    return q, k, v, bias, (b, t_q, t_k, t_q_pad, t_k_pad, d, group)


def _packed_impl(q, k, v, bias, opts: "_FlashOpts") -> Array:
    heads = opts.heads
    softmax_n, scale = opts.softmax_n, opts.scale
    causal, clip, interpret = opts.causal, opts.clip, opts.interpret
    q, k, v, bias, geom = _packed_prep(q, k, v, bias, heads)
    b, t_q, t_k, t_q_pad, t_k_pad, d, group = geom
    hd = heads * d

    # batch-block size: one head-group slice of q/k/v/o per program plus the
    # per-head f32 score tiles (×2: live + pipeline headroom), inside the
    # 4-6MB VMEM sweet spot (see _flash_attention_short)
    gd = group * d
    per_b = 2 * (t_q_pad + t_k_pad) * gd * q.dtype.itemsize + 2 * t_q_pad * t_k_pad * 4
    block_b = max(1, min(b, (5 * 1024 * 1024) // per_b))
    while b % block_b:
        block_b -= 1
    grid = (b // block_b, heads // group)

    in_specs = [
        pl.BlockSpec((block_b, t_q_pad, gd), lambda i, h: (i, 0, h)),
        pl.BlockSpec((block_b, t_k_pad, gd), lambda i, h: (i, 0, h)),
        pl.BlockSpec((block_b, t_k_pad, gd), lambda i, h: (i, 0, h)),
    ]
    shapes = [
        ((block_b, t_q_pad, gd), q.shape),
        ((block_b, t_k_pad, gd), k.shape),
        ((block_b, t_k_pad, gd), v.shape),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((block_b, 1, t_k_pad), lambda i, h: (i, 0, 0)))
        shapes.append(((block_b, 1, t_k_pad), bias.shape))
        args.append(bias)
    validate_block_specs(shapes, kernel="flash_attention_packed")

    kernel = functools.partial(
        _packed_onepass_kernel if bias is not None else _packed_onepass_kernel_nobias,
        scale=scale,
        softmax_n=softmax_n,
        causal=causal,
        causal_offset=t_k - t_q,
        t_q=t_q_pad,
        t_k=t_k_pad,
        d=d,
        group=group,
        clip=clip,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, t_q_pad, gd), lambda i, h: (i, 0, h)),
        out_shape=jax.ShapeDtypeStruct((b, t_q_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * t_q_pad * t_k_pad * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * heads * t_q_pad * t_k_pad,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :t_q]


def _packed_bwd_kernel(
    q_ref,      # (bb, T_q, G*D)
    k_ref,      # (bb, T_k, G*D)
    v_ref,      # (bb, T_k, G*D)
    bias_ref,   # (bb, 1, T_k) or None
    do_ref,     # (bb, T_q, G*D)
    dq_ref,     # (bb, T_q, G*D)
    dk_ref,     # (bb, T_k, G*D)
    dv_ref,     # (bb, T_k, G*D)
    dbias_ref,  # (bb, 1, T_k) f32 or None
    *,
    scale,
    softmax_n,
    causal,
    causal_offset,
    t_q,
    t_k,
    d,
    group,
    clip,
):
    """One-pass recompute backward for the packed kernel.

    The whole (T_q, T_k) row lives in VMEM, so no dq-accumulation races and no
    per-block delta pass (the standard flash-bwd machinery) are needed:
    recompute p exactly as the forward did, then

        dv = p_clippedᵀ · do
        dp = (do · vᵀ) → through the clip mask → softmax_n Jacobian:
        ds = p ⊙ (dp − Σ_k p·dp)        (phantom column is constant → same
                                          form as softmax, rows just sum < 1)
        dq = ds·k·scale,  dk = dsᵀ·q·scale,  dbias = Σ_{h,q} ds

    vs. the XLA-recompute VJP this avoids materializing the (B,H,T,T) score/
    prob tensors (and their cotangents) in HBM — the train-step analogue of
    the forward kernel's win.
    """
    bias = bias_ref[...].astype(jnp.float32) if bias_ref is not None else None
    add = (
        _bias_causal_fold((q_ref.shape[0], t_q, t_k), bias, causal, causal_offset)
        if _FOLD_BIAS_INTO_MASK else None
    )
    causal_keep = None
    db_acc = None
    for hh in range(group):
        sl = slice(hh * d, (hh + 1) * d)
        qh = q_ref[:, :, sl]
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        doh = do_ref[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        if _FOLD_BIAS_INTO_MASK:
            if add is not None:
                s = s + add
        else:
            if bias is not None:
                s = s + bias
            if causal:
                if causal_keep is None:
                    causal_keep = _causal_keep(s.shape, causal_offset)
                s = jnp.where(causal_keep, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        if softmax_n:
            m = jnp.maximum(m, 0.0)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        if softmax_n:
            denom = denom + softmax_n * jnp.exp(-m)
        p = e / denom  # (bb, T_q, T_k) f32, pre-clip

        dpc = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (bb, T_q, T_k)
        if clip is not None:
            gamma, eta = clip
            stretched = p * (eta - gamma) + gamma
            pc = jnp.clip(stretched, 0.0, 1.0)
            dp = dpc * (eta - gamma) * (
                (stretched > 0.0) & (stretched < 1.0)
            ).astype(jnp.float32)
        else:
            pc = p
            dp = dpc
        dv_h = jax.lax.dot_general(
            pc.astype(vh.dtype), doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, T_k, D)
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))  # f32
        ds_c = ds.astype(qh.dtype)
        dq_h = jax.lax.dot_general(
            ds_c, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (bb, T_q, D)
        dk_h = jax.lax.dot_general(
            ds_c, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (bb, T_k, D)
        dq_ref[:, :, sl] = dq_h.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk_h.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv_h.astype(dv_ref.dtype)
        if dbias_ref is not None:
            db_h = jnp.sum(ds, axis=1, keepdims=True)  # (bb, 1, T_k)
            db_acc = db_h if db_acc is None else db_acc + db_h
    if dbias_ref is not None:
        # (bb, 8, T_k) slab: partial in row 0, zeros elsewhere (see the
        # sublane-padded dbias layout in _packed_bwd_impl)
        dbias_ref[...] = jnp.pad(db_acc, ((0, 0), (0, 7), (0, 0)))


def _packed_bwd_kernel_nobias(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                              dv_ref, **kw):
    _packed_bwd_kernel(q_ref, k_ref, v_ref, None, do_ref, dq_ref, dk_ref,
                       dv_ref, None, **kw)


def _packed_bwd_kernel_bias_nodbias(q_ref, k_ref, v_ref, bias_ref, do_ref,
                                    dq_ref, dk_ref, dv_ref, **kw):
    # bias present only as the T-padding mask (no primal bias → no dbias out)
    _packed_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref,
                       dv_ref, None, **kw)


def _packed_bwd_impl(q, k, v, bias, g, opts: "_FlashOpts"):
    """Pallas backward for the packed layout. Raises ValueError when the
    per-program VMEM footprint exceeds budget (caller falls back to the
    XLA-recompute VJP)."""
    heads = opts.heads
    had_bias = bias is not None
    bias_shape, bias_dtype = (bias.shape, bias.dtype) if had_bias else (None, None)
    q, k, v, bias, geom = _packed_prep(q, k, v, bias, heads)
    b, t_q, t_k, t_q_pad, t_k_pad, d, group = geom
    hd = heads * d
    gd = group * d
    if t_q_pad != t_q:
        g = jnp.pad(g, ((0, 0), (0, t_q_pad - t_q), (0, 0)))

    # 7 (q,k,v,do,dq,dk,dv) head-group slices + 3 live f32 score tiles
    per_b = (
        7 * max(t_q_pad, t_k_pad) * gd * q.dtype.itemsize
        + 3 * t_q_pad * t_k_pad * 4
    )
    if per_b > 11 * 1024 * 1024:
        raise ValueError("packed backward exceeds the VMEM budget")
    block_b = max(1, min(b, (6 * 1024 * 1024) // per_b))
    while b % block_b:
        block_b -= 1
    n_groups = heads // group
    grid = (b // block_b, n_groups)

    qspec = pl.BlockSpec((block_b, t_q_pad, gd), lambda i, h: (i, 0, h))
    kspec = pl.BlockSpec((block_b, t_k_pad, gd), lambda i, h: (i, 0, h))
    in_specs = [qspec, kspec, kspec]
    args = [q, k, v]
    shapes = [
        ((block_b, t_q_pad, gd), q.shape),
        ((block_b, t_k_pad, gd), k.shape),
        ((block_b, t_k_pad, gd), v.shape),
    ]
    if bias is not None:
        in_specs.append(pl.BlockSpec((block_b, 1, t_k_pad), lambda i, h: (i, 0, 0)))
        shapes.append(((block_b, 1, t_k_pad), bias.shape))
        args.append(bias)
    in_specs.append(qspec)
    shapes.append(((block_b, t_q_pad, gd), g.shape))
    args.append(g)

    out_shapes = [
        jax.ShapeDtypeStruct((b, t_q_pad, hd), q.dtype),
        jax.ShapeDtypeStruct((b, t_k_pad, hd), k.dtype),
        jax.ShapeDtypeStruct((b, t_k_pad, hd), v.dtype),
    ]
    out_specs = [qspec, kspec, kspec]
    if had_bias:
        # per-head-group partial dbias rows, sublane-padded to 8: a
        # (block_b, 1, t_k) block over a (b, n_groups, t_k) array is
        # REJECTED by Mosaic's divisible-by-8-or-equal rule whenever
        # n_groups > 1 (probe26b new_scale1_grad: OPT h=12 d=64 → group 2,
        # n_groups 6). Each program owns an 8-row slab, writes its partial
        # into row 0 and zeros elsewhere; the group sum below is unchanged.
        out_shapes.append(
            jax.ShapeDtypeStruct((b, n_groups * 8, t_k_pad), jnp.float32)
        )
        out_specs.append(pl.BlockSpec((block_b, 8, t_k_pad), lambda i, h: (i, h, 0)))
    # validate OUTPUT blocks too — the dbias bug above shipped because only
    # inputs were checked
    out_check = [
        ((block_b, t_q_pad, gd), (b, t_q_pad, hd)),
        ((block_b, t_k_pad, gd), (b, t_k_pad, hd)),
        ((block_b, t_k_pad, gd), (b, t_k_pad, hd)),
    ]
    if had_bias:
        out_check.append(((block_b, 8, t_k_pad), (b, n_groups * 8, t_k_pad)))
    validate_block_specs(shapes + out_check, kernel="flash_attention_packed_bwd")

    if bias is None:
        base_kernel = _packed_bwd_kernel_nobias
    elif had_bias:
        base_kernel = _packed_bwd_kernel
    else:  # synthetic padding bias only — no dbias output
        base_kernel = _packed_bwd_kernel_bias_nodbias
    kernel = functools.partial(
        base_kernel,
        scale=opts.scale,
        softmax_n=opts.softmax_n,
        causal=opts.causal,
        causal_offset=t_k - t_q,
        t_q=t_q_pad,
        t_k=t_k_pad,
        d=d,
        group=group,
        clip=opts.clip,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * heads * t_q_pad * t_k_pad * d,
            bytes_accessed=(q.size + k.size + v.size) * 2 * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * heads * t_q_pad * t_k_pad,
        ),
        interpret=opts.interpret,
    )(*args)
    dq = outs[0][:, :t_q]
    dk = outs[1][:, :t_k]
    dv = outs[2][:, :t_k]
    if not had_bias:
        return dq, dk, dv, None
    db = jnp.sum(outs[3], axis=1)[:, :t_k]  # (b, t_k)
    db = db.reshape(b, 1, 1, t_k)
    if bias_shape[0] == 1:
        db = jnp.sum(db, axis=0, keepdims=True)
    return dq, dk, dv, db.reshape(bias_shape).astype(bias_dtype)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


class _FlashOpts(NamedTuple):
    """Static (hashable) kernel options — the nondiff arg of the custom_vjps."""

    softmax_n: float
    scale: float
    causal: bool
    clip: Optional[Tuple[float, float]] = None
    heads: Optional[int] = None  # packed layout only
    block_q: int = 512
    block_k: int = 2048
    interpret: bool = False


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    *,
    softmax_n: float = 0.0,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 2048,
    clip: Optional[Tuple[float, float]] = None,
    interpret: bool = False,
) -> Array:
    """Fused softmax_n attention.

    Differentiable: a custom_vjp recomputes attention via the jnp reference
    on the backward pass (exact gradients for softmax_n/clip/causal/bias).

    Args:
      q, k, v: (B, H, T, D) (T_q may differ from T_k).
      bias: optional additive mask, shape (B, 1, 1, T_k) — the HF extended
        attention mask layout. Large-negative = masked.
      softmax_n: the n in softmax_n (0 → vanilla softmax, 1 → softmax_1).
      scale: score scale; default 1/sqrt(D) (applied BEFORE the bias, matching
        bert_attention.py:265-276 order: scores/sqrt(d) + mask → softmax).
      causal: lower-triangular masking (OPT decoder).
      clip: optional (gamma, eta) fused clipped-softmax(_n) epilogue — one-pass
        paths only (the long-seq recurrence cannot clip normalized probs).

    Returns (B, H, T_q, D) in q's dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    opts = _FlashOpts(
        softmax_n=softmax_n, scale=scale, causal=causal, clip=clip,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return _flash_diff(q, k, v, bias, opts)


def _flash_geometry(t_q: int, t_k: int, opts: _FlashOpts):
    """The (block_q, block_k, t_q_pad, t_k_pad, path) decision — shared by the
    forward, the custom_vjp residual selection, and the streaming backward so
    all three always agree on which kernel family a shape dispatches to."""
    block_q = min(opts.block_q, _ceil_to(t_q, 8))
    block_k = min(opts.block_k, _ceil_to(t_k, 8))
    t_q_pad = _ceil_to(t_q, block_q)
    t_k_pad = _ceil_to(t_k, block_k)
    if t_q_pad * t_k_pad * 4 <= 2 * 1024 * 1024:
        path = "short"
    elif t_k_pad == block_k:
        path = "onepass"
    else:
        path = "recurrence"
    return block_q, block_k, t_q_pad, t_k_pad, path


def _flash_impl(q, k, v, bias, opts: _FlashOpts, return_stats: bool = False):
    softmax_n, scale, causal = opts.softmax_n, opts.scale, opts.causal
    clip, interpret = opts.clip, opts.interpret
    b, h, t_q, d = q.shape
    t_k = k.shape[2]

    block_q, block_k, t_q_pad, t_k_pad, path = _flash_geometry(t_q, t_k, opts)

    qr = q.reshape(b * h, t_q, d)
    kr = k.reshape(b * h, t_k, d)
    vr = v.reshape(b * h, t_k, d)
    if t_q_pad != t_q:
        qr = jnp.pad(qr, ((0, 0), (0, t_q_pad - t_q), (0, 0)))
    if t_k_pad != t_k:
        kr = jnp.pad(kr, ((0, 0), (0, t_k_pad - t_k), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, t_k_pad - t_k), (0, 0)))
        pad_bias = jnp.full((1, 1, t_k_pad - t_k), NEG_INF, jnp.float32)
        if bias is None:
            bias = jnp.concatenate(
                [jnp.zeros((1, 1, t_k), jnp.float32), pad_bias], axis=-1
            )
        else:
            bias = jnp.concatenate(
                [
                    jnp.maximum(bias.reshape(b, 1, t_k).astype(jnp.float32), NEG_INF),
                    jnp.broadcast_to(pad_bias, (b, 1, t_k_pad - t_k)),
                ],
                axis=-1,
            )
    elif bias is not None:
        bias = jnp.maximum(bias.reshape(b, 1, t_k).astype(jnp.float32), NEG_INF)

    # short-sequence path: whole (T_q, T_k) score tile fits VMEM → fuse heads
    if path == "short":
        out = _flash_attention_short(
            qr, kr, vr, bias, b, h,
            scale=scale, softmax_n=softmax_n, causal=causal,
            causal_offset=t_k - t_q, clip=clip, interpret=interpret,
        )
        return out[:, :t_q].reshape(b, h, t_q, d)

    onepass = path == "onepass"  # whole K in one block: no online recurrence
    if clip is not None and not onepass:
        raise ValueError(
            "clipped-softmax fusion requires a one-pass path (whole K row "
            f"normalized in VMEM); T_k={t_k} exceeds block_k={block_k} — "
            "raise block_k or use the XLA path for clipped long sequences"
        )
    grid = (b * h, t_q_pad // block_q, t_k_pad // block_k)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    args = [qr, kr, vr]
    if bias is not None:
        nbias = bias.shape[0]
        if nbias == 1:
            in_specs.append(pl.BlockSpec((1, 1, block_k), lambda bh, iq, ik: (0, 0, ik)))
        else:
            in_specs.append(
                pl.BlockSpec((1, 1, block_k), lambda bh, iq, ik: (bh // h, 0, ik))
            )
        args.append(bias)
    validate_block_specs(
        [((1, block_q, d), qr.shape), ((1, block_k, d), kr.shape),
         ((1, block_k, d), vr.shape)]
        + ([((1, 1, block_k), bias.shape)] if bias is not None else []),
        kernel="flash_attention",
    )

    if onepass:
        base = _flash_kernel_onepass if bias is not None else _flash_kernel_onepass_nobias
        scratch = []
    else:
        if return_stats:
            base = _flash_kernel_stats if bias is not None else _flash_kernel_stats_nobias
        else:
            base = _flash_kernel if bias is not None else _flash_kernel_nobias
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    kernel = functools.partial(
        base,
        scale=scale,
        softmax_n=softmax_n,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        causal_offset=t_k - t_q,
        **({"clip": clip} if onepass else {}),
    )

    out_specs = pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, t_q_pad, d), q.dtype)
    if return_stats and not onepass:
        # per-row log-denominator L = m + log(denom) for the streaming
        # backward; lane-broadcast to a full native (block_q, 128) f32 tile
        # (a singleton/sub-128 lane layout is exactly the Mosaic fragility
        # class of the round-3/4 SIGABRTs — see _causal_keep)
        out_specs = [
            out_specs,
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik: (bh, iq, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((b * h, t_q_pad, 128), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_q_pad * t_k_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * qr.dtype.itemsize
            + b * h * t_q_pad * d * q.dtype.itemsize,
            transcendentals=b * h * t_q_pad * t_k_pad,
        ),
        interpret=interpret,
    )(*args)
    if return_stats and not onepass:
        out, lse = out
        return out[:, :t_q].reshape(b, h, t_q, d), lse
    if return_stats:  # onepass path selected by a caller probing stats
        raise AssertionError("return_stats is only valid on the recurrence path")
    return out[:, :t_q].reshape(b, h, t_q, d)


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_s, l_s, acc_s, **kw)


def _flash_kernel_stats(q_ref, k_ref, v_ref, bias_ref, o_ref, l_out_ref,
                        m_s, l_s, acc_s, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_s, l_s, acc_s,
                  l_out_ref=l_out_ref, **kw)


def _flash_kernel_stats_nobias(q_ref, k_ref, v_ref, o_ref, l_out_ref,
                               m_s, l_s, acc_s, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, m_s, l_s, acc_s,
                  l_out_ref=l_out_ref, **kw)


def _flash_kernel_onepass_nobias(q_ref, k_ref, v_ref, o_ref, **kw):
    _flash_kernel_onepass(q_ref, k_ref, v_ref, None, o_ref, **kw)


# --------------------------------------------------------------------------
# Streaming (recurrence-path) Pallas backward.
#
# The one-pass/packed paths recompute the whole score row in VMEM
# (_packed_bwd_kernel); the recurrence regime (T_k > block_k — the ONLY
# regime where causal dispatch selects Pallas, T >= 2048) cannot, and its
# old backward was an XLA recompute that materialized the full (B,H,T,T)
# score tensor in HBM (~3 GB f32 at OPT T8192 per microbatch) — paying back
# the forward kernel's memory win exactly where it matters. This is the
# standard flash backward instead: the forward saves the per-row
# log-denominator L (softmax_n's phantom term included), and two streaming
# kernels recompute p = exp(s − L) blockwise:
#
#   dq kernel, grid (BH, n_q, n_k):  per q-block, stream k-blocks
#       D  = rowsum(dO ⊙ O)                    (= Σ_j p_j dp_j, phantom-exact:
#                                               the phantom column carries no V)
#       dp = dO·Vᵀ ;  ds = p ⊙ (dp − D) · scale ;  dq += ds·K
#   dk/dv kernel, grid (BH, n_k, n_q): per k-block, stream q-blocks
#       dv += pᵀ·dO ;  dk += dsᵀ·Q · scale ;  dbias += Σ_rows p ⊙ (dp − D)
#
# No (T_q, T_k) tensor ever reaches HBM. Causal block-skip mirrors the
# forward (whole-tile-masked programs do nothing). dbias partials are
# written as sublane-padded (1, 8, block_k) slabs per (BH, ik) program and
# reduced in XLA — same layout lesson as _packed_bwd_impl's dbias fix.
# --------------------------------------------------------------------------

# A/B flag for the on-chip probe (results/perf_probe45.py pattern): False
# restores the XLA-recompute VJP on the recurrence path.
_RECURRENCE_PALLAS_BWD = True


def _rec_bwd_dq_kernel(
    q_ref,     # (1, block_q, D)
    k_ref,     # (1, block_k, D)
    v_ref,     # (1, block_k, D)
    bias_ref,  # (1, 1, block_k) or None
    do_ref,    # (1, block_q, D)
    o_ref,     # (1, block_q, D)
    lse_ref,   # (1, block_q, 128) f32
    dq_ref,    # (1, block_q, D)
    dq_acc,    # (block_q, D) f32 scratch
    *,
    scale,
    causal,
    block_q,
    block_k,
    causal_offset,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = iq * block_q + block_q - 1 + causal_offset >= ik * block_k

    @pl.when(run)
    def _body():
        s = _scores(
            q_ref, k_ref, bias_ref, iq, ik,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            causal_offset=causal_offset,
        )
        lse = lse_ref[0][:, :1]                      # (bq, 1)
        p = jnp.exp(s - lse)                         # (bq, bk) normalized
        do = do_ref[0].astype(jnp.float32)
        o = o_ref[0].astype(jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (bq, 1)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (bq, bk)
        ds = (p * (dp - delta) * scale).astype(k_ref.dtype)
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds, k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _rec_bwd_dq_kernel_nobias(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                              dq_ref, dq_acc, **kw):
    _rec_bwd_dq_kernel(q_ref, k_ref, v_ref, None, do_ref, o_ref, lse_ref,
                       dq_ref, dq_acc, **kw)


def _rec_bwd_dkv_kernel(
    q_ref,      # (1, block_q, D)
    k_ref,      # (1, block_k, D)
    v_ref,      # (1, block_k, D)
    bias_ref,   # (1, 1, block_k) or None
    do_ref,     # (1, block_q, D)
    o_ref,      # (1, block_q, D)
    lse_ref,    # (1, block_q, 128) f32
    dk_ref,     # (1, block_k, D)
    dv_ref,     # (1, block_k, D)
    dbias_ref,  # (1, 8, block_k) f32 slab or None
    dk_acc,     # (block_k, D) f32 scratch
    dv_acc,     # (block_k, D) f32 scratch
    db_acc,     # (8, block_k) f32 scratch or None
    *,
    scale,
    causal,
    block_q,
    block_k,
    causal_offset,
):
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        if db_acc is not None:
            db_acc[:] = jnp.zeros_like(db_acc)

    run = True
    if causal:
        run = iq * block_q + block_q - 1 + causal_offset >= ik * block_k

    @pl.when(run)
    def _body():
        s = _scores(
            q_ref, k_ref, bias_ref, iq, ik,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            causal_offset=causal_offset,
        )
        lse = lse_ref[0][:, :1]
        p = jnp.exp(s - lse)                         # (bq, bk)
        do = do_ref[0].astype(jnp.float32)
        o = o_ref[0].astype(jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (bk, D)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)                        # (bq, bk), unscaled
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            (ds * scale).astype(q_ref.dtype), q_ref[0],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (bk, D)
        if db_acc is not None:
            db_row = jnp.sum(ds, axis=0, keepdims=True)      # (1, bk)
            db_acc[:] = db_acc[:] + jnp.pad(db_row, ((0, 7), (0, 0)))

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)
        if dbias_ref is not None:
            dbias_ref[0] = db_acc[:]


def _rec_bwd_dkv_kernel_nobias(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                               dk_ref, dv_ref, dk_acc, dv_acc, **kw):
    _rec_bwd_dkv_kernel(q_ref, k_ref, v_ref, None, do_ref, o_ref, lse_ref,
                        dk_ref, dv_ref, None, dk_acc, dv_acc, None, **kw)


def _rec_bwd_dkv_kernel_bias_nodbias(q_ref, k_ref, v_ref, bias_ref, do_ref,
                                     o_ref, lse_ref, dk_ref, dv_ref,
                                     dk_acc, dv_acc, **kw):
    # bias present only as the T-padding mask (no primal bias → no dbias out)
    _rec_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref, lse_ref,
                        dk_ref, dv_ref, None, dk_acc, dv_acc, None, **kw)


def _recurrence_bwd_impl(q, k, v, bias, out, lse, g, opts: _FlashOpts):
    """Streaming Pallas backward for the recurrence path. q/k/v/out/g are the
    original (B, H, T, D) arrays; lse is the (B·H, T_q_pad, 128) f32 stats
    array the forward emitted. Returns (dq, dk, dv, dbias|None)."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    had_bias = bias is not None
    bias_shape, bias_dtype = (bias.shape, bias.dtype) if had_bias else (None, None)
    block_q, block_k, t_q_pad, t_k_pad, path = _flash_geometry(t_q, t_k, opts)
    assert path == "recurrence", path

    qr = q.reshape(b * h, t_q, d)
    kr = k.reshape(b * h, t_k, d)
    vr = v.reshape(b * h, t_k, d)
    do = g.reshape(b * h, t_q, d)
    o = out.reshape(b * h, t_q, d)
    if t_q_pad != t_q:
        qr = jnp.pad(qr, ((0, 0), (0, t_q_pad - t_q), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, t_q_pad - t_q), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, t_q_pad - t_q), (0, 0)))
    if t_k_pad != t_k:
        kr = jnp.pad(kr, ((0, 0), (0, t_k_pad - t_k), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, t_k_pad - t_k), (0, 0)))
        pad_bias = jnp.full((1, 1, t_k_pad - t_k), NEG_INF, jnp.float32)
        if bias is None:
            bias = jnp.concatenate(
                [jnp.zeros((1, 1, t_k), jnp.float32), pad_bias], axis=-1
            )
        else:
            bias = jnp.concatenate(
                [
                    jnp.maximum(bias.reshape(b, 1, t_k).astype(jnp.float32), NEG_INF),
                    jnp.broadcast_to(pad_bias, (b, 1, t_k_pad - t_k)),
                ],
                axis=-1,
            )
    elif bias is not None:
        bias = jnp.maximum(bias.reshape(b, 1, t_k).astype(jnp.float32), NEG_INF)

    n_q = t_q_pad // block_q
    n_k = t_k_pad // block_k
    qspec = pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0))
    kspec_q = pl.BlockSpec((1, block_k, d), lambda bh, iq, ik: (bh, ik, 0))
    lspec_q = pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik: (bh, iq, 0))

    def bias_spec(order):
        # order: index args are (bh, iq, ik) for dq, (bh, ik, iq) for dkv
        nbias = bias.shape[0]
        if order == "q_outer":
            if nbias == 1:
                return pl.BlockSpec((1, 1, block_k), lambda bh, iq, ik: (0, 0, ik))
            return pl.BlockSpec((1, 1, block_k), lambda bh, iq, ik: (bh // h, 0, ik))
        if nbias == 1:
            return pl.BlockSpec((1, 1, block_k), lambda bh, ik, iq: (0, 0, ik))
        return pl.BlockSpec((1, 1, block_k), lambda bh, ik, iq: (bh // h, 0, ik))

    # ---- dq: grid (BH, n_q, n_k), stream k --------------------------------
    in_specs = [qspec, kspec_q, kspec_q]
    args = [qr, kr, vr]
    shapes = [
        ((1, block_q, d), qr.shape),
        ((1, block_k, d), kr.shape),
        ((1, block_k, d), vr.shape),
    ]
    if bias is not None:
        in_specs.append(bias_spec("q_outer"))
        shapes.append(((1, 1, block_k), bias.shape))
        args.append(bias)
    in_specs += [qspec, qspec, lspec_q]
    args += [do, o, lse]
    shapes += [
        ((1, block_q, d), do.shape),
        ((1, block_q, d), o.shape),
        ((1, block_q, 128), lse.shape),
        # output
        ((1, block_q, d), (b * h, t_q_pad, d)),
    ]
    validate_block_specs(shapes, kernel="flash_recurrence_bwd_dq")
    dq_kernel = functools.partial(
        _rec_bwd_dq_kernel if bias is not None else _rec_bwd_dq_kernel_nobias,
        scale=opts.scale, causal=opts.causal,
        block_q=block_q, block_k=block_k, causal_offset=t_k - t_q,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, n_q, n_k),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b * h, t_q_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * t_q_pad * t_k_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size + 2 * do.size)
            * qr.dtype.itemsize,
            transcendentals=b * h * t_q_pad * t_k_pad,
        ),
        interpret=opts.interpret,
    )(*args)

    # ---- dk/dv (+dbias partials): grid (BH, n_k, n_q), stream q -----------
    qspec_kv = pl.BlockSpec((1, block_q, d), lambda bh, ik, iq: (bh, iq, 0))
    kspec_kv = pl.BlockSpec((1, block_k, d), lambda bh, ik, iq: (bh, ik, 0))
    lspec_kv = pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq: (bh, iq, 0))
    in_specs = [qspec_kv, kspec_kv, kspec_kv]
    args = [qr, kr, vr]
    shapes = [
        ((1, block_q, d), qr.shape),
        ((1, block_k, d), kr.shape),
        ((1, block_k, d), vr.shape),
    ]
    if bias is not None:
        in_specs.append(bias_spec("k_outer"))
        shapes.append(((1, 1, block_k), bias.shape))
        args.append(bias)
    in_specs += [qspec_kv, qspec_kv, lspec_kv]
    args += [do, o, lse]
    shapes += [
        ((1, block_q, d), do.shape),
        ((1, block_q, d), o.shape),
        ((1, block_q, 128), lse.shape),
    ]
    out_specs = [kspec_kv, kspec_kv]
    out_shapes = [
        jax.ShapeDtypeStruct((b * h, t_k_pad, d), k.dtype),
        jax.ShapeDtypeStruct((b * h, t_k_pad, d), v.dtype),
    ]
    scratch = [
        pltpu.VMEM((block_k, d), jnp.float32),
        pltpu.VMEM((block_k, d), jnp.float32),
    ]
    shapes += [
        ((1, block_k, d), (b * h, t_k_pad, d)),
        ((1, block_k, d), (b * h, t_k_pad, d)),
    ]
    if bias is None:
        base = _rec_bwd_dkv_kernel_nobias
    elif had_bias:
        base = _rec_bwd_dkv_kernel
        out_specs.append(
            pl.BlockSpec((1, 8, block_k), lambda bh, ik, iq: (bh, 0, ik))
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((b * h, 8, t_k_pad), jnp.float32)
        )
        scratch.append(pltpu.VMEM((8, block_k), jnp.float32))
        shapes.append(((1, 8, block_k), (b * h, 8, t_k_pad)))
    else:  # synthetic padding bias only
        base = _rec_bwd_dkv_kernel_bias_nodbias
    validate_block_specs(shapes, kernel="flash_recurrence_bwd_dkv")
    dkv_kernel = functools.partial(
        base,
        scale=opts.scale, causal=opts.causal,
        block_q=block_q, block_k=block_k, causal_offset=t_k - t_q,
    )
    outs = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, n_k, n_q),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * t_q_pad * t_k_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size + 2 * do.size)
            * qr.dtype.itemsize,
            transcendentals=b * h * t_q_pad * t_k_pad,
        ),
        interpret=opts.interpret,
    )(*args)

    dq = dq[:, :t_q].reshape(b, h, t_q, d)
    dk = outs[0][:, :t_k].reshape(b, h, t_k, d)
    dv = outs[1][:, :t_k].reshape(b, h, t_k, d)
    if not had_bias:
        return dq, dk, dv, None
    db = outs[2][:, 0, :t_k].reshape(b, h, t_k)   # slab row 0 holds the partial
    db = jnp.sum(db, axis=1).reshape(b, 1, 1, t_k)
    if bias_shape[0] == 1:
        db = jnp.sum(db, axis=0, keepdims=True)
    return dq, dk, dv, db.reshape(bias_shape).astype(bias_dtype)


# --------------------------------------------------------------------------
# Backward pass (custom_vjp): forward = Pallas kernel; backward = the
# streaming Pallas kernels above on the recurrence path, and a jnp-reference
# recompute differentiated by XLA elsewhere. Exact for softmax_n / clip /
# causal / bias (the softmax_n Jacobian restricted to the real logits is
# p_i δ_ij − p_i p_j, same form as softmax — the phantom zero-logit is
# constant and contributes a zero column).
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_diff(q, k, v, bias, opts: _FlashOpts):
    return _flash_impl(q, k, v, bias, opts)


def _flash_diff_fwd(q, k, v, bias, opts: _FlashOpts):
    path = _flash_geometry(q.shape[2], k.shape[2], opts)[-1]
    if path == "recurrence" and _RECURRENCE_PALLAS_BWD:
        # save the per-row log-denominator for the streaming Pallas backward
        out, lse = _flash_impl(q, k, v, bias, opts, return_stats=True)
        return out, (q, k, v, bias, out, lse)
    return _flash_impl(q, k, v, bias, opts), (q, k, v, bias, None, None)


def _flash_diff_bwd(opts: _FlashOpts, res, g):
    q, k, v, bias, out, lse = res
    if lse is not None:
        return _recurrence_bwd_impl(q, k, v, bias, out, lse, g, opts)

    def ref(q_, k_, v_, bias_):
        return attention_reference(
            q_, k_, v_, bias_, softmax_n=opts.softmax_n, scale=opts.scale,
            causal=opts.causal, clip=opts.clip,
        )

    _, vjp = jax.vjp(ref, q, k, v, bias)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _packed_diff(q, k, v, bias, opts: _FlashOpts):
    return _packed_impl(q, k, v, bias, opts)


def _packed_diff_fwd(q, k, v, bias, opts: _FlashOpts):
    return _packed_impl(q, k, v, bias, opts), (q, k, v, bias)


def _packed_diff_bwd(opts: _FlashOpts, res, g):
    q, k, v, bias = res
    try:
        return _packed_bwd_impl(q, k, v, bias, g, opts)
    except ValueError:
        pass  # VMEM budget exceeded → XLA-recompute fallback below
    heads = opts.heads
    b, t_q, hd = q.shape
    d = hd // heads

    def ref(q_, k_, v_, bias_):
        def sh(x):
            bb, tt, _ = x.shape
            return x.reshape(bb, tt, heads, d).transpose(0, 2, 1, 3)

        out = attention_reference(
            sh(q_), sh(k_), sh(v_), bias_, softmax_n=opts.softmax_n,
            scale=opts.scale, causal=opts.causal, clip=opts.clip,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, t_q, hd)

    _, vjp = jax.vjp(ref, q, k, v, bias)
    return vjp(g)


_packed_diff.defvjp(_packed_diff_fwd, _packed_diff_bwd)


# --------------------------------------------------------------------------
# jnp reference implementation (for kernel tests, the custom_vjp backward,
# and non-TPU fallback)
# --------------------------------------------------------------------------


def attention_reference(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    *,
    softmax_n: float = 0.0,
    scale: Optional[float] = None,
    causal: bool = False,
    clip: Optional[Tuple[float, float]] = None,
) -> Array:
    from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        t_q, t_k = s.shape[-2:]
        mask = jnp.tril(jnp.ones((t_q, t_k), bool), k=t_k - t_q)
        s = jnp.where(mask, s, NEG_INF)
    p = softmax_n_fn(s, softmax_n, axis=-1)
    if clip is not None:
        gamma, eta = clip
        p = jnp.clip(p * (eta - gamma) + gamma, 0.0, 1.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(q.dtype)
