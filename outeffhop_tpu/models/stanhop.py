"""STanHopNet — hierarchical Hopfield time-series forecaster.

Functional re-design of `STanHop_time_seeries/cross_models/` (stanhop.py:16-68,
hopfield.py, encoder.py, decoder.py, embed.py). Capability-parity notes:

  * `Association`: einsum(blhe,bshe→bhls) → mode softmax → einsum(bhls,bshd→blhd)
    (`hopfield.py:42-51`); modes: entmax (learnable-α entmax-bisect, the
    default), softmax1, softmax, sparsemax, clip, clip_softmax1. The
    reference's `ClipSoftmax_1.__init__` super() bug (`clip_softmax.py:46`,
    TypeError when mode=clip_softmax1) is NOT replicated — that mode works.
  * `Hopfield`: **value = value_proj(key_proj(keys))** — the Hopfield
    association form, not standard V (`hopfield.py:78`).
  * `HopfieldPooling`: a learnable (1, num_pattern, d_model) prototype bank as
    keys (`hopfield.py:111-131`).
  * the `mix=True` head-mixing reshape (`hopfield.py:85-87`): transpose heads
    against sequence THEN flatten — a deliberate memory reinterpretation
    inherited from Informer; replicated bit-exactly.
  * `STHMLayer` (`hopfield.py:143-186`): cross-time Hopfield over segments per
    series, MLP1; cross-series HopfieldPooling + Hopfield readout with
    pooled output as VALUES, norm3 + MLP2. The commented-out norms 1/2/4 of
    the reference are likewise absent.
  * Encoder (`encoder.py:78-100`): scale_block list, first block win=1 (no
    merge), later blocks SegMerging (win_size segments concat → LN →
    Linear(win·d → d)) with tail-repeat padding; returns ALL scales incl. the
    embedding itself.
  * Decoder (`decoder.py`): e_layers+1 DecoderLayers; each applies STHM to the
    decoder state, cross-attends (Hopfield) to its encoder scale, FFN with two
    norms, and emits a per-scale linear_pred(d_model → seg_len); predictions
    are SUMMED across scales then unfolded to (B, out_len, D).
  * padding: in_len padded up to a seg multiple by repeating the FIRST
    timestep (`stanhop.py:56-57`); `baseline` adds the per-series input mean.

Quantized STanHop: the reference advertises it (`README.md:167-188`) but
`OutEffHop/STanHop_outlier/` is empty — here every dense projection and the
attention score/prob/context sites thread the same ScopedQuantCtx as
BERT/OPT/ViT, so the full W8A8 PTQ pipeline applies unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.ops.entmax import entmax_bisect, sparsemax
from outeffhop_tpu.ops.softmax_variants import (
    clipped_softmax,
    clipped_softmax1,
    softmax_n,
)
from outeffhop_tpu.ops.telemetry import NULL_TAPE, ScopedTape
from outeffhop_tpu.quant.calibrate import NULL_QCTX, ScopedQuantCtx

Array = jax.Array

STANHOP_MODES = ("entmax", "softmax1", "softmax", "sparsemax", "clip", "clip_softmax1")


@dataclasses.dataclass(frozen=True)
class STanHopConfig:
    data_dim: int
    in_len: int
    out_len: int
    seg_len: int
    win_size: int = 2
    factor: int = 10
    d_model: int = 512
    d_ff: int = 1024
    n_heads: int = 8
    e_layers: int = 3
    dropout: float = 0.0
    baseline: bool = False
    eta: float = 1.1
    gamma: float = -0.1
    mode: str = "entmax"

    def __post_init__(self):
        if self.mode not in STANHOP_MODES:
            raise ValueError(f"mode must be one of {STANHOP_MODES}, got {self.mode!r}")

    @property
    def pad_in_len(self) -> int:
        return math.ceil(self.in_len / self.seg_len) * self.seg_len

    @property
    def pad_out_len(self) -> int:
        return math.ceil(self.out_len / self.seg_len) * self.seg_len

    @property
    def in_seg_num(self) -> int:
        return self.pad_in_len // self.seg_len

    @property
    def out_seg_num(self) -> int:
        return self.pad_out_len // self.seg_len

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads


# ---------------------------------------------------------------------------
# Association = attention core with mode-selected softmax (hopfield.py:19-51)
# ---------------------------------------------------------------------------


# Round-6 matmul-lattice trims, MEASURED AND REJECTED as defaults
# (probe41, ETTh1 train step, scan-slope): base 28.82 ms, kv-reuse alone
# 29.51, both trims 30.54. Removing the duplicate key_projection matmul
# and fusing q+k are numerics-identical (tested) and strictly less work —
# and still LOSE: at this small-tile lattice the step is latency/
# scheduling-bound, and the "redundant" second matmul gives XLA two
# independent producer chains it can overlap, while the reuse serializes
# value_projection behind the shared kh and adds a second consumer that
# blocks its producer fusion. Same family of lesson as the flat-buffer
# optimizer (round 5) and probe38: HBM/FLOP savings that sit inside the
# latency-hiding envelope buy nothing. Flags kept for re-measurement at
# other scales (d_model >= 512 may flip it).
_FUSE_SELF_QK = False
_REUSE_KV = False

# HopfieldPooling's keys/values are a SHARED learnable prototype bank
# ((1, factor, dm), hopfield.py:111-131) broadcast over the batch — the
# reference formulation projects the broadcast copies (batch x redundant
# rows through key/value_projection) and then runs batch-many tiny
# (L, E)x(E, S) attention tiles. With this flag the bank is projected ONCE
# and the attention contracts against the shared (S, H, E) keys directly
# ('blhe,she->bhls'), turning the per-example tile lattice into a few large
# MXU-shaped matmuls. Bit-identical rows (linear ops are row-independent;
# fwd + grad equivalence tested in tests/test_stanhop.py); disabled during
# discover/calibrate so range estimation observes the reference's per-call
# tensor shapes (frozen run-mode quant is row-wise elementwise and takes the
# fast path — equivalence-tested).
#
# ADJUDICATED ON CHIP and shipped as the default (probe43, ETTh1 headline
# shape, scan-slope): train 28.87 -> 22.37 ms/step (+29%), inference
# 7.27 -> 6.14 ms/step (+18%). This is the restructure-level win probe41's
# op-golf refutations pointed at: it removes work AND shrinks the small-tile
# lattice instead of merely trimming FLOPs inside it.
_POOL_SHARED_KEYS = True

# probe47 decomposition put the encoder's attention cores at the forward's
# floor: the per-head association einsums are (seg x d_head x seg) tiles
# (28x64x28 at scale 0) — K = 64 fills half the 128-deep MXU and the
# 28-lane outputs use ~22% of the lane width (~11% effective utilization).
# This flag reformulates BOTH association einsums as block-diagonal
# full-depth matmuls: keys are scattered into a (B, H·E, H·S) tensor whose
# (h, g) off-diagonal blocks are ZERO, so one (L, H·E)x(H·E, H·S) matmul
# computes every head's scores (off-diag contributions vanish), and the PV
# product likewise contracts (L, H·S)x(H·S, H·D). 4x the FLOPs at ~8x the
# tile utilization, at the cost of two zero-padded materializations.
# A/B'd on chip as probe48 and REFUTED (BASELINE.md): infer 5.79 -> 6.07 ms
# (-4.8%), deterministic train 19.21 -> 22.06 ms (-14.8%). XLA's batched
# small matmuls pack multiple batch elements per MXU pass — better than the
# naive per-tile utilization arithmetic — and the zero-padded key/value
# materializations are pure extra HBM traffic in the backward. Kept (with
# its equivalence test) as the second independent demonstration, after
# probe41, that this lattice rejects FLOP-for-layout trades.
_BLOCKDIAG_ASSOC = False

# Same batch-redundancy family: decoder layer 0's STHM input is dec_pos
# broadcast over the batch (stanhop.py:62-66 in the reference — the decoder
# state starts as the learned positional bank), so under a deterministic
# forward the whole first STHM call is batch-CONSTANT. Compute it on one row
# and broadcast: removes a full STHM layer's batch-many small-tile lattice.
# Disabled when dropout is live (rows diverge) and during quant
# discover/calibrate (estimator shape parity, like _POOL_SHARED_KEYS).
# Gradients through the broadcast are exact (cotangent sum over identical
# rows == the replicated computation's gradient; equivalence-tested).
_DEC0_SHARED_STHM = True


def association_softmax(cfg: STanHopConfig, scores: Array, pre_alpha: Optional[Array]):
    """(B, H, L, S) scores → probabilities by `cfg.mode`."""
    if cfg.mode == "entmax":
        # EntmaxAlpha (entmax.py:23-45): learnable scalar pre-α,
        # α = clamp(1 + 2σ(pre_alpha), 1.0001, 3), bisection solver
        alpha = jnp.clip(1.0 + 2.0 * jax.nn.sigmoid(pre_alpha), 1.0001, 3.0)
        return entmax_bisect(scores, alpha=alpha, axis=-1)
    if cfg.mode == "softmax1":
        return softmax_n(scores, 1.0, axis=-1)
    if cfg.mode == "softmax":
        return jax.nn.softmax(scores, axis=-1)
    if cfg.mode == "sparsemax":
        return sparsemax(scores, axis=-1)
    if cfg.mode == "clip":
        return clipped_softmax(scores, gamma=cfg.gamma, eta=cfg.eta, axis=-1)
    if cfg.mode == "clip_softmax1":
        return clipped_softmax1(scores, gamma=cfg.gamma, eta=cfg.eta, axis=-1)
    raise AssertionError(cfg.mode)


def association(
    cfg: STanHopConfig,
    queries: Array,  # (B, L, H, E)
    keys: Array,     # (B, S, H, E)
    values: Array,   # (B, S, H, D)
    pre_alpha: Optional[Array],
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Array:
    """hopfield.py:42-51 — scale applied to scores BEFORE softmax."""
    scale = 1.0 / math.sqrt(queries.shape[-1])
    shared_kv = keys.shape[0] == 1 and queries.shape[0] != 1
    blockdiag = _BLOCKDIAG_ASSOC and not shared_kv
    if shared_kv:
        # keys/values are batch-shared (HopfieldPooling prototype bank under
        # _POOL_SHARED_KEYS): contract against the (S, H, E) bank directly —
        # one large (B·L, E)x(E, S) matmul per head instead of B tiny tiles
        scores = jnp.einsum("blhe,she->bhls", queries, keys[0]) * scale
    elif blockdiag:
        # block-diagonal full-depth formulation (see _BLOCKDIAG_ASSOC): the
        # eye outer-product zero-pads keys so ONE (L, H·E)x(H·E, H·S) matmul
        # per example computes all heads' scores with K = H·E
        b, l, h, e = queries.shape
        s = keys.shape[1]
        eye = jnp.eye(h, dtype=keys.dtype)
        kp = jnp.einsum("bshe,hg->bhegs", keys, eye).reshape(b, h * e, h * s)
        scores = jax.lax.dot_general(
            queries.reshape(b, l, h * e), kp,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (B, L, H*S)
        scores = scores.reshape(b, l, h, s).transpose(0, 2, 1, 3) * scale
    else:
        scores = jnp.einsum("blhe,bshe->bhls", queries, keys) * scale
    scores = tape.record("attn_scores", scores)
    scores = q.act("attn_scores", scores)
    probs = association_softmax(cfg, scores, pre_alpha)
    probs = tape.record("attn_probs", probs)
    probs = q.act("attn_probs", probs)
    probs = common.dropout(probs, cfg.dropout, dropout_rng, deterministic)
    if shared_kv:
        return jnp.einsum("bhls,shd->blhd", probs, values[0])
    if blockdiag:
        b, h, l, s = probs.shape
        d = values.shape[-1]
        eye = jnp.eye(h, dtype=values.dtype)
        vp = jnp.einsum("bshd,hg->bhsgd", values, eye).reshape(b, h * s, h * d)
        out = jax.lax.dot_general(
            probs.transpose(0, 2, 1, 3).reshape(b, l, h * s), vp,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (B, L, H*D)
        return out.reshape(b, l, h, d).astype(values.dtype)
    return jnp.einsum("bhls,bshd->blhd", probs, values)


def _mix_merge(out: Array) -> Array:
    """mix=True head merge (hopfield.py:85-87): (B,L,H,D) → transpose(2,1) →
    contiguous view(B,L,-1). The reshape-after-transpose reinterprets memory;
    replicated exactly (row-major reshape of the transposed array)."""
    b, l, h, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def hopfield_params(key, cfg: STanHopConfig, pooling: bool = False):
    keys = jax.random.split(key, 5)
    dm, dk = cfg.d_model, cfg.d_head * cfg.n_heads
    p = {
        "query_projection": common.dense_params(keys[0], dm, dk),
        "key_projection": common.dense_params(keys[1], dm, dk),
        "value_projection": common.dense_params(keys[2], dk, dk),
        "out_projection": common.dense_params(keys[3], dk, dm),
    }
    if cfg.mode == "entmax":
        p["pre_alpha"] = jax.random.normal(keys[4], (1,))
    if pooling:
        # torch.empty → uninitialized in the reference; we init N(0, 1)
        p["key"] = jax.random.normal(keys[4], (1, cfg.factor, dm))
    return p


def hopfield(
    params,
    cfg: STanHopConfig,
    queries: Array,  # (B, L, dm)
    keys: Array,     # (B, S, dm)
    values_src: Array,  # (B, S, dm) — projected through key_projection first!
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Array:
    """Hopfield MHA (hopfield.py:53-90): value = value_proj(key_proj(values_src))."""
    b, l, _ = queries.shape
    s = keys.shape[1]
    h = cfg.n_heads
    if queries is keys and not q.enabled and _FUSE_SELF_QK:
        # self-attention fast path: one (dm -> 2·dk) matmul instead of two
        # small ones (fewer kernel launches, bigger MXU tile). Identical
        # numerics (same weights, concatenated on the out-features axis);
        # disabled under a live quant ctx so per-site weight/act fake-quant
        # keeps the reference's per-projection granularity.
        wqk = jnp.concatenate(
            [params["query_projection"]["weight"], params["key_projection"]["weight"]],
            axis=0,
        )
        bqk = jnp.concatenate(
            [params["query_projection"]["bias"], params["key_projection"]["bias"]]
        )
        qk = queries @ wqk.T + bqk
        dk = params["query_projection"]["weight"].shape[0]
        qh, kh = qk[..., :dk], qk[..., dk:]
    else:
        qh = common.dense(params["query_projection"], queries, q, "query_projection")
        kh = common.dense(params["key_projection"], keys, q, "key_projection")
    # NOTE hopfield.py:78: values come from key_projection(keys), where `keys`
    # is the VALUES argument in the caller; in self-attention they coincide —
    # and when they are literally the same array, key_projection(values_src)
    # IS kh (identical op on identical input): skip the duplicate matmul.
    # Not under a live quant ctx: the reference's calibration estimators
    # OBSERVE the key_projection site once per call (running-minmax EMA
    # state depends on the observation count), so the duplicate pass is
    # kept there for bit-exact range parity.
    if values_src is keys and not q.enabled and _REUSE_KV:
        kv = kh
    else:
        kv = common.dense(params["key_projection"], values_src, q, "key_projection")
    vh = common.dense(params["value_projection"], kv, q, "value_projection")
    out = association(
        cfg,
        qh.reshape(b, l, h, -1),
        kh.reshape(b, s, h, -1),
        vh.reshape(b, s, h, -1),
        params.get("pre_alpha"),
        q=q, tape=tape, dropout_rng=dropout_rng, deterministic=deterministic,
    )
    out = _mix_merge(out)
    out = q.act("context", out)
    return common.dense(params["out_projection"], out, q, "out_projection")


def hopfield_pooling(
    params,
    cfg: STanHopConfig,
    query: Array,  # (B, L, dm)
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Array:
    """HopfieldPooling (hopfield.py:92-141): learnable prototype keys."""
    b, l, _ = query.shape
    h = cfg.n_heads
    s = params["key"].shape[1]
    qh = common.dense(params["query_projection"], query, q, "query_projection")
    if _POOL_SHARED_KEYS and not q.needs_reference_shapes:
        # project the (1, factor, dm) bank ONCE; association contracts
        # against the shared bank without materializing broadcast copies.
        # Allowed under a frozen RUN-mode quant ctx too (fake-quant / int8
        # dense are row-wise identical on the shared bank vs its broadcast
        # copies — equivalence-tested); only discover/calibrate need the
        # reference's per-call broadcast shapes for estimator-state parity.
        kh = common.dense(params["key_projection"], params["key"], q,
                          "key_projection")
        vh = common.dense(params["value_projection"], kh, q,
                          "value_projection")
        kb, vb = kh.reshape(1, s, h, -1), vh.reshape(1, s, h, -1)
    else:
        k = jnp.broadcast_to(params["key"], (b,) + params["key"].shape[1:])
        kh = common.dense(params["key_projection"], k, q, "key_projection")
        vh = common.dense(params["value_projection"], kh, q, "value_projection")
        kb, vb = kh.reshape(b, s, h, -1), vh.reshape(b, s, h, -1)
    out = association(
        cfg,
        qh.reshape(b, l, h, -1),
        kb,
        vb,
        params.get("pre_alpha"),
        q=q, tape=tape, dropout_rng=dropout_rng, deterministic=deterministic,
    )
    out = _mix_merge(out)
    out = q.act("context", out)
    return common.dense(params["out_projection"], out, q, "out_projection")


# ---------------------------------------------------------------------------
# STHMLayer (hopfield.py:143-186)
# ---------------------------------------------------------------------------


def sthm_layer_params(key, cfg: STanHopConfig):
    keys = jax.random.split(key, 7)
    dm, df = cfg.d_model, cfg.d_ff
    return {
        "cross_time": hopfield_params(keys[0], cfg),
        "cross_series": hopfield_params(keys[1], cfg, pooling=True),
        "hopfield": hopfield_params(keys[2], cfg),
        "norm3": common.ln_params(dm),
        "MLP1": {
            "fc1": common.dense_params(keys[3], dm, df),
            "fc2": common.dense_params(keys[4], df, dm),
        },
        "MLP2": {
            "fc1": common.dense_params(keys[5], dm, df),
            "fc2": common.dense_params(keys[6], df, dm),
        },
    }


def _mlp(params, x, q: ScopedQuantCtx):
    h = common.dense(params["fc1"], x, q, "fc1", activation=common.gelu)
    return common.dense(params["fc2"], h, q, "fc2")


def sthm_layer(
    params,
    cfg: STanHopConfig,
    x: Array,  # (B, D, seg_num, dm)
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Array:
    b, ts_d, seg_num, dm = x.shape
    rngs = jax.random.split(dropout_rng, 7) if dropout_rng is not None else [None] * 7

    def drop(v, rng):
        return common.dropout(v, cfg.dropout, rng, deterministic)

    # cross-time: attention over segments, per series
    time_in = x.reshape(b * ts_d, seg_num, dm)
    time_enc = hopfield(
        params["cross_time"], cfg, time_in, time_in, time_in,
        q=q.scoped("cross_time"), tape=tape.scoped("cross_time"),
        dropout_rng=rngs[0], deterministic=deterministic,
    )
    dim_in = time_in + drop(time_enc, rngs[1])
    dim_in = dim_in + drop(_mlp(params["MLP1"], dim_in, q.scoped("MLP1")), rngs[2])

    # cross-series: attention over series, per segment
    # '(b ts_d) seg_num dm -> (b seg_num) ts_d dm'
    series_in = (
        dim_in.reshape(b, ts_d, seg_num, dm)
        .transpose(0, 2, 1, 3)
        .reshape(b * seg_num, ts_d, dm)
    )
    series_h = hopfield_pooling(
        params["cross_series"], cfg, series_in,
        q=q.scoped("cross_series"), tape=tape.scoped("cross_series"),
        dropout_rng=rngs[3], deterministic=deterministic,
    )
    pooled_h = hopfield(
        params["hopfield"], cfg, series_in, series_in, series_h,
        q=q.scoped("hopfield"), tape=tape.scoped("hopfield"),
        dropout_rng=rngs[4], deterministic=deterministic,
    )
    dim_enc = series_h + drop(pooled_h, rngs[5])
    dim_enc = common.quant_layer_norm(params["norm3"], dim_enc, q, "norm3", 1e-5)
    dim_enc = dim_enc + drop(_mlp(params["MLP2"], dim_enc, q.scoped("MLP2")), rngs[6])
    dim_enc = tape.record("dim_enc", dim_enc)

    # '(b seg_num) ts_d dm -> b ts_d seg_num dm'
    return (
        dim_enc.reshape(b, seg_num, ts_d, dm).transpose(0, 2, 1, 3)
    )


# ---------------------------------------------------------------------------
# Encoder / Decoder (encoder.py, decoder.py)
# ---------------------------------------------------------------------------


def seg_merging_params(key, cfg: STanHopConfig):
    dm, w = cfg.d_model, cfg.win_size
    return {
        "norm": common.ln_params(w * dm),
        "linear_trans": common.dense_params(key, w * dm, dm),
    }


def seg_merging(params, cfg: STanHopConfig, x: Array, q: ScopedQuantCtx) -> Array:
    """encoder.py:25-42: pad tail-repeat, interleave win_size segments, LN,
    Linear(win·dm → dm)."""
    b, ts_d, seg_num, dm = x.shape
    w = cfg.win_size
    pad = seg_num % w
    if pad != 0:
        pad = w - pad
        x = jnp.concatenate([x, x[:, :, -pad:, :]], axis=2)
        seg_num += pad
    # torch ref concatenates the w strided views x[:, :, i::w, :] along dm
    # (encoder.py:36-38); [x[jw], x[jw+1], ..] per output row is exactly the
    # row-major reshape — one free relayout instead of w gathers + concat
    merged = x.reshape(b, ts_d, seg_num // w, w * dm)
    merged = common.layer_norm(params["norm"], merged, 1e-5)
    return common.dense(params["linear_trans"], merged, q, "linear_trans")


def init_stanhop_params(key, cfg: STanHopConfig):
    keys = jax.random.split(key, 2 * (cfg.e_layers + 1) + 4)
    dm = cfg.d_model
    params = {
        "enc_emb": common.dense_params(keys[0], cfg.seg_len, dm),
        "enc_pos": jax.random.normal(keys[1], (1, cfg.data_dim, cfg.in_seg_num, dm)),
        "pre_norm": common.ln_params(dm),
        "dec_pos": jax.random.normal(keys[2], (1, cfg.data_dim, cfg.out_seg_num, dm)),
        "encoder": [],
        "decoder": [],
    }
    # encoder block 0: no merge; blocks 1..e_layers-1: merge + STHM
    for i in range(cfg.e_layers):
        bk = jax.random.split(keys[3 + i], 2)
        block = {"sthm": sthm_layer_params(bk[0], cfg)}
        if i > 0 and cfg.win_size > 1:
            block["merge"] = seg_merging_params(bk[1], cfg)
        params["encoder"].append(block)
    # decoder: e_layers + 1 layers
    for i in range(cfg.e_layers + 1):
        dk = jax.random.split(keys[3 + cfg.e_layers + i], 6)
        params["decoder"].append(
            {
                "sthm": sthm_layer_params(dk[0], cfg),
                "hopfield": hopfield_params(dk[1], cfg),
                "norm1": common.ln_params(dm),
                "norm2": common.ln_params(dm),
                "MLP1": common.dense_params(dk[2], dm, dm),
                "MLP2": common.dense_params(dk[3], dm, dm),
                "linear_pred": common.dense_params(dk[4], dm, cfg.seg_len),
            }
        )
    return params


def stanhop_encoder(
    params_list,
    cfg: STanHopConfig,
    x: Array,
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Sequence[Array]:
    """Returns ALL scales [embedding, scale0, scale1, ...] (encoder.py:92-100)."""
    outs = [x]
    rngs = (
        jax.random.split(dropout_rng, len(params_list))
        if dropout_rng is not None
        else [None] * len(params_list)
    )
    for i, bp in enumerate(params_list):
        qi, ti = q.scoped(f"enc{i}"), tape.scoped(f"enc{i}")
        if "merge" in bp:
            x = seg_merging(bp["merge"], cfg, x, qi.scoped("merge"))
        x = sthm_layer(
            bp["sthm"], cfg, x, q=qi.scoped("sthm"), tape=ti.scoped("sthm"),
            dropout_rng=rngs[i], deterministic=deterministic,
        )
        outs.append(x)
    return outs


def stanhop_decoder_layer(
    params,
    cfg: STanHopConfig,
    x: Array,      # (B, D, out_seg, dm)
    cross: Array,  # (B, D, in_seg_i, dm)
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    sthm_batch_shared: bool = False,
):
    b, ts_d, out_seg, dm = x.shape
    rngs = jax.random.split(dropout_rng, 3) if dropout_rng is not None else [None] * 3
    if sthm_batch_shared:
        # caller guarantees x's rows are identical (dec_pos broadcast) and the
        # forward is deterministic: one row through the STHM, broadcast back
        x1 = sthm_layer(
            params["sthm"], cfg, x[:1], q=q.scoped("sthm"),
            tape=tape.scoped("sthm"),
            dropout_rng=rngs[0], deterministic=deterministic,
        )
        x = jnp.broadcast_to(x1, (b,) + x1.shape[1:])
    else:
        x = sthm_layer(
            params["sthm"], cfg, x, q=q.scoped("sthm"), tape=tape.scoped("sthm"),
            dropout_rng=rngs[0], deterministic=deterministic,
        )
    xf = x.reshape(b * ts_d, out_seg, dm)
    crossf = cross.reshape(b * ts_d, cross.shape[2], dm)
    tmp = hopfield(
        params["hopfield"], cfg, xf, crossf, crossf,
        q=q.scoped("hopfield"), tape=tape.scoped("hopfield"),
        dropout_rng=rngs[1], deterministic=deterministic,
    )
    xf = xf + common.dropout(tmp, cfg.dropout, rngs[2], deterministic)
    xn = common.quant_layer_norm(params["norm1"], xf, q, "norm1", 1e-5)
    y = common.dense(params["MLP1"], xn, q, "MLP1", activation=common.gelu)
    y = common.dense(params["MLP2"], y, q, "MLP2")
    dec_out = common.quant_layer_norm(params["norm2"], xn + y, q, "norm2", 1e-5)
    dec_out = tape.record("dec_out", dec_out)
    dec_out = dec_out.reshape(b, ts_d, out_seg, dm)
    layer_pred = common.dense(params["linear_pred"], dec_out, q, "linear_pred")
    # 'b out_d seg_num seg_len -> b (out_d seg_num) seg_len'
    layer_pred = layer_pred.reshape(b, ts_d * out_seg, cfg.seg_len)
    return dec_out, layer_pred


def stanhop_forward(
    params,
    cfg: STanHopConfig,
    x_seq: Array,  # (B, in_len, data_dim)
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Array:
    """(B, in_len, D) → (B, out_len, D) forecast (stanhop.py:50-68)."""
    b = x_seq.shape[0]
    base = jnp.mean(x_seq, axis=1, keepdims=True) if cfg.baseline else 0.0
    if cfg.pad_in_len != cfg.in_len:
        add = cfg.pad_in_len - cfg.in_len
        x_seq = jnp.concatenate(
            [jnp.broadcast_to(x_seq[:, :1], (b, add, cfg.data_dim)), x_seq], axis=1
        )
    # DSW PatchEmbedding (embed.py:15-22): per-series seg_len windows → dm
    d = cfg.data_dim
    xs = x_seq.reshape(b, cfg.in_seg_num, cfg.seg_len, d).transpose(0, 3, 1, 2)
    x = common.dense(params["enc_emb"], xs, q, "enc_emb")  # (B, D, seg, dm)
    x = x + params["enc_pos"].astype(x.dtype)
    x = q.act("embed_sum", x)
    x = common.quant_layer_norm(params["pre_norm"], x, q, "pre_norm", 1e-5)

    rngs = jax.random.split(dropout_rng, 2) if dropout_rng is not None else [None, None]
    enc_outs = stanhop_encoder(
        params["encoder"], cfg, x, q=q, tape=tape,
        dropout_rng=rngs[0], deterministic=deterministic,
    )

    dec_in = jnp.broadcast_to(
        params["dec_pos"], (b,) + params["dec_pos"].shape[1:]
    ).astype(x.dtype)
    drngs = (
        jax.random.split(rngs[1], len(params["decoder"]))
        if rngs[1] is not None
        else [None] * len(params["decoder"])
    )
    final_pred = None
    xdec = dec_in
    dec0_shared = (
        _DEC0_SHARED_STHM
        and deterministic
        and b > 1
        and not q.needs_reference_shapes
        and not tape.enabled  # probes must record full-batch tensors
    )
    for i, dp in enumerate(params["decoder"]):
        xdec, layer_pred = stanhop_decoder_layer(
            dp, cfg, xdec, enc_outs[i],
            q=q.scoped(f"dec{i}"), tape=tape.scoped(f"dec{i}"),
            dropout_rng=drngs[i], deterministic=deterministic,
            sthm_batch_shared=dec0_shared and i == 0,
        )
        final_pred = layer_pred if final_pred is None else final_pred + layer_pred
    # 'b (out_d seg_num) seg_len -> b (seg_num seg_len) out_d'
    d_out = cfg.data_dim
    final_pred = final_pred.reshape(b, d_out, cfg.out_seg_num, cfg.seg_len)
    final_pred = final_pred.transpose(0, 2, 3, 1).reshape(b, cfg.pad_out_len, d_out)
    return base + final_pred[:, : cfg.out_len]


def mse_loss(pred: Array, true: Array) -> Array:
    return jnp.mean((pred - true) ** 2)
