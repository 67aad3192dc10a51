"""OPT decoder + causal LM head with OutEffHop attention extras.

Functional re-design of the reference's surgically-modified HF OPT
(`run_clm.py:216` surgery, `transformers_language/models/opt_attention.py`,
`quantized_opt.py`). Feature parity notes:

  * scaling folded into the query projection output
    (`opt_attention.py:167`: q = q_proj(x) * d_head^-0.5);
  * post-mask clamp to finfo.min (`opt_attention.py:225-228`);
  * softmax upcast to fp32 when running reduced precision
    (`opt_attention.py:227-230`) — we always compute the softmax in fp32;
  * learned positional embedding with the cumsum-of-mask position ids and
    offset 2 (`quantized_opt.py:27-51`);
  * pre-LN (125m/1.3b …) and post-LN (350m) layer orders, project_in/out for
    word_embed_proj_dim != hidden (`quantized_opt.py:387-...`);
  * reference bug NOT replicated: `opt_attention.py:73` compares
    `attn_softmax is "softmax1"` with `is`, which is always False in practice,
    so the alpha mode always uses clipped_softmax. We reproduce that behavior
    (alpha → clipped_softmax) and expose `alpha_softmax1=True` to get the
    clearly-intended clipped_softmax1 path.

Quant sites match `QuantizedOPT*`: embed_tokens/embed_positions weight-
quantized, embed-sum requant (`:569`), q/k/v/out_proj QuantLinear, scores /
probs / context act sites (`:154,182,210`), both residual sums requantized
(`self_attn_res`/`ffn_res`, `:345,369`), fc1+ReLU folded (`:292-294`), LNs
hijack-quantized, lm_head per `quant_setup` policy (`:733-756` — handled by
naming it "head.lm" so the config's fp32_head policies apply).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.ops.attention import (
    AttentionExtrasConfig,
    apply_gate,
    attention_extras_params,
    split_heads,
    merge_heads,
)
from outeffhop_tpu.ops.softmax_variants import clipped_softmax, clipped_softmax1, resolve_softmax
from outeffhop_tpu.ops.telemetry import NULL_TAPE, ScopedTape
from outeffhop_tpu.quant.calibrate import NULL_QCTX, ScopedQuantCtx

Array = jax.Array

POS_OFFSET = 2  # OPT's learned positional embedding offset


class Int8KV(NamedTuple):
    """INT8-quantized KV cache block with per-token-per-head scales.

    Storing the cache as int8 halves its HBM traffic. The dequantization is
    EXACT and free of extra memory traffic because the per-token scales
    commute with the attention matmuls:

        scores[q,t] = (Q @ K_int8^T)[q,t] * k_scale[t]       (after QK^T)
        context     = (probs * v_scale[t]) @ V_int8          (before PV)

    so the int8 tensors are read directly by the matmuls and the f32 scale
    vectors are O(T·H) — negligible. MEASURED (round-4 probe22/22b): the win
    only appears where cache traffic actually dominates the decode step —
    **2.0×** at 32 slots × bucket 2048 (cache ≈ 4.8 GB/step vs 250 MB of
    weights), but a LOSS at 8 slots × bucket 512 where the step is
    weight-streaming-bound and the quant/dequant work has nothing to pay for.
    New capability beyond the reference (whose KV cache is whatever HF OPT
    does, fp16 — `modeling_opt` via `run_clm.py:216`).
    """

    k: Array  # (B, H, T, D) int8
    v: Array  # (B, H, T, D) int8
    k_scale: Array  # (B, H, T) f32
    v_scale: Array  # (B, H, T) f32


def quantize_kv(k: Array, v: Array) -> Int8KV:
    """Per-token-per-head symmetric int8 quantization of K/V blocks
    ((B, H, T, D) → Int8KV)."""

    def q1(x):
        scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        xi = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        return xi, scale

    ki, ks = q1(k)
    vi, vs = q1(v)
    return Int8KV(ki, vi, ks, vs)


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None  # != hidden → project_in/out (350m)
    do_layer_norm_before: bool = True  # False for 350m
    dropout: float = 0.1
    # HF OPTConfig.attention_dropout (default 0.0) — the reference's attention
    # probs dropout (`opt_attention.py` self.dropout=config.attention_dropout)
    # is a SEPARATE knob from the hidden `dropout`; only this one gates the
    # fused attention path (hidden dropout composes fine around the kernel).
    attention_dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    # attention extras
    attn_softmax: str = "vanilla"
    alpha: Optional[float] = None
    max_seq_length: Optional[int] = None
    alpha_softmax1: bool = False  # intended-but-buggy reference path, opt-in
    skip_attn: bool = False
    attn_gate_type: str = "none"
    attn_gate_init: Optional[float] = None
    attn_gate_mlp: bool = False
    attn_gate_mlp2: bool = False
    attn_gate_linear_all_features: bool = False
    fine_tuning: bool = False

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def attention_config(self) -> AttentionExtrasConfig:
        return AttentionExtrasConfig(
            hidden_size=self.hidden_size,
            num_heads=self.num_attention_heads,
            softmax=self.attn_softmax,
            gate_type=self.attn_gate_type,
            gate_init=self.attn_gate_init,
            gate_mlp=self.attn_gate_mlp,
            gate_mlp2=self.attn_gate_mlp2,
            gate_linear_all_features=self.attn_gate_linear_all_features,
            fine_tuning=self.fine_tuning,
            dropout_rate=self.dropout,
        )

    def softmax_fn(self):
        if self.alpha is not None:
            assert self.max_seq_length is not None
            gamma = -self.alpha / self.max_seq_length
            fn = clipped_softmax1 if self.alpha_softmax1 else clipped_softmax
            import functools

            return functools.partial(fn, gamma=gamma, eta=1.0)
        return resolve_softmax(self.attn_softmax)


def init_opt_params(key, cfg: OPTConfig):
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    h, e, f = cfg.hidden_size, cfg.embed_dim, cfg.ffn_dim
    acfg = cfg.attention_config()
    ek = jax.random.split(keys[0], 4)
    params = {
        "embed_tokens": common.embedding_params(ek[0], cfg.vocab_size, e),
        "embed_positions": common.embedding_params(
            ek[1], cfg.max_position_embeddings + POS_OFFSET, h
        ),
        "final_ln": common.ln_params(h),
        "layers": [],
    }
    if e != h:
        params["project_in"] = {
            "weight": jax.random.normal(ek[2], (h, e)) * 0.02, "bias": None
        }
        params["project_out"] = {
            "weight": jax.random.normal(ek[3], (e, h)) * 0.02, "bias": None
        }
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(keys[i + 1], 4)
        attn = attention_extras_params(lk[0], acfg)
        attn["out_proj"] = common.dense_params(lk[1], h, h)
        # torch naming: q_proj/k_proj/v_proj
        attn["q_proj"] = attn.pop("query")
        attn["k_proj"] = attn.pop("key")
        attn["v_proj"] = attn.pop("value")
        params["layers"].append(
            {
                "self_attn": attn,
                "self_attn_ln": common.ln_params(h),
                "fc1": common.dense_params(lk[2], h, f),
                "fc2": common.dense_params(lk[3], f, h),
                "final_ln": common.ln_params(h),
            }
        )
    params["head"] = {"lm": {"weight": None}}  # tied to embed_tokens by default
    return params


def causal_mask_bias(
    attention_mask: Array, t_q: int, past_len: int = 0, dtype=jnp.float32
) -> Array:
    """(B, S) padding mask → (B, 1, T, S) combined causal+padding additive mask
    (HF `_prepare_decoder_attention_mask`, quantized_opt.py:432-457)."""
    b, s = attention_mask.shape
    neg = jnp.finfo(dtype).min
    pad = (1.0 - attention_mask[:, None, None, :].astype(dtype)) * neg
    if t_q > 1:
        q_pos = jnp.arange(t_q)[:, None] + past_len
        k_pos = jnp.arange(s)[None, :]
        causal = jnp.where(q_pos >= k_pos, 0.0, neg).astype(dtype)
        return pad + causal[None, None]
    return pad


def opt_positions(attention_mask: Array, past_len: int = 0) -> Array:
    """cumsum-of-mask position ids (`quantized_opt.py:27-51`)."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) * attention_mask.astype(
        jnp.int32
    ) - 1
    return pos[:, past_len:] + POS_OFFSET


def opt_attention(
    params,
    cfg: OPTConfig,
    hidden_states: Array,
    attention_mask: Optional[Array],
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    past_key_value: Optional[Tuple[Array, Array]] = None,
    padding_bias: Optional[Array] = None,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    decode_fast: bool = False,
) -> Tuple[Array, Optional[Tuple[Array, Array]]]:
    """OPT self-attention with extras; scaling folded into q
    (opt_attention.py:167)."""
    n_heads = cfg.num_attention_heads
    scaling = cfg.head_dim**-0.5
    acfg = cfg.attention_config()

    q_states = common.dense(params["q_proj"], hidden_states, q, "q_proj") * scaling
    k_packed = common.dense(params["k_proj"], hidden_states, q, "k_proj")
    v_packed = common.dense(params["v_proj"], hidden_states, q, "v_proj")

    from outeffhop_tpu.ops.flash import packed_supported, pallas_attention_worthwhile
    from outeffhop_tpu.ops.softmax_variants import fused_softmax_spec

    b, t, _ = hidden_states.shape
    fused = fused_softmax_spec(
        cfg.attn_softmax, cfg.alpha, cfg.max_seq_length, cfg.alpha_softmax1
    )
    # Packed prefill path: q/k/v never leave the (B, T, H*D) layout the
    # projections produce. Round 3 measured the unpacked kernel LOSING e2e
    # (ViT −22%, probe14) and CRASHING Mosaic in the OPT composition at
    # B8xT512 — the packed kernel is the one with verified on-chip wins
    # (probe12: 4.10x at B32xT512) and no transpose materializations.
    packed_ok = (
        use_flash
        and past_key_value is None
        and not tape.enabled
        and not q.act_sites_enabled
        and fused is not None
        and (deterministic or cfg.attention_dropout == 0.0)
        and pallas_attention_worthwhile(b, n_heads, t, t, causal=t > 1)
        and packed_supported(b, t, t, n_heads, cfg.head_dim,
                             hidden_states.dtype.itemsize)
    )
    if packed_ok:
        from outeffhop_tpu.ops.flash import flash_attention_packed

        context = flash_attention_packed(
            q_states,
            k_packed,
            v_packed,
            bias=padding_bias,
            heads=n_heads,
            softmax_n=fused[0],
            scale=1.0,  # already folded into q
            causal=t > 1,
            clip=fused[1],
        )
        if cfg.attn_gate_type != "none":
            from outeffhop_tpu.ops.attention import apply_gate_packed

            context = apply_gate_packed(
                context, params.get("gate"), acfg, hidden_states, tape
            )
        context = q.act("context", context)
        out = common.dense(params["out_proj"], context, q, "out_proj")
        # new_past in the standard (B, H, T, D) cache layout; XLA dead-code-
        # eliminates the transposes when the caller drops the past
        return out, (split_heads(k_packed, n_heads), split_heads(v_packed, n_heads))

    k_states = split_heads(k_packed, n_heads)
    v_states = split_heads(v_packed, n_heads)

    # Single-token decode fast path (opt-in, `decode_fast=True`): score the
    # query against the (static) cache and the fresh K/V separately instead
    # of concatenating the cache with the new token — the concat
    # materializes a (B, H, S+1, D) copy of BOTH caches per layer per step
    # (≥2x the decode step's HBM traffic at serving shapes). Scores are
    # tiny, so concatenating THEM is free. new_past becomes just the current
    # token's (k, v) — callers that keep their own preallocated cache
    # (serving engine, greedy_generate) index [:, :, -1], identical either
    # way; callers that thread the returned past forward (the HF-style
    # incremental API) must leave decode_fast off.
    # decode_fast generalizes to q_len = W > 1 (speculative-verification
    # windows): scores against the static cache and the fresh W-token block
    # are computed separately and concatenated — the SCORES are tiny, so the
    # (B, H, S+W, D) K/V cache concat (2x the decode step's HBM traffic) is
    # avoided for any window size, and the int8 cache stays fused (scales
    # commute with the contractions, Int8KV docstring).
    decode_fast = (
        decode_fast
        and past_key_value is not None
        and not tape.enabled
        and not q.act_sites_enabled
        and (deterministic or cfg.attention_dropout == 0.0)
    )
    if isinstance(past_key_value, Int8KV) and not decode_fast:
        # Dequantize the past block up front — numerically identical to
        # decode_fast's fused scale application (the per-token scales commute
        # with the attention matmuls either way), but this path ALSO pays the
        # per-layer float KV concat decode_fast exists to avoid. Reachable
        # when decode_fast's runtime gate turns itself off (live tape, act
        # quant sites, attention dropout); warn at trace time so the
        # pathological hot path is loud (it used to be a hard ValueError).
        import warnings

        warnings.warn(
            "Int8KV past on the non-decode_fast path: dequantizing and "
            "concatenating the float cache per layer (>=2x decode HBM "
            "traffic). Expected only for speculative verification under "
            "telemetry/act-quant; if this is your decode hot loop, drop the "
            "tape/act-quant ctx so decode_fast engages.",
            stacklevel=2,
        )
        pk = (
            past_key_value.k.astype(jnp.float32)
            * past_key_value.k_scale[..., None]
        ).astype(k_states.dtype)
        pv = (
            past_key_value.v.astype(jnp.float32)
            * past_key_value.v_scale[..., None]
        ).astype(v_states.dtype)
        past_key_value = (pk, pv)
    if decode_fast:
        new_past = (k_states, v_states)
    elif past_key_value is not None:
        k_states = jnp.concatenate([past_key_value[0], k_states], axis=2)
        v_states = jnp.concatenate([past_key_value[1], v_states], axis=2)
        new_past = (k_states, v_states)
    else:
        new_past = (k_states, v_states)
    q_states = split_heads(q_states, n_heads)

    # Unpacked fallback: long sequences (> the packed kernel's VMEM budget,
    # e.g. T=2048) go through the online-softmax recurrence kernel
    # (probe11: 4.15-5x standalone at T>=4096); clip cannot fuse there.
    flash_ok = (
        use_flash
        and not decode_fast  # decode_fast skipped the KV concat: flash would
        # silently attend over only the current token's K/V, ignoring the cache
        and not tape.enabled
        and not q.act_sites_enabled
        and cfg.attn_softmax in ("vanilla", "softmax1")
        and cfg.alpha is None
        and cfg.attn_gate_type == "none"
        and (deterministic or cfg.attention_dropout == 0.0)
        # causal-aware dispatch: XLA's causal attention wins through T=512
        # (probe19 r4); the recurrence kernel's block-skip wins at long T
        # (probe11: 5.04x causal T=4096)
        and pallas_attention_worthwhile(
            q_states.shape[0], n_heads, q_states.shape[2], k_states.shape[2],
            causal=q_states.shape[2] > 1,
        )
    )
    if flash_ok:
        from outeffhop_tpu.ops.flash import flash_attention

        context = flash_attention(
            q_states,
            k_states,
            v_states,
            bias=padding_bias,
            softmax_n=1.0 if cfg.attn_softmax == "softmax1" else 0.0,
            scale=1.0,  # already folded into q
            causal=q_states.shape[2] > 1,
        )
    elif decode_fast:
        # NOTE a fused Pallas decode-attention kernel was built (round 4,
        # whole-slot blocks) and rebuilt (round 5, blocked flash-decode with
        # online-softmax scratch) and adjudicated AGAINST both times:
        # probe29 measured XLA's decode attention already AT the HBM
        # roofline (0.347 ms bf16 = 581 GB/s, 0.118 ms int8 = 857 GB/s for
        # one 32-slot x 2048-bucket layer) with the kernel 2-16x slower
        # standalone and losing e2e in every regime. The kernel was deleted
        # (git history: ops/decode_attention.py); the decode-step win came
        # from the engine's cache write-back scatter instead (probe30).
        kv_int8 = isinstance(past_key_value, Int8KV)
        past_k = (
            past_key_value.k.astype(q_states.dtype) if kv_int8 else past_key_value[0]
        )
        if q_states.shape[2] > 1:
            # multi-token window (speculative verification, q_len = W):
            # same separate-scores structure, 4-D layout (the sublane-squeeze
            # below is a singleton-q optimization)
            scores_past = jnp.einsum("bhqd,bhkd->bhqk", q_states, past_k)
            if kv_int8:
                scores_past = scores_past * past_key_value.k_scale[:, :, None, :]
            scores_fresh = jnp.einsum("bhqd,bhkd->bhqk", q_states, k_states)
            scores = jnp.concatenate([scores_past, scores_fresh], axis=-1)
            if attention_mask is not None:
                # combined causal+padding bias (B, 1, W, S+W) from opt_forward
                scores = scores + attention_mask
                scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)
            probs = cfg.softmax_fn()(scores.astype(jnp.float32), axis=-1).astype(
                v_states.dtype
            )
            s_len = past_k.shape[2]
            probs_past = probs[..., :s_len]
            if kv_int8:
                probs_past = probs_past * past_key_value.v_scale[
                    :, :, None, :
                ].astype(probs_past.dtype)
                past_v = past_key_value.v.astype(v_states.dtype)
            else:
                past_v = past_key_value[1]
            context = jnp.einsum(
                "bhqk,bhkd->bhqd", probs_past, past_v
            ) + jnp.einsum("bhqk,bhkd->bhqd", probs[..., s_len:], v_states)
            if cfg.attn_gate_type != "none":
                context = apply_gate(
                    context, params.get("gate"), acfg, hidden_states, tape
                )
            context = merge_heads(context)
            context = q.act("context", context)
            out = common.dense(params["out_proj"], context, q, "out_proj")
            return out, new_past
        # The whole chain runs with the singleton query dim SQUEEZED:
        # (B, H, 1, T) f32 score tensors tile as (1, T) last-two-dims and
        # Mosaic pads the sublane dim 8x — probe35 measured the in-model
        # decode layer at 0.68 ms vs 0.35 ms for the same math in (B*H, T)
        # layout (probe29 part A). (B, H, T) keeps T in the lane dim and H
        # in the sublane dim: no padding.
        q2 = q_states[:, :, 0, :]                       # (B, H, D)
        scores_past = jnp.einsum("bhd,bhkd->bhk", q2, past_k)
        if kv_int8:
            # exact dequant AFTER the matmul: per-key-token scales commute
            # with the contraction over D (Int8KV docstring). The int8→bf16
            # convert on the K operand fuses into the dot's operand stream —
            # the cache is read from HBM as int8 (half the decode traffic).
            scores_past = scores_past * past_key_value.k_scale
        score_cur = jnp.sum(
            q2 * k_states[:, :, 0, :], axis=-1, keepdims=True
        )  # (B, H, 1)
        scores = jnp.concatenate([scores_past, score_cur], axis=-1)
        if attention_mask is not None:
            scores = scores + attention_mask[:, :, 0, :]  # (B,1,K) over H
            scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)
        probs = cfg.softmax_fn()(scores.astype(jnp.float32), axis=-1).astype(
            v_states.dtype  # not scores.dtype: the f32 mask add must not
        )  # promote the context (and all downstream matmuls) to f32
        s_len = past_k.shape[2]
        probs_past = probs[..., :s_len]
        if kv_int8:
            # exact dequant BEFORE the matmul: per-value-token scales applied
            # to the (tiny) probs row, so V_int8 is read directly by the dot
            probs_past = probs_past * past_key_value.v_scale.astype(
                probs_past.dtype
            )
            past_v = past_key_value.v.astype(v_states.dtype)
        else:
            past_v = past_key_value[1]
        ctx2 = jnp.einsum(
            "bhk,bhkd->bhd", probs_past, past_v
        ) + probs[..., s_len:] * v_states[:, :, 0, :]  # (B,H,1) * (B,H,D)
        context = ctx2[:, :, None, :]
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q_states, k_states)
        scores = tape.record("attn_scores", scores)
        scores = q.act("attn_scores", scores)
        if attention_mask is not None:
            scores = scores + attention_mask
            scores = jnp.maximum(scores, jnp.finfo(scores.dtype).min)  # :225-228
        probs = cfg.softmax_fn()(scores.astype(jnp.float32), axis=-1).astype(
            v_states.dtype
        )
        probs = tape.record("attn_probs_before_dropout", probs)
        probs = q.act("attn_probs", probs)
        probs = common.dropout(probs, cfg.attention_dropout, dropout_rng, deterministic)
        probs = tape.record("attn_probs_after_dropout", probs)
        context = jnp.einsum("bhqk,bhkd->bhqd", probs, v_states)

    if cfg.attn_gate_type != "none":
        context = apply_gate(context, params.get("gate"), acfg, hidden_states, tape)

    context = merge_heads(context)
    context = q.act("context", context)
    out = common.dense(params["out_proj"], context, q, "out_proj")
    return out, new_past


def opt_decoder_layer(
    params,
    cfg: OPTConfig,
    x: Array,
    attention_mask: Optional[Array],
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    past_key_value=None,
    decode_fast: bool = False,
    padding_bias=None,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
):
    """Pre-/post-LN decoder layer with requantized residual sums
    (`QuantizedOPTDecoderLayer.forward`, quantized_opt.py:302-384)."""
    rngs = jax.random.split(dropout_rng, 3) if dropout_rng is not None else [None] * 3
    residual = x
    h = x
    if cfg.do_layer_norm_before:
        h = common.quant_layer_norm(params["self_attn_ln"], h, q, "self_attn_ln", cfg.layer_norm_eps)
    h, new_past = opt_attention(
        params["self_attn"], cfg, h, attention_mask,
        q=q.scoped("self_attn"), tape=tape.scoped("self_attn"),
        past_key_value=past_key_value, padding_bias=padding_bias,
        dropout_rng=rngs[0], deterministic=deterministic, use_flash=use_flash,
        decode_fast=decode_fast,
    )
    h = common.dropout(h, cfg.dropout, rngs[1], deterministic)
    h = residual + h
    h = q.act("self_attn_res", h)  # :345
    if not cfg.do_layer_norm_before:
        h = common.quant_layer_norm(params["self_attn_ln"], h, q, "self_attn_ln", cfg.layer_norm_eps)

    residual = h
    f = h
    if cfg.do_layer_norm_before:
        f = common.quant_layer_norm(params["final_ln"], f, q, "final_ln", cfg.layer_norm_eps)
    f = common.dense(params["fc1"], f, q, "fc1", activation=jax.nn.relu)  # folded ReLU :292-294
    f = common.dense(params["fc2"], f, q, "fc2")
    f = tape.record("fc2", f)
    f = common.dropout(f, cfg.dropout, rngs[2], deterministic)
    h = residual + f
    h = q.act("ffn_res", h)  # :369
    h = tape.record("ffn_res", h)
    if not cfg.do_layer_norm_before:
        h = common.quant_layer_norm(params["final_ln"], h, q, "final_ln", cfg.layer_norm_eps)
    return h, new_past


def opt_forward(
    params,
    cfg: OPTConfig,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    past_key_values=None,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    decode_fast: bool = False,
    remat: bool = False,
):
    """OPT decoder + LM head → (logits, new_past_key_values).

    `attention_mask` is the (B, S) 1/0 padding mask over the FULL sequence
    (past + current); the combined causal mask is built internally.
    """
    b, t = input_ids.shape
    past_len = past_key_values[0][0].shape[2] if past_key_values is not None else 0
    if attention_mask is None:
        attention_mask = jnp.ones((b, past_len + t), jnp.int32)

    x = common.embedding(params["embed_tokens"], input_ids, q, "embed_tokens")
    pos_ids = opt_positions(attention_mask, past_len)
    pos = common.embedding(params["embed_positions"], pos_ids, q, "embed_positions")
    if "project_in" in params:
        w = q.weight("project_in", params["project_in"]["weight"])
        x = x @ w.T
        x = q.act("project_in", x)
    h = x + pos
    h = q.act("embed_sum", h)  # quantized_opt.py:569

    combined_mask = causal_mask_bias(attention_mask, t, past_len)
    padding_bias = (
        (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * jnp.finfo(jnp.float32).min
    )
    new_past = []
    rngs = (
        jax.random.split(dropout_rng, cfg.num_hidden_layers)
        if dropout_rng is not None
        else [None] * cfg.num_hidden_layers
    )
    h = common.dropout(h, cfg.dropout, rngs[0], deterministic)
    # remat: per-layer jax.checkpoint (training memory/FLOPs trade). Only on
    # the no-cache path with the tape off: rematerialization would discard
    # tape side-channel records, and saving fresh KV as checkpoint outputs
    # defeats the memory saving — remat callers get new_past = [None]*L.
    use_remat = remat and past_key_values is None and not tape.enabled
    for i, lp in enumerate(params["layers"]):
        pkv = past_key_values[i] if past_key_values is not None else None

        def layer_call(lp_, h_, rr, i=i, pkv=pkv):
            return opt_decoder_layer(
                lp_, cfg, h_, combined_mask,
                q=q.scoped(f"layer{i}"), tape=tape.scoped(f"layer{i}"),
                past_key_value=pkv, padding_bias=padding_bias,
                dropout_rng=rr, deterministic=deterministic, use_flash=use_flash,
                decode_fast=decode_fast,
            )

        if use_remat:
            h = common.checkpoint_layer(
                lambda lp_, h_, rr, i=i: layer_call(lp_, h_, rr, i=i)[0], remat
            )(lp, h, rngs[i])
            np_i = None
        else:
            h, np_i = layer_call(lp, h, rngs[i])
        new_past.append(np_i)
    h = common.quant_layer_norm(params["final_ln"], h, q, "final_ln", cfg.layer_norm_eps)
    h = tape.record("final_ln", h)
    if "project_out" in params:
        w = q.weight("project_out", params["project_out"]["weight"])
        h = h @ w.T
        h = q.act("project_out", h)
    lm_w = params["head"]["lm"]["weight"]
    if lm_w is None:
        lm_w = params["embed_tokens"]["weight"]  # tied
    lm_w = q.weight("head.lm", lm_w)  # fp32_head policies skip this site
    logits = h @ lm_w.T
    logits = q.act("head.lm", logits)
    return logits, new_past


def clm_loss(logits: Array, labels: Array, ignore_index: int = -100) -> Array:
    """Shifted causal-LM cross entropy; exp(loss) is the reference perplexity
    (`validate_clm.py:588-594`; labels = input_ids, run_clm.py packing).
    logsumexp formulation — see models/bert.py:mlm_loss for the rationale."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != ignore_index
    safe = jnp.where(mask, shift_labels, 0)
    lse = jax.scipy.special.logsumexp(shift_logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        shift_logits, safe[..., None], axis=-1
    )[..., 0].astype(jnp.float32)
    nll = lse - picked
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def greedy_generate(
    params,
    cfg: OPTConfig,
    input_ids: Array,
    max_new_tokens: int,
    *,
    use_flash: bool = False,
) -> Array:
    """Static-shape greedy decoding with a preallocated KV cache (the serving
    path; the reference has no generation stack at all — this is new
    capability required by the north star)."""
    b, t0 = input_ids.shape
    total = t0 + max_new_tokens

    # prefill
    mask = jnp.ones((b, t0), jnp.int32)
    logits, past = opt_forward(params, cfg, input_ids, mask, use_flash=use_flash)
    next_tok = jnp.argmax(logits[:, -1], axis=-1)

    # preallocate cache to `total` and copy prefill
    n_layers = cfg.num_hidden_layers
    h, d = cfg.num_attention_heads, cfg.head_dim
    cache_k = jnp.zeros((n_layers, b, h, total, d), logits.dtype)
    cache_v = jnp.zeros((n_layers, b, h, total, d), logits.dtype)
    for i, (k_i, v_i) in enumerate(past):
        cache_k = cache_k.at[i, :, :, :t0].set(k_i.astype(logits.dtype))
        cache_v = cache_v.at[i, :, :, :t0].set(v_i.astype(logits.dtype))

    tokens = jnp.zeros((b, total), jnp.int32)
    tokens = tokens.at[:, :t0].set(input_ids)
    tokens = tokens.at[:, t0].set(next_tok)

    def step(carry, i):
        tokens, cache_k, cache_v = carry
        cur = jax.lax.dynamic_slice_in_dim(tokens, t0 + i, 1, axis=1)
        pos_len = t0 + i
        # single-token decode against the full preallocated cache: valid past
        # slots are [0, pos_len); the current token's K/V is appended at the
        # end, so its mask slot is always 1 (and its cumsum position id is
        # pos_len + POS_OFFSET, as required).
        past_valid = (jnp.arange(total)[None, :] < pos_len).astype(jnp.int32)
        attn_mask = jnp.concatenate(
            [jnp.broadcast_to(past_valid, (b, total)), jnp.ones((b, 1), jnp.int32)], axis=1
        )
        past_list = [(cache_k[l], cache_v[l]) for l in range(n_layers)]
        logits, new_past = opt_forward(
            params, cfg, cur, attn_mask, past_key_values=past_list, use_flash=False,
            decode_fast=True,
        )
        # new_past concatenated past+current has length total+1; instead write
        # the current k/v directly at position pos_len — ONE dynamic_update_
        # slice over the stacked (L, B, H, 1, D) block (the per-layer .at[l]
        # chain copied the whole pool per layer inside the scan, probe29/30)
        new_k = jnp.stack([k_i[:, :, -1:] for k_i, _ in new_past]).astype(cache_k.dtype)
        new_v = jnp.stack([v_i[:, :, -1:] for _, v_i in new_past]).astype(cache_v.dtype)
        cache_k = jax.lax.dynamic_update_slice(cache_k, new_k, (0, 0, 0, pos_len, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, new_v, (0, 0, 0, pos_len, 0))
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None].astype(jnp.int32), t0 + i + 1, axis=1
        )
        return (tokens, cache_k, cache_v), None

    if max_new_tokens > 1:
        (tokens, _, _), _ = jax.lax.scan(
            step, (tokens, cache_k, cache_v), jnp.arange(max_new_tokens - 1)
        )
    return tokens
