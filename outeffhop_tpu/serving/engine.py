"""Continuous-batching serving engine for the OPT CLM family.

New capability over the reference (which ships no generation or serving
stack; SURVEY.md §7 step 6): a slot-based engine in the vLLM style, built
for XLA's compilation model —

  * **static shapes everywhere**: a fixed pool of `max_slots` sequence slots,
    each with a preallocated KV cache of `max_seq`; admission, decode, and
    eviction never change tensor shapes, so exactly TWO programs are
    compiled (prefill, decode-step) and reused for the engine's lifetime;
  * **prefill**: a new request is written into a free slot — one forward over
    the padded prompt buffer fills that slot's KV cache and samples the
    first token. Other slots are untouched (their caches ride along);
  * **decode step**: ALL slots advance one token in a single batched forward
    against the slot-pool cache (per-slot lengths mask invalid positions);
    inactive slots compute masked garbage — the usual static-batching trade;
  * **continuous batching**: the host scheduler admits queued requests into
    slots the moment they free up (finished by EOS or length), keeping the
    batch dense without ever recompiling;
  * sampling: greedy, temperature, top-k, top-p (nucleus) — selected by
    jit-static config.

The decode hot loop is (slots, 1)-query attention against (slots, H,
max_seq, D) caches — an HBM-bandwidth-bound gather+matvec that XLA fuses
cleanly; the MXU path (prefill) reuses the same model code as training.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.models.opt import (
    Int8KV,
    OPTConfig,
    opt_forward,
    quantize_kv,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_slots: int = 4
    max_seq: int = 256
    max_prompt: int = 64
    eos_token_id: int = 2
    pad_token_id: int = 1
    temperature: float = 0.0  # 0 → greedy
    top_k: int = 0  # 0 → full distribution
    top_p: float = 1.0  # nucleus sampling; 1.0 → off (composes after top_k)
    # INT8 KV cache (models/opt.py:Int8KV): halves the decode step's cache
    # HBM traffic at the cost of per-token-per-head symmetric quantization of
    # K/V at write time. Regime-dependent, both directions MEASURED (round 4):
    #   * cache-bound (32 slots x bucket 2048, ~4.8 GB cache/step):
    #     **2.0x faster** — 40.3 -> 20.2 ms/step (probe22b); the int8->bf16
    #     convert fuses into the attention reads as designed.
    #   * weight-bound (8 slots x bucket 512, 250 MB weights vs ~50 MB
    #     cache): 2.7x SLOWER (probe22) — nothing for the halved cache
    #     traffic to pay for. Default off; enable for long-context /
    #     many-slot serving (also halves cache HBM footprint).
    # "auto" picks per the measured regimes: on when the full KV pool is
    # >= 4x the estimated weight bytes (safely inside probe22b's 19x
    # cache-bound win; probe22's 0.2x weight-bound loss stays off).
    kv_int8: bool | str = False
    # There is deliberately NO fused-Pallas-decode option: two kernel
    # generations (round-4 whole-slot blocks, round-5 blocked flash-decode)
    # both measured slower than XLA's decode attention, which probe29 showed
    # already runs at the HBM roofline (581 GB/s bf16 / 857 GB/s int8 cache
    # streaming). The decode-step win came from the single-scatter cache
    # write-back in _decode_body (probe30) instead.
    #
    # Prompt-lookup speculative decoding (greedy only): each step drafts
    # `spec_k` tokens by copying the continuation of the most recent earlier
    # occurrence of the slot's last bigram, verifies all of them in ONE
    # forward (q_len = spec_k+1 against the cache), and emits the accepted
    # prefix plus one model token — 1..spec_k+1 tokens per step. Outputs are
    # BIT-IDENTICAL to plain greedy decoding by construction (the emitted
    # tokens are the model's own argmaxes; speculation only changes how many
    # are confirmed per dispatch). Measured two-regime (probe49): +8-17% on
    # repetition-heavy workloads, −6..−11% on incompressible text. 0 = off.
    # Requires temperature == 0.
    spec_k: int = 0
    # Adaptive fallback: after `spec_min_steps` speculative steps, if the
    # average emitted tokens PER STEP PER LIVE SLOT is below this, the
    # scheduler stops speculating for the rest of the engine's life (reuses
    # the plain decode programs) — caps the incompressible-text downside at
    # a brief probe while keeping the full upside on structured text.
    # A plain step emits exactly 1.0/slot. This is a GUARDRAIL against
    # catastrophic workloads (acceptance ~0), not a fine-grained optimizer:
    # probe50d measured the verify step's cost ratio varying with live-slot
    # occupancy (rand read a 1.77/slot rate yet lost ~6% wall-clock; rep won
    # +8-17% at similar rates), so no universal rate threshold separates
    # single-digit-% cases — pick spec_k per workload and let this catch
    # only the clearly-degenerate ones. <= 1.0 disables the fallback.
    spec_min_rate: float = 1.25
    spec_min_steps: int = 8


@dataclasses.dataclass
class EngineState:
    """Device-resident slot pool (a pytree)."""

    cache_k: Array  # (L, slots, H, max_seq, D) — int8 when kv_int8
    cache_v: Array  # (L, slots, H, max_seq, D)
    tokens: Array  # (slots, max_seq) int32
    lengths: Array  # (slots,) int32 — tokens materialized so far
    active: Array  # (slots,) bool
    scale_k: Optional[Array] = None  # (L, slots, H, max_seq) f32 when kv_int8
    scale_v: Optional[Array] = None


jax.tree_util.register_dataclass(
    EngineState,
    data_fields=["cache_k", "cache_v", "tokens", "lengths", "active",
                 "scale_k", "scale_v"],
    meta_fields=[],
)


def resolve_kv_int8(setting, cfg: OPTConfig, ecfg: EngineConfig, dtype) -> bool:
    """'auto' → the measured-regime policy (probe22/22b, BASELINE.md): int8
    KV wins only when decode is cache-bound. Enable when the full KV slot
    pool is >= 4x the (analytically estimated) dense-weight bytes — probe22b's
    2.0x win sat at 19x, probe22's loss at 0.2x; 4x is safely inside the
    winning regime."""
    if isinstance(setting, bool):
        return setting
    if setting != "auto":
        raise ValueError(f"kv_int8 must be a bool or 'auto', got {setting!r}")
    L, S = cfg.num_hidden_layers, ecfg.max_slots
    H, D = cfg.num_attention_heads, cfg.head_dim
    itemsize = jnp.dtype(dtype).itemsize
    cache_bytes = 2 * L * S * H * ecfg.max_seq * D * itemsize
    dm, ffn = cfg.hidden_size, cfg.ffn_dim
    weight_bytes = (
        cfg.vocab_size * dm
        + cfg.max_position_embeddings * dm
        + L * (4 * dm * dm + 2 * dm * ffn)
    ) * itemsize
    return cache_bytes >= 4 * weight_bytes


def init_state(cfg: OPTConfig, ecfg: EngineConfig, dtype=jnp.float32) -> EngineState:
    if not isinstance(ecfg.kv_int8, bool):
        raise ValueError(
            "init_state needs a resolved EngineConfig; 'auto' is resolved by "
            "ServingEngine (resolve_kv_int8)"
        )
    L, S = cfg.num_hidden_layers, ecfg.max_slots
    H, D = cfg.num_attention_heads, cfg.head_dim
    kv_dtype = jnp.int8 if ecfg.kv_int8 else dtype

    def scale_pool():  # distinct buffers: donated states reject aliased args
        return (
            jnp.full((L, S, H, ecfg.max_seq), 1e-8, jnp.float32)
            if ecfg.kv_int8
            else None
        )

    return EngineState(
        cache_k=jnp.zeros((L, S, H, ecfg.max_seq, D), kv_dtype),
        cache_v=jnp.zeros((L, S, H, ecfg.max_seq, D), kv_dtype),
        tokens=jnp.full((S, ecfg.max_seq), ecfg.pad_token_id, jnp.int32),
        lengths=jnp.zeros((S,), jnp.int32),
        active=jnp.zeros((S,), bool),
        scale_k=scale_pool(),
        scale_v=scale_pool(),
    )


def _sample(
    logits: Array, rng: Array, temperature: float, top_k: int,
    top_p: float = 1.0,
) -> Array:
    """(B, V) → (B,) next tokens; temperature 0 is argmax (static branch).
    top_k keeps the k highest logits; top_p (nucleus) then keeps the
    smallest prefix of the probability-sorted distribution with cumulative
    mass ≥ top_p (the kept set always includes the most-likely token)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    if top_k > 0 or top_p < 1.0:
        # ONE descending sort serves both filters (decode hot path)
        srt = jnp.sort(scaled, axis=-1)[:, ::-1]
        if top_k > 0:
            kth = srt[:, top_k - 1][:, None]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
            srt = jnp.where(jnp.arange(srt.shape[-1]) < top_k, srt, -jnp.inf)
        if top_p < 1.0:
            # mass strictly BEFORE each position decides the cut, so the top
            # token (and any token straddling the boundary) stays;
            # max(n_keep, 1) keeps top_p=0 degenerate to argmax-only
            probs = jax.nn.softmax(srt, axis=-1)
            mass_before = jnp.cumsum(probs, axis=-1) - probs
            keep = mass_before < top_p  # (B, V) over sorted order, monotone
            n_keep = jnp.maximum(jnp.sum(keep, axis=-1), 1)
            cutoff = jnp.take_along_axis(srt, (n_keep - 1)[:, None], axis=-1)
            scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


def make_int8_weight_ctx(params, cfg: OPTConfig):
    """Freeze every dense weight of the model to Int8Dense (symmetric
    per-out-channel) and return a run-mode quant ctx that executes those
    matmuls as int8 x int8 -> int32 with dynamic per-tensor input
    quantization. Activation sites stay inert, so the flash/decode fast
    paths remain available (ctx.act_sites_enabled is False). Weight-only
    int8 halves the decode step's dominant HBM traffic (weight reads)."""
    from outeffhop_tpu.quant.calibrate import QuantCtx, ScopedQuantCtx, compute_weight_qparams
    from outeffhop_tpu.quant.config import QuantizedModelConfig
    from outeffhop_tpu.quant.int8_exec import build_int8_dense_map

    qcfg = QuantizedModelConfig(
        weight_method="symmetric_uniform",
        per_channel_weights=True,
        quantize_acts=False,
        quant_setup="fp32_head",  # LM head / embeddings stay float
    )
    # discovery is a trace (jax.eval_shape): site recording with zero device
    # execution — matters behind high-latency links where an eager dummy
    # forward pays a dispatch round trip per op
    dummy = jnp.zeros((1, 2), jnp.int32)
    ctx = QuantCtx.trace_discovery(
        qcfg, lambda b, q: opt_forward(params, cfg, b, q=q), dummy
    )
    wq = compute_weight_qparams(ctx.discovered_weights, qcfg)
    int8_map = build_int8_dense_map(ctx.discovered_weights, wq)
    # keep only sites executed through common.dense's int8_for dispatch;
    # project_in/project_out/head.lm are matmul'd directly via ctx.weight, so
    # their Int8Dense copies would just pin unused int8 weights in HBM
    # (embeddings are already excluded by their per_channel_axis=None)
    unused = {"project_in|w", "project_out|w", "head.lm|w"}
    int8_map = {k: v for k, v in int8_map.items() if k not in unused}
    return ScopedQuantCtx(QuantCtx.run(qcfg, {}, {}, int8_dense=int8_map), "")


# ---------------------------------------------------------------------------
# Compiled engine programs
# ---------------------------------------------------------------------------


def make_prefill(cfg: OPTConfig, ecfg: EngineConfig, qctx=None):
    """slot admission: run the padded prompt, fill the slot's cache, sample
    token #1. jit-static in everything but the arrays."""
    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    qctx = qctx if qctx is not None else NULL_QCTX

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(
        params, state: EngineState, slot: Array, prompt: Array, prompt_len: Array, rng
    ) -> EngineState:
        # state is donated: the slot-pool caches update in place instead of
        # being copied (O(L*slots*max_seq*D) HBM traffic per admission).
        P = ecfg.max_prompt
        mask = (jnp.arange(P)[None, :] < prompt_len).astype(jnp.int32)  # (1, P)
        logits, past = opt_forward(params, cfg, prompt[None, :], mask, q=qctx)
        last = logits[0, jnp.maximum(prompt_len - 1, 0)]
        first_tok = _sample(last[None, :], rng, ecfg.temperature, ecfg.top_k,
                            ecfg.top_p)[0]

        ck, cv = state.cache_k, state.cache_v
        sk, sv = state.scale_k, state.scale_v
        # write per-layer prompt K/V into this slot's cache rows
        new_k = jnp.stack([k[0] for k, _ in past])  # (L, H, P, D)
        new_v = jnp.stack([v[0] for _, v in past])
        if ecfg.kv_int8:
            q8 = quantize_kv(new_k, new_v)  # leading L acts as batch
            new_k, new_v = q8.k, q8.v
            sk = jax.lax.dynamic_update_slice(sk, q8.k_scale[:, None], (0, slot, 0, 0))
            sv = jax.lax.dynamic_update_slice(sv, q8.v_scale[:, None], (0, slot, 0, 0))
        else:
            new_k = new_k.astype(ck.dtype)
            new_v = new_v.astype(cv.dtype)
        ck = jax.lax.dynamic_update_slice(
            ck, new_k[:, None], (0, slot, 0, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, new_v[:, None], (0, slot, 0, 0, 0)
        )

        row = jnp.full((ecfg.max_seq,), ecfg.pad_token_id, jnp.int32)
        row = jax.lax.dynamic_update_slice(row, prompt, (0,))
        row = row.at[prompt_len].set(first_tok)
        tokens = jax.lax.dynamic_update_slice(state.tokens, row[None], (slot, 0))
        lengths = state.lengths.at[slot].set(prompt_len + 1)
        active = state.active.at[slot].set(
            (first_tok != ecfg.eos_token_id) & (prompt_len + 1 < ecfg.max_seq)
        )
        return EngineState(ck, cv, tokens, lengths, active, sk, sv)

    return prefill


def _decode_body(cfg: OPTConfig, ecfg: EngineConfig, params, state: EngineState, rng,
                 qctx=None, bucket: Optional[int] = None):
    """One decode step for every slot (pure; shared by the single-step and
    scanned multi-step programs).

    `bucket` (static) restricts attention to the first `bucket` cache
    positions. Decode is KV-cache-bandwidth-bound (measured: int8 weights
    don't move the step time at slots=8/seq=512), so reading only the live
    prefix of the cache — a static slice chosen by the host from the actual
    lengths — is the big lever: bucket 128 reads 1/4 the cache of 512."""
    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    qctx = qctx if qctx is not None else NULL_QCTX
    S = ecfg.max_slots
    L = cfg.num_hidden_layers
    B = bucket or ecfg.max_seq
    len_km1 = jnp.maximum(state.lengths - 1, 0)  # current token position
    cur = jnp.take_along_axis(state.tokens, len_km1[:, None], axis=1)  # (S, 1)

    # cache positions [0, len-1) are valid past; the fresh K/V of the
    # current token arrives concatenated at the end (slot bucket).
    past_valid = (
        jnp.arange(B)[None, :] < len_km1[:, None]
    ).astype(jnp.int32)
    attn_mask = jnp.concatenate([past_valid, jnp.ones((S, 1), jnp.int32)], axis=1)

    if ecfg.kv_int8:
        past_list = [
            Int8KV(
                state.cache_k[l, :, :, :B], state.cache_v[l, :, :, :B],
                state.scale_k[l, :, :, :B], state.scale_v[l, :, :, :B],
            )
            for l in range(L)
        ]
    else:
        past_list = [
            (state.cache_k[l, :, :, :B], state.cache_v[l, :, :, :B]) for l in range(L)
        ]
    logits, new_past = opt_forward(
        params, cfg, cur, attn_mask, past_key_values=past_list, decode_fast=True,
        q=qctx,
    )

    ck, cv = state.cache_k, state.cache_v
    sk, sv = state.scale_k, state.scale_v
    # ONE scatter per cache array: stack every layer's current-token K/V
    # into (L, S, H, D) and write all L*S rows in a single
    # scatter-into-donated-buffer. The round-4 per-layer .at[l].set chain
    # defeated XLA's in-place update analysis inside the scanned decode
    # body — each of its 12 iterations copied the whole (L, S, H, T, D)
    # pool, which probe29/30 measured as ~37 ms of the 42 ms big-cache
    # step vs 0.10 ms for this scatter (bit-identical generations).
    new_k = jnp.stack([k[:, :, -1, :] for k, _ in new_past])  # (L,S,H,D)
    new_v = jnp.stack([v[:, :, -1, :] for _, v in new_past])
    ladv = jnp.arange(L)[:, None]
    sadv = jnp.arange(S)[None, :]
    if ecfg.kv_int8:
        q8 = quantize_kv(new_k[:, :, :, None, :], new_v[:, :, :, None, :])
        new_k, new_v = q8.k[..., 0, :], q8.v[..., 0, :]
        sk = sk.at[ladv, sadv, :, len_km1[None, :]].set(q8.k_scale[..., 0])
        sv = sv.at[ladv, sadv, :, len_km1[None, :]].set(q8.v_scale[..., 0])
    else:
        new_k = new_k.astype(ck.dtype)
        new_v = new_v.astype(cv.dtype)
    ck = ck.at[ladv, sadv, :, len_km1[None, :], :].set(new_k)
    cv = cv.at[ladv, sadv, :, len_km1[None, :], :].set(new_v)

    nxt = _sample(logits[:, -1], rng, ecfg.temperature, ecfg.top_k, ecfg.top_p)
    nxt = jnp.where(state.active, nxt, ecfg.pad_token_id)
    tokens = jax.vmap(
        lambda row, tok, pos: jax.lax.dynamic_update_slice(row, tok[None], (pos,))
    )(state.tokens, nxt, state.lengths)
    # inactive slots must be untouched: for a slot capped at max_seq the
    # dynamic_update_slice above clamps its start index to max_seq-1 and
    # would overwrite the slot's final generated token with pad
    tokens = jnp.where(state.active[:, None], tokens, state.tokens)
    lengths = state.lengths + state.active.astype(jnp.int32)
    active = (
        state.active
        & (nxt != ecfg.eos_token_id)
        & (lengths < ecfg.max_seq)
    )
    return EngineState(ck, cv, tokens, lengths, active, sk, sv)


def make_decode_step(cfg: OPTConfig, ecfg: EngineConfig, qctx=None):
    """One token for every slot, batched; inactive slots are masked out.
    The state is donated: per-token cache writes are in-place (without
    donation XLA copies the whole KV pool every step)."""

    @partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, state: EngineState, rng) -> EngineState:
        return _decode_body(cfg, ecfg, params, state, rng, qctx)

    return decode_step


def _spec_decode_body(cfg: OPTConfig, ecfg: EngineConfig, params,
                      state: EngineState, qctx=None,
                      bucket: Optional[int] = None):
    """One prompt-lookup speculative decode step for every slot (greedy).

    Draft: the continuation of the most recent PRIOR occurrence of the
    slot's current bigram (tokens[len-2:len]) — the classic prompt-lookup /
    n-gram speculation, no draft model needed. Verify: one forward of
    [cur, d_0..d_{K-1}] (q_len = K+1) against the cache; the model's greedy
    outputs o_0..o_K confirm a prefix of the draft (d_i == o_i) and the step
    emits o_0..o_m where m = accepted count — identical tokens to m+1 plain
    greedy steps, in one dispatch. Fresh K/V for all K+1 positions are
    scattered into the cache; rows past the accepted length sit beyond the
    valid-past mask and are overwritten by later steps before ever becoming
    visible.

    The CALLER guarantees headroom: max slot length + K + 1 <= max_seq
    (ServingEngine.step falls back to plain decode otherwise), so no write
    here can clamp.
    """
    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    qctx = qctx if qctx is not None else NULL_QCTX
    S, K = ecfg.max_slots, ecfg.spec_k
    L = cfg.num_hidden_layers
    B = bucket or ecfg.max_seq
    t = state.tokens
    len_km1 = jnp.maximum(state.lengths - 1, 0)        # position of `cur`

    # ---- draft: most recent prior occurrence of the last bigram ----------
    cur = jnp.take_along_axis(t, len_km1[:, None], axis=1)          # (S, 1)
    prev = jnp.take_along_axis(
        t, jnp.maximum(len_km1 - 1, 0)[:, None], axis=1
    )                                                                # (S, 1)
    pos = jnp.arange(ecfg.max_seq)[None, :]
    nxt_tok = jnp.roll(t, -1, axis=1)                                # t[:, j+1]
    match = (
        (t == prev)
        & (nxt_tok == cur)
        & (pos + 1 < len_km1[:, None])   # strictly before the current bigram
        & (len_km1[:, None] >= 2)
    )
    # largest matching j per slot (0 when none — harmless, draft rejects)
    rev_arg = jnp.argmax(match[:, ::-1], axis=1)
    j = (ecfg.max_seq - 1) - rev_arg
    has = jnp.any(match, axis=1)
    draft_start = jnp.where(has, j + 2, 0)
    didx = draft_start[:, None] + jnp.arange(K)[None, :]             # (S, K)
    draft = jnp.take_along_axis(t, didx, axis=1, mode="clip")        # (S, K)

    # ---- verify: one q_len = K+1 forward against the cache ---------------
    past_valid = (pos[:, :B] < len_km1[:, None]).astype(jnp.int32)   # (S, B)
    attn_mask = jnp.concatenate(
        [past_valid, jnp.ones((S, K + 1), jnp.int32)], axis=1
    )
    inp = jnp.concatenate([cur, draft], axis=1)                      # (S, K+1)
    if ecfg.kv_int8:
        past_list = [
            Int8KV(
                state.cache_k[l, :, :, :B], state.cache_v[l, :, :, :B],
                state.scale_k[l, :, :, :B], state.scale_v[l, :, :, :B],
            )
            for l in range(L)
        ]
    else:
        past_list = [
            (state.cache_k[l, :, :, :B], state.cache_v[l, :, :, :B])
            for l in range(L)
        ]
    logits, new_past = opt_forward(
        params, cfg, inp, attn_mask, past_key_values=past_list, q=qctx,
        decode_fast=True,  # multi-token window: scores concat, not KV concat
    )                                                      # (S, K+1, V)
    outs = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # greedy o_0..o_K

    # ---- acceptance: longest prefix with d_i == o_i, stop at first EOS ---
    acc = jnp.cumprod((draft == outs[:, :-1]).astype(jnp.int32), axis=1)
    m = jnp.sum(acc, axis=1)                               # (S,) in [0, K]
    emit0 = jnp.arange(K + 1)[None, :] <= m[:, None]       # o_0..o_m
    is_eos = (outs == ecfg.eos_token_id) & emit0
    eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos
    emit = emit0 & (eos_before == 0)                       # incl. first EOS
    # cap at max_seq (defensive; caller guarantees headroom)
    emit = emit & ((state.lengths[:, None] + jnp.arange(K + 1)[None, :])
                   < ecfg.max_seq)
    emit = emit & state.active[:, None]
    n_emit = jnp.sum(emit.astype(jnp.int32), axis=1)       # (S,)

    # ---- cache write-back: K+1 fresh rows per slot at len-1 .. len+K-1 ---
    ck, cv = state.cache_k, state.cache_v
    sk, sv = state.scale_k, state.scale_v
    new_k = jnp.stack([k[:, :, -(K + 1):, :] for k, _ in new_past])  # (L,S,H,K+1,D)
    new_v = jnp.stack([v[:, :, -(K + 1):, :] for _, v in new_past])
    ladv = jnp.arange(L)[:, None, None]
    sadv = jnp.arange(S)[None, :, None]
    posw = (len_km1[:, None] + jnp.arange(K + 1)[None, :])[None]     # (1,S,K+1)
    if ecfg.kv_int8:
        q8 = quantize_kv(new_k, new_v)                     # per-token scales
        new_k, new_v = q8.k, q8.v
        sk = sk.at[ladv, sadv, :, posw].set(
            jnp.moveaxis(q8.k_scale, 3, 2)                 # (L,S,K+1,H)
        )
        sv = sv.at[ladv, sadv, :, posw].set(jnp.moveaxis(q8.v_scale, 3, 2))
    else:
        new_k = new_k.astype(ck.dtype)
        new_v = new_v.astype(cv.dtype)
    # advanced indices at axes (0,1,3) with a slice between → indexed axes
    # move to the front: values must be (L, S, K+1, H, D)
    ck = ck.at[ladv, sadv, :, posw, :].set(jnp.moveaxis(new_k, 3, 2))
    cv = cv.at[ladv, sadv, :, posw, :].set(jnp.moveaxis(new_v, 3, 2))

    # ---- tokens / lengths / active ---------------------------------------
    upd = jnp.where(emit, outs, ecfg.pad_token_id)         # (S, K+1)
    tokens = jax.vmap(
        lambda row, u, p: jax.lax.dynamic_update_slice(row, u, (p,))
    )(t, upd, state.lengths)
    written = state.active & (n_emit > 0)
    tokens = jnp.where(written[:, None], tokens, t)
    lengths = state.lengths + n_emit
    active = (
        state.active
        & ~jnp.any(is_eos & emit, axis=1)
        & (lengths < ecfg.max_seq)
    )
    return EngineState(ck, cv, tokens, lengths, active, sk, sv)


def make_spec_decode_n(cfg: OPTConfig, ecfg: EngineConfig, n: int, qctx=None,
                       bucket: Optional[int] = None):
    """N speculative steps in one dispatch (each emits 1..spec_k+1 tokens)."""

    @partial(jax.jit, donate_argnums=(1,))
    def spec_decode_n(params, state: EngineState, rng) -> EngineState:
        del rng  # greedy only

        def body(s, _):
            return _spec_decode_body(cfg, ecfg, params, s, qctx, bucket), None

        out, _ = jax.lax.scan(body, state, None, length=n)
        return out

    return spec_decode_n


def make_decode_n(cfg: OPTConfig, ecfg: EngineConfig, n: int, qctx=None,
                  bucket: Optional[int] = None):
    """N decode steps in ONE dispatch (lax.scan). Through a remote-TPU tunnel
    (or any high-dispatch-latency link) per-step host round-trips dominate
    single-token decode; scanning N steps amortizes dispatch + the host's
    eviction reads across N tokens. EOS semantics are preserved — `active`
    updates inside the scan, so finished slots stop producing mid-chunk."""

    @partial(jax.jit, donate_argnums=(1,))
    def decode_n(params, state: EngineState, rng) -> EngineState:
        def body(s, i):
            return _decode_body(
                cfg, ecfg, params, s, jax.random.fold_in(rng, i), qctx, bucket
            ), None

        out, _ = jax.lax.scan(body, state, jnp.arange(n))
        return out

    return decode_n


# ---------------------------------------------------------------------------
# Host scheduler
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: np.ndarray
    max_new_tokens: int
    slot: Optional[int] = None
    prompt_len: int = 0
    admitted_at: int = 0


class ServingEngine:
    """Continuous-batching scheduler over the compiled prefill/decode programs.

    submit() enqueues; step() admits into free slots and advances every
    active slot one token; results() drains finished generations.
    """

    def __init__(self, params, cfg: OPTConfig, ecfg: EngineConfig, dtype=jnp.float32,
                 int8_weights: bool = False, mesh=None):
        """`mesh`: optional `jax.sharding.Mesh` — serve sharded.

        * `model` axis (> 1): tensor-parallel. Params shard Megatron-style
          (parallel/mesh.py rules), the KV slot pool shards head-parallel
          (heads are column-parallel with q/k/v, so each device attends over
          its own heads and the out-proj all-reduce is the block's single
          collective).
        * `data` axis (> 1, dividing max_slots): data-parallel continuous
          batching — the SLOT dimension of the pool (caches, tokens,
          lengths, active flags, int8 scale pools) shards over `data`; each
          device group decodes its own slots with replicated weights and no
          per-token collectives (decode is slot-parallel). This is the
          "continuous batching across hosts" north star: one engine, one
          scheduler, a pod-wide slot pool.

        The prefill/decode programs are UNCHANGED either way — XLA propagates
        the operand shardings and inserts the collectives (same approach as
        parallel/train.py). dp x tp composes (e.g. 4x2 over 8 devices)."""
        if not isinstance(ecfg.kv_int8, bool):
            ecfg = dataclasses.replace(
                ecfg, kv_int8=resolve_kv_int8(ecfg.kv_int8, cfg, ecfg, dtype)
            )
        if ecfg.spec_k:
            if ecfg.temperature != 0.0:
                raise ValueError(
                    "spec_k (prompt-lookup speculative decoding) requires "
                    "greedy decoding (temperature == 0): acceptance compares "
                    "the model's argmaxes against the draft"
                )
            if ecfg.spec_k + 1 >= ecfg.max_seq:
                raise ValueError("spec_k + 1 must be < max_seq")
        self.cfg = cfg
        self.ecfg = ecfg
        self.mesh = mesh
        state = init_state(cfg, ecfg, dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from outeffhop_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
            shape = dict(mesh.shape)
            n_model = shape.get("model", 1)
            n_data = shape.get("data", 1)
            head_axis = (
                "model"
                if n_model > 1 and cfg.num_attention_heads % n_model == 0
                else None
            )
            slot_axis = (
                "data" if n_data > 1 and ecfg.max_slots % n_data == 0 else None
            )
            cache_spec = P(None, slot_axis, head_axis, None, None)
            scale_spec = P(None, slot_axis, head_axis, None)

            def place(x, spec):
                return (
                    jax.device_put(x, NamedSharding(mesh, spec))
                    if x is not None
                    else None
                )

            state = EngineState(
                cache_k=place(state.cache_k, cache_spec),
                cache_v=place(state.cache_v, cache_spec),
                tokens=place(state.tokens, P(slot_axis)),
                lengths=place(state.lengths, P(slot_axis)),
                active=place(state.active, P(slot_axis)),
                scale_k=place(state.scale_k, scale_spec),
                scale_v=place(state.scale_v, scale_spec),
            )
        self.params = params
        self.state = state
        self._qctx = make_int8_weight_ctx(params, cfg) if int8_weights else None
        self._prefill = make_prefill(cfg, ecfg, self._qctx)
        # all decoding (incl. chunk=1) dispatches through the (chunk, bucket)
        # program cache below; make_decode_step stays available for direct use
        self._decode_n: Dict[int, Callable] = {}  # (chunk, bucket) → program
        self._queue: List[_Request] = []
        self._slots: List[Optional[_Request]] = [None] * ecfg.max_slots
        self._done: Dict[int, np.ndarray] = {}
        self._next_rid = 0
        self._step_count = 0
        self._rng = jax.random.PRNGKey(0)
        self.tokens_generated = 0
        self._max_len = 0  # host-side upper bound on max slot length
        # adaptive speculation state (spec_min_rate fallback)
        self._spec_enabled = bool(ecfg.spec_k)
        self._spec_steps = 0
        self._spec_slotsteps = 0  # steps x live slots (per-slot normalizer)
        self._spec_tokens = 0
        self._live_produced = 0
        self._overshoot = 0

    def submit(self, prompt_ids, max_new_tokens: int = 32) -> int:
        prompt = np.asarray(prompt_ids, np.int32)
        if len(prompt) > self.ecfg.max_prompt:
            raise ValueError(
                f"prompt len {len(prompt)} > engine max_prompt {self.ecfg.max_prompt}"
            )
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(_Request(rid, prompt, max_new_tokens))
        return rid

    def _admit(self) -> int:
        admitted = 0
        for slot in range(self.ecfg.max_slots):
            if self._slots[slot] is not None or not self._queue:
                continue
            admitted += 1
            req = self._queue.pop(0)
            padded = np.full(self.ecfg.max_prompt, self.ecfg.pad_token_id, np.int32)
            padded[: len(req.prompt)] = req.prompt
            self._rng, k = jax.random.split(self._rng)
            self.state = self._prefill(
                self.params,
                self.state,
                jnp.int32(slot),
                jnp.asarray(padded),
                jnp.int32(len(req.prompt)),
                k,
            )
            req.slot = slot
            req.prompt_len = len(req.prompt)
            req.admitted_at = self._step_count
            self._slots[slot] = req
            self._max_len = max(self._max_len, req.prompt_len + 1)
        return admitted

    def _evict_finished(self):
        # one host round-trip for both control arrays (matters on
        # high-latency links; tokens fetched only if something finished)
        lengths, active = jax.device_get((self.state.lengths, self.state.active))
        occupied = [r.slot for r in self._slots if r is not None]
        self._max_len = int(max((lengths[sl] for sl in occupied), default=0))
        self._live_produced = sum(
            max(int(lengths[r.slot]) - r.prompt_len, 0)
            for r in self._slots if r is not None
        )
        tokens = None
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            produced = int(lengths[slot]) - req.prompt_len
            if (not active[slot]) or produced >= req.max_new_tokens:
                if tokens is None:
                    tokens = np.asarray(self.state.tokens)
                # clamp to the request budget: a multi-token chunk may have
                # overshot max_new_tokens (extra tokens are discarded)
                want = req.prompt_len + req.max_new_tokens
                end = min(int(lengths[slot]), want)
                self._done[req.rid] = tokens[slot, :end].copy()
                self.tokens_generated += end - req.prompt_len
                # overshoot discarded by the budget clamp still counts as
                # EMITTED for the adaptive-speculation rate (otherwise
                # short-request workloads underestimate acceptance and
                # disable a winning speculation)
                self._overshoot += max(int(lengths[slot]) - want, 0)
                self._slots[slot] = None
                self.state = dataclasses.replace(
                    self.state, active=self.state.active.at[slot].set(False)
                )

    def _pick_bucket(self, growth: int) -> int:
        """Smallest cache-prefix bucket covering every slot through the end
        of this chunk (`growth` = worst-case length growth: chunk tokens for
        plain decode, chunk*(spec_k+1) for speculative). Decode reads only
        cache[:, :, :bucket] — the dominant HBM traffic — so short sequences
        decode proportionally faster; one program is compiled per
        (chunk, bucket) and reused. Power-of-two up to 256, then multiples
        of 128: probe52 showed the decode/verify programs cost ~proportional
        to the bucket, so pow2 rounding above 256 wasted up to ~2x cache
        traffic (e.g. need 321 -> 512); 128-granularity caps the waste at
        ~1.5x for at most max_seq/128 extra compiled variants."""
        need = min(self.ecfg.max_seq, self._max_len + growth + 1)
        if need <= 256:
            bucket = 64
            while bucket < need:
                bucket *= 2
        else:
            bucket = -(-need // 128) * 128
        return min(bucket, self.ecfg.max_seq)

    def step(self, decode_chunk: int = 1):
        """Admit → decode `decode_chunk` steps for all slots in one dispatch
        → evict finished. chunk > 1 amortizes dispatch latency (critical on
        high-latency links); EOS still stops a slot mid-chunk on-device.

        With `spec_k` set, each step emits 1..spec_k+1 tokens (prompt-lookup
        speculation); the engine falls back to plain decode near max_seq
        where the K+1-token write window would not fit, and PERMANENTLY once
        the measured emitted-per-step rate stays under `spec_min_rate` after
        `spec_min_steps` speculative steps (adaptive fallback — caps the
        incompressible-text downside at a brief probe)."""
        n_admitted = self._admit()
        if any(self._slots):
            self._rng, k = jax.random.split(self._rng)
            chunk = max(decode_chunk, 1)
            K = self.ecfg.spec_k
            spec_growth = chunk * (K + 1)
            use_spec = self._spec_enabled and (
                self._max_len + spec_growth + 1 <= self.ecfg.max_seq
            )
            before_emitted = (
                self.tokens_generated + self._live_produced
                + self._overshoot + n_admitted
            )
            if use_spec:
                bucket = self._pick_bucket(spec_growth)
                key = ("spec", chunk, bucket)
                fn = self._decode_n.get(key)
                if fn is None:
                    fn = make_spec_decode_n(
                        self.cfg, self.ecfg, chunk, self._qctx, bucket
                    )
                    self._decode_n[key] = fn
                self.state = fn(self.params, self.state, k)
                self._step_count += chunk
                self._max_len += spec_growth
                self._spec_steps += chunk
                n_live = sum(r is not None for r in self._slots)
                self._spec_slotsteps += chunk * n_live
            else:
                bucket = self._pick_bucket(chunk)
                key = (chunk, bucket)
                fn = self._decode_n.get(key)
                if fn is None:
                    fn = make_decode_n(
                        self.cfg, self.ecfg, chunk, self._qctx, bucket
                    )
                    self._decode_n[key] = fn
                self.state = fn(self.params, self.state, k)
                self._step_count += chunk
                self._max_len += chunk
            spec_dispatched = use_spec
        else:
            spec_dispatched = False
        self._evict_finished()
        if spec_dispatched:
            self._spec_tokens += (
                self.tokens_generated + self._live_produced
                + self._overshoot - before_emitted
            )
            if (
                self.ecfg.spec_min_rate > 1.0
                and self._spec_steps >= self.ecfg.spec_min_steps
                and self._spec_tokens / max(self._spec_slotsteps, 1)
                < self.ecfg.spec_min_rate
            ):
                self._spec_enabled = False

    @property
    def busy(self) -> bool:
        return bool(self._queue) or any(r is not None for r in self._slots)

    def run(self, max_steps: int = 100_000, decode_chunk: int = 1) -> Dict[int, np.ndarray]:
        steps = 0
        while self.busy and steps < max_steps:
            # don't overshoot: cap the chunk by the largest remaining budget
            chunk = decode_chunk
            live = [r for r in self._slots if r is not None]
            if live and decode_chunk > 1:
                chunk = min(decode_chunk, max(r.max_new_tokens for r in live))
            self.step(decode_chunk=chunk)
            steps += 1
        return self.results()

    def results(self) -> Dict[int, np.ndarray]:
        out, self._done = self._done, {}
        return out

    def stats(self) -> Dict[str, float]:
        """Host-side serving metrics (observability surface): cumulative
        tokens, device steps, queue/slot occupancy, and the speculative-
        decoding acceptance state."""
        return {
            "tokens_generated": self.tokens_generated,
            "device_steps": self._step_count,
            "queued": len(self._queue),
            "slots_live": sum(r is not None for r in self._slots),
            "slots_total": self.ecfg.max_slots,
            "spec_enabled": bool(self._spec_enabled),
            "spec_steps": self._spec_steps,
            "spec_rate_per_slot": (
                self._spec_tokens / self._spec_slotsteps
                if self._spec_slotsteps
                else 0.0
            ),
        }
