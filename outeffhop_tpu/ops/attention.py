"""Multi-head attention with the OutEffHop "extras": pluggable softmax
variant, output gating, relative positions, KV cache, and skip-attention.

Capability parity with `BertSelfAttentionWithExtras`
(`transformers_language/models/bert_attention.py:28-343`) and its quantized
twin (`quantized_bert.py:221-440`), designed TPU-first:

  * per-head gate predictors are a single stacked einsum (vmapped), not a
    Python loop over heads (the reference loops, `bert_attention.py:313-324`)
  * the (scores → softmax-variant → PV) core routes to the fused Pallas
    flash-softmax₁ kernel when telemetry probes and score/prob quant sites are
    off (see `ops/flash.py`); otherwise it runs the explicit XLA path whose
    intermediate tensors feed the probe tape and the PTQ quantizers.

Quantization sites (matching `quantized_bert.py:363,374,434`): "attn_scores"
(pre-mask), "attn_probs" (post-softmax), "context" (after head merge); q/k/v
dense sites come from `common.dense`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.ops.softmax_variants import alpha_clipped_softmax, resolve_softmax
from outeffhop_tpu.ops.telemetry import NULL_TAPE, ScopedTape
from outeffhop_tpu.quant.calibrate import NULL_QCTX, ScopedQuantCtx

Array = jax.Array

GATE_TYPES = ("none", "unconditional_per_head", "conditional_per_head", "conditional_per_token")


@dataclasses.dataclass(frozen=True)
class AttentionExtrasConfig:
    """Static attention configuration (the constructor surface of
    `BertSelfAttentionWithExtras.__init__`, bert_attention.py:29-162)."""

    hidden_size: int
    num_heads: int
    softmax: str | Callable = "vanilla"
    alpha: Optional[float] = None  # α-mode: clipped softmax, γ=-α/max_seq_length
    max_seq_length: Optional[int] = None
    skip_attn: bool = False
    gate_type: str = "none"
    gate_init: Optional[float] = None
    gate_mlp: bool = False
    gate_mlp2: bool = False
    gate_linear_all_features: bool = False
    fine_tuning: bool = False
    position_embedding_type: str = "absolute"
    max_position_embeddings: int = 512
    dropout_rate: float = 0.0

    def __post_init__(self):
        if self.gate_type not in GATE_TYPES:
            raise ValueError(f"gate_type must be one of {GATE_TYPES}")
        if self.alpha is not None and self.max_seq_length is None:
            raise ValueError("alpha mode requires max_seq_length")

    @property
    def head_size(self) -> int:
        assert self.hidden_size % self.num_heads == 0
        return self.hidden_size // self.num_heads

    @property
    def gate_scaling_factor(self) -> float:
        # 1/attn_gate_init when fine-tuning (bert_attention.py:114-117)
        if self.fine_tuning and self.gate_init is not None:
            return 1.0 / self.gate_init
        return 1.0

    def softmax_fn(self) -> Callable:
        if self.alpha is not None:
            return alpha_clipped_softmax(self.alpha, self.max_seq_length)
        return resolve_softmax(self.softmax)


def _logit(p: float, eps: float = 1e-16) -> float:
    p = min(max(p, eps), 1 - eps)
    return -math.log(1.0 / p - 1.0)


def attention_extras_params(key, cfg: AttentionExtrasConfig, rng_std: float = 0.02):
    """Init the q/k/v projections + gate parameters (stacked per head)."""
    keys = jax.random.split(key, 8)
    h, d_head, n_heads = cfg.hidden_size, cfg.head_size, cfg.num_heads
    params = {
        "query": common.dense_params(keys[0], h, h, rng_std),
        "key": common.dense_params(keys[1], h, h, rng_std),
        "value": common.dense_params(keys[2], h, h, rng_std),
    }
    if cfg.position_embedding_type in ("relative_key", "relative_key_query"):
        params["distance_embedding"] = common.embedding_params(
            keys[3], 2 * cfg.max_position_embeddings - 1, d_head, rng_std
        )
    if cfg.gate_type == "unconditional_per_head":
        params["gate"] = {"alpha": jnp.zeros((n_heads,), jnp.float32)}
    elif cfg.gate_type in ("conditional_per_head", "conditional_per_token"):
        if cfg.gate_linear_all_features:
            params["gate"] = common.dense_params(keys[4], h, n_heads, rng_std)
        elif cfg.gate_mlp:
            hid = d_head // 4
            params["gate"] = {
                "w1": jax.random.normal(keys[4], (n_heads, d_head, hid)) * rng_std,
                "b1": jnp.zeros((n_heads, hid)),
                "w2": jax.random.normal(keys[5], (n_heads, hid, 1)) * rng_std,
                "b2": jnp.zeros((n_heads, 1)),
            }
        elif cfg.gate_mlp2:
            params["gate"] = {
                "w1": jax.random.normal(keys[4], (n_heads, d_head, d_head)) * rng_std,
                "b1": jnp.zeros((n_heads, d_head)),
                "w2": jax.random.normal(keys[5], (n_heads, d_head, 1)) * rng_std,
                "b2": jnp.zeros((n_heads, 1)),
            }
        else:
            std = 0.01 if cfg.fine_tuning else rng_std  # bert_attention.py:154-156
            bias_init = _logit(cfg.gate_init) if cfg.gate_init is not None else 0.0
            params["gate"] = {
                "w": jax.random.normal(keys[4], (n_heads, d_head, 1)) * std,
                "b": jnp.full((n_heads, 1), bias_init, jnp.float32),
            }
    return params


def split_heads(x: Array, num_heads: int) -> Array:
    """(B, T, H*d) → (B, H, T, d)"""
    b, t, _ = x.shape
    return x.reshape(b, t, num_heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x: Array) -> Array:
    """(B, H, T, d) → (B, T, H*d)"""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def compute_gate(
    gate_params,
    cfg: AttentionExtrasConfig,
    hidden_states: Array,
) -> Array:
    """Gate probabilities, shape broadcastable to (B, H, T, d_head).

    Vectorized over heads (einsum over the stacked per-head predictors)
    instead of the reference's per-head Python loop (bert_attention.py:313-324).
    """
    if cfg.gate_type == "unconditional_per_head":
        return jax.nn.sigmoid(gate_params["alpha"]).reshape(-1, 1, 1)  # (H,1,1)

    if cfg.gate_linear_all_features:
        alpha = hidden_states @ gate_params["weight"].T + gate_params["bias"]  # (B,T,H)
        gate = jax.nn.sigmoid(alpha)
        return gate.transpose(0, 2, 1)[..., None]  # (B,H,T,1)

    x = split_heads(hidden_states, cfg.num_heads)  # (B,H,T,d)
    if cfg.gate_mlp or cfg.gate_mlp2:
        h1 = jnp.einsum("bhtd,hdk->bhtk", x, gate_params["w1"]) + gate_params["b1"][None, :, None, :]
        h1 = jax.nn.relu(h1)
        alpha = jnp.einsum("bhtk,hko->bhto", h1, gate_params["w2"]) + gate_params["b2"][None, :, None, :]
    else:
        alpha = jnp.einsum("bhtd,hdo->bhto", x, gate_params["w"]) + gate_params["b"][None, :, None, :]
    if cfg.gate_type == "conditional_per_head":
        alpha = jnp.mean(alpha, axis=2, keepdims=True)  # pool over tokens (B,H,1,1)
    return jax.nn.sigmoid(alpha)  # (B,H,T,1) or (B,H,1,1)


def apply_gate(
    context: Array,
    gate_params,
    cfg: AttentionExtrasConfig,
    hidden_states: Array,
    tape: ScopedTape = NULL_TAPE,
) -> Array:
    """Multiply per-head context by the gate; record gate telemetry
    (`last_gate_avg_prob`, bert_attention.py:294-333)."""
    if cfg.gate_type == "none":
        return context
    gate = compute_gate(gate_params, cfg, hidden_states)
    if tape.enabled:
        tape.record("gate_probs", gate)
    if cfg.gate_type == "unconditional_per_head":
        return context * gate
    return context * (gate * cfg.gate_scaling_factor)


def apply_gate_packed(
    context: Array,
    gate_params,
    cfg: AttentionExtrasConfig,
    hidden_states: Array,
    tape: ScopedTape = NULL_TAPE,
) -> Array:
    """`apply_gate` for (B, T, H*D)-packed context (the transpose-free flash
    path): the per-head gate is permuted to (B, T, H, 1) instead of permuting
    the (much larger) context to (B, H, T, D)."""
    if cfg.gate_type == "none":
        return context
    gate = compute_gate(gate_params, cfg, hidden_states)
    if tape.enabled:
        tape.record("gate_probs", gate)
    b, t, hd = context.shape
    ctx = context.reshape(b, t, cfg.num_heads, cfg.head_size)
    if cfg.gate_type == "unconditional_per_head":
        out = ctx * gate.reshape(1, 1, cfg.num_heads, 1)
    else:
        g = jnp.swapaxes(gate, 1, 2)  # (B,H,T|1,1) → (B,T|1,H,1)
        out = ctx * (g * cfg.gate_scaling_factor)
    return out.reshape(b, t, hd)


def relative_position_scores(
    distance_embedding: Array,
    q: Array,
    k: Array,
    max_position_embeddings: int,
    mode: str,
    use_cache: bool = False,
) -> Array:
    """relative_key / relative_key_query score terms
    (bert_attention.py:224-263)."""
    q_len, k_len = q.shape[2], k.shape[2]
    if use_cache:
        pos_l = jnp.array([[k_len - 1]], jnp.int32)
    else:
        pos_l = jnp.arange(q_len, dtype=jnp.int32)[:, None]
    pos_r = jnp.arange(k_len, dtype=jnp.int32)[None, :]
    distance = pos_l - pos_r
    emb = jnp.take(distance_embedding, distance + max_position_embeddings - 1, axis=0)
    emb = emb.astype(q.dtype)
    scores = jnp.einsum("bhld,lrd->bhlr", q, emb)
    if mode == "relative_key_query":
        scores = scores + jnp.einsum("bhrd,lrd->bhlr", k, emb)
    return scores


def attention_with_extras(
    params,
    cfg: AttentionExtrasConfig,
    hidden_states: Array,
    attention_mask: Optional[Array] = None,
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    encoder_hidden_states: Optional[Array] = None,
    past_key_value: Optional[Tuple[Array, Array]] = None,
    head_mask: Optional[Array] = None,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
    is_decoder: bool = False,
    use_flash: bool = False,
):
    """Forward pass. Returns (context, attn_probs, new_past_key_value).

    `attention_mask` is additive (large negative at masked positions), applied
    AFTER the attn_scores quant site/probe, matching bert_attention.py:265-272.
    """
    if cfg.skip_attn:  # bert_attention.py:179-181
        return jnp.zeros_like(hidden_states), None, None

    n_heads = cfg.num_heads
    is_cross = encoder_hidden_states is not None

    # NOTE on QKV fusion: concatenating the three projection weights into one
    # (H, 3H) matmul was tried and MEASURED SLOWER end-to-end on v5e (bench
    # vs_baseline 0.96 — XLA materializes the split copies and does not hoist
    # the weight concat out of scan loops). Three separate denses it is.
    mixed_q = common.dense(params["query"], hidden_states, q, "query")

    from outeffhop_tpu.ops.flash import pallas_attention_worthwhile
    from outeffhop_tpu.ops.softmax_variants import fused_softmax_spec

    t_kv_len = (encoder_hidden_states if is_cross else hidden_states).shape[1]
    if past_key_value is not None and not is_cross:
        t_kv_len += past_key_value[0].shape[2]
    # (softmax_n, clip) decomposition the kernels can fuse — covers vanilla,
    # softmax1, every clipped(γ:η)/clippedsoftmax1 preset, and the α-mode
    # (γ=-α/max_seq_length clipped softmax); None for entmax/callables
    fused = fused_softmax_spec(cfg.softmax, cfg.alpha, cfg.max_seq_length)
    flash_eligible = (
        use_flash
        and not tape.enabled
        and not q.enabled
        and cfg.position_embedding_type == "absolute"
        and head_mask is None
        and (deterministic or cfg.dropout_rate == 0.0)
        and fused is not None
        # measured dispatch: below the crossover XLA's fused unblocked
        # attention is faster than any Pallas kernel (results/probe12.log)
        and pallas_attention_worthwhile(
            hidden_states.shape[0], cfg.num_heads, hidden_states.shape[1], t_kv_len
        )
    )

    # Packed fast path: q/k/v stay in the (B, T, H*D) layout the projections
    # produce — no (B,H,T,D) transpose materializations around the Pallas call
    # (~1.2 ms/forward of pure layout traffic at BERT-base B32xS128 on v5e).
    t_kv = (encoder_hidden_states if is_cross else hidden_states).shape[1]
    from outeffhop_tpu.ops.flash import packed_supported

    if (
        flash_eligible
        and past_key_value is None
        and not is_decoder
        # shared predicate with the kernel wrapper: lane-group legality AND
        # VMEM fit (round-2 shipped a resource-only guard; the kernel then
        # failed Mosaic's lane rule on-chip — gate and wrapper must not drift)
        and packed_supported(
            hidden_states.shape[0], hidden_states.shape[1], t_kv,
            n_heads, cfg.head_size, hidden_states.dtype.itemsize,
        )
    ):
        from outeffhop_tpu.ops.flash import flash_attention_packed

        kv_src = encoder_hidden_states if is_cross else hidden_states
        mixed_k = common.dense(params["key"], kv_src, q, "key")
        mixed_v = common.dense(params["value"], kv_src, q, "value")
        context = flash_attention_packed(
            mixed_q,
            mixed_k,
            mixed_v,
            bias=attention_mask,
            heads=n_heads,
            softmax_n=fused[0],
            scale=1.0 / math.sqrt(cfg.head_size),
            clip=fused[1],
        )
        if cfg.gate_type != "none":
            context = apply_gate_packed(
                context, params.get("gate"), cfg, hidden_states, tape
            )
        context = q.act("context", context)
        return context, None, None
    if is_cross and past_key_value is not None:
        key_layer, value_layer = past_key_value
    elif is_cross:
        key_layer = split_heads(common.dense(params["key"], encoder_hidden_states, q, "key"), n_heads)
        value_layer = split_heads(
            common.dense(params["value"], encoder_hidden_states, q, "value"), n_heads
        )
    else:
        key_layer = split_heads(common.dense(params["key"], hidden_states, q, "key"), n_heads)
        value_layer = split_heads(common.dense(params["value"], hidden_states, q, "value"), n_heads)
        if past_key_value is not None:
            key_layer = jnp.concatenate([past_key_value[0], key_layer], axis=2)
            value_layer = jnp.concatenate([past_key_value[1], value_layer], axis=2)

    query_layer = split_heads(mixed_q, n_heads)
    use_cache = past_key_value is not None
    new_past = (key_layer, value_layer) if is_decoder else None

    softmax_fn = cfg.softmax_fn()

    # clip needs a one-pass path: whole K row normalized in VMEM (true up to
    # the default block_k=2048; beyond that the recurrence kernel cannot clip)
    if flash_eligible and (fused[1] is None or t_kv_len <= 2048):
        from outeffhop_tpu.ops.flash import flash_attention

        context = flash_attention(
            query_layer,
            key_layer,
            value_layer,
            bias=attention_mask,
            softmax_n=fused[0],
            scale=1.0 / math.sqrt(cfg.head_size),
            clip=fused[1],
        )
        attention_probs = None
    else:
        # Accumulate scores in f32 (same as the flash kernel's in-VMEM scores
        # and the reference's fp16→fp32 softmax upcast, opt_attention.py:227)
        # — but KEEP the einsum inputs bf16 so the MXU stays on its fast path.
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", query_layer, key_layer,
            preferred_element_type=jnp.float32,
        )
        if cfg.position_embedding_type in ("relative_key", "relative_key_query"):
            scores = scores + relative_position_scores(
                params["distance_embedding"]["weight"],
                query_layer,
                key_layer,
                cfg.max_position_embeddings,
                cfg.position_embedding_type,
                use_cache=use_cache,
            )
        scores = scores / math.sqrt(cfg.head_size)
        scores = tape.record("attn_scores", scores)
        scores = q.act("attn_scores", scores)
        if attention_mask is not None:
            scores = scores + attention_mask
        attention_probs = softmax_fn(scores, axis=-1)
        attention_probs = tape.record("attn_probs_before_dropout", attention_probs)
        attention_probs = q.act("attn_probs", attention_probs)
        attention_probs = common.dropout(
            attention_probs, cfg.dropout_rate, dropout_rng, deterministic
        )
        attention_probs = tape.record("attn_probs_after_dropout", attention_probs)
        if head_mask is not None:
            attention_probs = attention_probs * head_mask
        # PV in the value dtype: the f32 mask/softmax must not promote the
        # context (and with it every downstream matmul) to f32.
        context = jnp.einsum(
            "bhqk,bhkd->bhqd", attention_probs.astype(value_layer.dtype), value_layer
        )

    if cfg.gate_type != "none":
        context = apply_gate(context, params.get("gate"), cfg, hidden_states, tape)

    context = merge_heads(context)
    context = q.act("context", context)
    return context, attention_probs, new_past
