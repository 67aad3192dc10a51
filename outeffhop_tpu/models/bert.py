"""BERT encoder + MLM head with OutEffHop attention extras.

Functional re-design of the reference's surgically-modified HF BERT
(`run_mlm.py:201-220` surgery + `transformers_language/models/quantized_bert.py`
for the INT8 wrapper). One forward serves FP and quantized execution: pass a
live `ScopedQuantCtx` and the quant-site placement reproduces
`QuantizedBertForMaskedLM` exactly —

  embeddings: word/pos/token-type weight-quantized lookups, both embedding
      sums re-quantized (`quantized_bert.py:206-216`), LN quantized (simple
      hijack by default, decomposed when `layer_norm_embd`);
  attention: q/k/v QuantLinear; attn_scores (pre-mask), attn_probs
      (post-softmax), context sites (`:363,374,434`);
  self-output/output: dense QuantLinear, residual-sum re-quantized
      (`res_act_quantizer`, `:569,604`), LN quantized;
  intermediate: dense + GELU folded into one site (`quantize_intermediate`,
      `:609-617`);
  MLM cls head: always FP32 (`:865`).

The MLM loss/perplexity definition matches `validate_mlm_config.py:542-548`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.ops.attention import (
    AttentionExtrasConfig,
    attention_extras_params,
    attention_with_extras,
)
from outeffhop_tpu.ops.telemetry import NULL_TAPE, ScopedTape
from outeffhop_tpu.quant.calibrate import NULL_QCTX, ScopedQuantCtx

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    # attention extras (the surgery knobs, run_mlm.py:201-220 / args.py:337-385)
    attn_softmax: str = "vanilla"
    alpha: Optional[float] = None
    max_seq_length: Optional[int] = None
    skip_attn: bool = False
    attn_gate_type: str = "none"
    attn_gate_init: Optional[float] = None
    attn_gate_mlp: bool = False
    attn_gate_mlp2: bool = False
    attn_gate_linear_all_features: bool = False
    fine_tuning: bool = False
    position_embedding_type: str = "absolute"
    # decomposed-LN quant flags (DEFAULT_QUANT_DICT, quantized_bert.py:56-69)
    layer_norm_ver: str = "v1"
    layer_norm_embd: bool = False
    layer_norm_res_self_output: bool = False
    layer_norm_res_output: bool = False

    def attention_config(self) -> AttentionExtrasConfig:
        return AttentionExtrasConfig(
            hidden_size=self.hidden_size,
            num_heads=self.num_attention_heads,
            softmax=self.attn_softmax,
            alpha=self.alpha,
            max_seq_length=self.max_seq_length or self.max_position_embeddings,
            skip_attn=self.skip_attn,
            gate_type=self.attn_gate_type,
            gate_init=self.attn_gate_init,
            gate_mlp=self.attn_gate_mlp,
            gate_mlp2=self.attn_gate_mlp2,
            gate_linear_all_features=self.attn_gate_linear_all_features,
            fine_tuning=self.fine_tuning,
            position_embedding_type=self.position_embedding_type,
            max_position_embeddings=self.max_position_embeddings,
            dropout_rate=self.attention_probs_dropout_prob,
        )


def init_bert_params(key, cfg: BertConfig):
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    acfg = cfg.attention_config()
    ek = jax.random.split(keys[0], 4)
    params = {
        "embeddings": {
            "word": common.embedding_params(ek[0], cfg.vocab_size, h),
            "position": common.embedding_params(ek[1], cfg.max_position_embeddings, h),
            "token_type": common.embedding_params(ek[2], cfg.type_vocab_size, h),
            "ln": common.ln_params(h),
        },
        "layers": [],
        "head": None,
    }
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(keys[i + 1], 6)
        params["layers"].append(
            {
                "attention": attention_extras_params(lk[0], acfg),
                "attention_output": {
                    "dense": common.dense_params(lk[1], h, h),
                    "ln": common.ln_params(h),
                },
                "intermediate": common.dense_params(lk[2], h, inter),
                "output": {
                    "dense": common.dense_params(lk[3], inter, h),
                    "ln": common.ln_params(h),
                },
            }
        )
    hk = jax.random.split(keys[-1], 3)
    params["head"] = {
        "transform": common.dense_params(hk[0], h, h),
        "transform_ln": common.ln_params(h),
        "decoder": common.dense_params(hk[1], h, cfg.vocab_size),
    }
    return params


def extended_attention_mask(attention_mask: Array, dtype=jnp.float32) -> Array:
    """(B, T) 1/0 mask → (B, 1, 1, T) additive mask with large-negative fill
    (HF `get_extended_attention_mask` semantics used by the drivers)."""
    m = attention_mask[:, None, None, :].astype(dtype)
    return (1.0 - m) * jnp.finfo(dtype).min


def _maybe_decomposed_ln(params, x, q, cfg: BertConfig, name: str, decomposed: bool,
                         mu_site: Optional[str] = None):
    if decomposed and q.enabled:
        return common.decomposed_quant_layer_norm(
            params, x, q, name=name, mu_site=mu_site, ver=cfg.layer_norm_ver,
            eps=1e-12,
        )
    return common.quant_layer_norm(params, x, q, name=name, eps=cfg.layer_norm_eps)


def bert_embeddings(
    params,
    cfg: BertConfig,
    input_ids: Array,
    token_type_ids: Optional[Array] = None,
    position_ids: Optional[Array] = None,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
) -> Array:
    b, t = input_ids.shape
    if position_ids is None:
        position_ids = jnp.arange(t, dtype=jnp.int32)[None, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, t), jnp.int32)
    qe = q.scoped("embeddings")
    te = tape.scoped("embeddings")
    words = common.embedding(params["word"], input_ids, qe, "word")
    tok_types = common.embedding(params["token_type"], token_type_ids, qe, "token_type")
    x = words + tok_types
    x = qe.act("sum_input_token_type", x)  # quantized_bert.py:206-209
    if cfg.position_embedding_type == "absolute":
        pos = common.embedding(params["position"], position_ids, qe, "position")
        x = x + pos
        x = qe.act("sum_pos", x)  # :211-216
    x = te.record("ln_input", x)
    x = _maybe_decomposed_ln(
        params["ln"], x, qe, cfg, "ln", cfg.layer_norm_embd,
        mu_site="sum_pos" if cfg.layer_norm_embd else None,
    )
    x = te.record("ln_output", x)
    return common.dropout(x, cfg.hidden_dropout_prob, dropout_rng, deterministic)


def bert_layer(
    params,
    cfg: BertConfig,
    hidden_states: Array,
    attention_mask: Optional[Array],
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
) -> Array:
    rngs = jax.random.split(dropout_rng, 3) if dropout_rng is not None else [None] * 3
    context, _, _ = attention_with_extras(
        params["attention"],
        cfg.attention_config(),
        hidden_states,
        attention_mask,
        q=q.scoped("attention"),
        tape=tape.scoped("attention"),
        dropout_rng=rngs[0],
        deterministic=deterministic,
        use_flash=use_flash,
    )
    # self-output: dense → dropout → +residual (requant) → LN
    qo = q.scoped("attention_output")
    ao = common.dense(params["attention_output"]["dense"], context, qo, "dense")
    ao = common.dropout(ao, cfg.hidden_dropout_prob, rngs[1], deterministic)
    x = ao + hidden_states
    x = qo.act("res", x)  # res_act_quantizer, quantized_bert.py:569
    x = tape.record("attention_output.ln_input", x)
    x = _maybe_decomposed_ln(
        params["attention_output"]["ln"], x, qo, cfg, "ln", cfg.layer_norm_res_self_output
    )
    x = tape.record("attention_output.ln_output", x)

    # intermediate: dense + GELU folded into one quant site (:609-617)
    inter = common.dense(params["intermediate"], x, q, "intermediate", activation=common.gelu)

    qo2 = q.scoped("output")
    out = common.dense(params["output"]["dense"], inter, qo2, "dense")
    out = tape.record("output.dense", out)  # FFN-output probe (validate_mlm_config.py)
    out = common.dropout(out, cfg.hidden_dropout_prob, rngs[2], deterministic)
    y = out + x
    y = qo2.act("res", y)  # :604
    y = tape.record("output.ln_input", y)
    y = _maybe_decomposed_ln(params["output"]["ln"], y, qo2, cfg, "ln", cfg.layer_norm_res_output)
    y = tape.record("output.ln_output", y)
    return y


def bert_encoder(
    params,
    cfg: BertConfig,
    x: Array,
    attention_mask: Optional[Array],
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    remat: bool = False,
) -> Array:
    # remat: per-layer jax.checkpoint — recompute activations in the backward
    # instead of saving them (the standard TPU HBM/FLOPs trade; enables
    # larger per-chip train batches). No-op when the tape is live: recorded
    # probe values escape the checkpointed region as a Python-dict side
    # channel, which rematerialization would discard.
    use_remat = remat and not tape.enabled
    for i, layer_params in enumerate(params["layers"]):
        rng_i = jax.random.fold_in(dropout_rng, i) if dropout_rng is not None else None

        def layer_call(lp, xx, rr, i=i):
            return bert_layer(
                lp,
                cfg,
                xx,
                attention_mask,
                q=q.scoped(f"layer{i}"),
                tape=tape.scoped(f"layer{i}"),
                dropout_rng=rr,
                deterministic=deterministic,
                use_flash=use_flash,
            )

        if use_remat:
            layer_call = common.checkpoint_layer(layer_call, remat)
        x = layer_call(layer_params, x, rng_i)
    return x


def bert_mlm_forward(
    params,
    cfg: BertConfig,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    remat: bool = False,
) -> Array:
    """Returns MLM logits (B, T, vocab). The cls head runs FP32 always
    (`QuantizedBertForMaskedLM`, quantized_bert.py:865)."""
    ext_mask = (
        extended_attention_mask(attention_mask) if attention_mask is not None else None
    )
    rngs = jax.random.split(dropout_rng, 2) if dropout_rng is not None else [None, None]
    x = bert_embeddings(
        params["embeddings"], cfg, input_ids, token_type_ids,
        q=q, tape=tape, dropout_rng=rngs[0], deterministic=deterministic,
    )
    x = bert_encoder(
        params, cfg, x, ext_mask, q=q, tape=tape,
        dropout_rng=rngs[1], deterministic=deterministic, use_flash=use_flash,
        remat=remat,
    )
    head = params["head"]
    h = common.gelu(x @ head["transform"]["weight"].T + head["transform"]["bias"])
    h = common.layer_norm(head["transform_ln"], h, cfg.layer_norm_eps)
    logits = h @ head["decoder"]["weight"].T + head["decoder"]["bias"]
    return logits


def init_bert_pooler_params(key, cfg: BertConfig):
    """dense(h→h)+tanh pooler over the [CLS] token (`QuantizedBertModel`
    pooler, quantized_bert.py:684-703; HF BertPooler)."""
    return common.dense_params(key, cfg.hidden_size, cfg.hidden_size)


def bert_pooler(params, sequence_output: Array, q: ScopedQuantCtx = NULL_QCTX) -> Array:
    """(B, T, H) → (B, H): first-token dense+tanh, tanh folded into the dense
    quant site exactly like the hijacker folds activations
    (quantized_bert.py:692-703; hijacker activations_set includes Tanh)."""
    first = sequence_output[:, 0]
    return common.dense(params, first, q.scoped("pooler"), "dense", activation=jnp.tanh)


def bert_model_forward(
    params,
    cfg: BertConfig,
    input_ids: Array,
    attention_mask: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
):
    """BertModel surface: (sequence_output, pooled_output-or-None)
    (`QuantizedBertModel.forward`, quantized_bert.py:706-812). The pooler runs
    only when `params["pooler"]` is present (HF `add_pooling_layer`)."""
    ext_mask = (
        extended_attention_mask(attention_mask) if attention_mask is not None else None
    )
    rngs = jax.random.split(dropout_rng, 2) if dropout_rng is not None else [None, None]
    x = bert_embeddings(
        params["embeddings"], cfg, input_ids, token_type_ids,
        q=q, tape=tape, dropout_rng=rngs[0], deterministic=deterministic,
    )
    x = bert_encoder(
        params, cfg, x, ext_mask, q=q, tape=tape,
        dropout_rng=rngs[1], deterministic=deterministic, use_flash=use_flash,
    )
    pooled = bert_pooler(params["pooler"], x, q) if params.get("pooler") else None
    return x, pooled


def mlm_loss(logits: Array, labels: Array, ignore_index: int = -100) -> Array:
    """Mean CE over non-ignored positions; exp(loss) is the reference's
    perplexity (`validate_mlm_config.py:542-548`).

    Formulated as logsumexp(logits) - logits[label] rather than a gather from
    a full log_softmax: identical values (-logp[y] = lse - logit[y]; probe28
    measured bit-equal loss on chip), but the (B, S, V) f32 log-probability
    tensor is never materialized — its fwd+bwd HBM traffic was ~1 ms of the
    28.7 ms BERT-base train step (probe28 full vs full+lse)."""
    mask = labels != ignore_index
    safe_labels = jnp.where(mask, labels, 0)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1
    )[..., 0].astype(jnp.float32)
    nll = lse - picked
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
