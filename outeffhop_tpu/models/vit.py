"""Vision Transformer with OutEffHop attention extras + W8A8 quant sites.

The reference vendors all of timm's `vision_transformer.py` (2678 LoC,
`transformers_language/models/vision_transformer.py`) purely so it can swap
`ViTSelfAttentionWithExtras` (`vit_attention.py:77-269`) into the blocks, and
wraps the result in `QuantizedVisionTransformer`
(`transformers_language/models/quantized_vit.py:581-810`). Here the model is
one functional assembly with the same knobs:

  * fused qkv projection (`vit_attention.py` timm layout), pluggable
    softmax_fn, per-head/token gating — shared with BERT/OPT via
    `ops/attention` gate helpers;
  * explicit scaled-dot-product attention taking an arbitrary softmax
    (`vit_attention.py:54-75`); the reference's always-on dropout bug there
    (`train=True`, :74) is NOT replicated — dropout respects `deterministic`;
  * LayerScale (`QuantizedLayerScale`, quantized_vit.py:540), class token,
    learned position embeddings (timm `_pos_embed`, vision_transformer.py:608),
    token / avg-pool global pooling;
  * quant sites per `QuantizedVisionTransformer`: patch-embed conv projection
    weight+act (:402), attention scores/probs/context (:422-537), both
    residual sums (`res_act_quantizer_1/2`, :567-568), fc1+GELU folded, head
    quantized only when num_classes > 0 (:650); cls token + pos embedding
    stay FP (:650 comment, cls/pos excluded from quantization).

The patch-embed convolution is expressed as an unfold+matmul (space-to-depth
then one (N, P²·C)×(P²·C, D) matmul): on TPU this lands straight on the MXU
and is exactly equivalent to the stride-P conv.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.ops.attention import (
    apply_gate_packed,
    AttentionExtrasConfig,
    apply_gate,
    attention_extras_params,
    merge_heads,
    split_heads,
)
from outeffhop_tpu.ops.telemetry import NULL_TAPE, ScopedTape
from outeffhop_tpu.quant.calibrate import NULL_QCTX, ScopedQuantCtx

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    class_token: bool = True
    global_pool: str = "token"  # token | avg | map (AttentionPoolLatent) | none
    init_scale: Optional[float] = None  # LayerScale init (None = no LayerScale)
    layer_norm_eps: float = 1e-6
    dropout: float = 0.0
    attn_dropout: float = 0.0
    # attention extras (run_vit.py:633-658 surgery knobs)
    attn_softmax: str = "vanilla"
    attn_gate_type: str = "none"
    attn_gate_init: Optional[float] = None
    attn_gate_mlp: bool = False
    attn_gate_mlp2: bool = False
    attn_gate_linear_all_features: bool = False
    fine_tuning: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.class_token else 0)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    def attention_config(self) -> AttentionExtrasConfig:
        return AttentionExtrasConfig(
            hidden_size=self.embed_dim,
            num_heads=self.num_heads,
            softmax=self.attn_softmax,
            gate_type=self.attn_gate_type,
            gate_init=self.attn_gate_init,
            gate_mlp=self.attn_gate_mlp,
            gate_mlp2=self.attn_gate_mlp2,
            gate_linear_all_features=self.attn_gate_linear_all_features,
            fine_tuning=self.fine_tuning,
            dropout_rate=self.attn_dropout,
        )


# standard timm factories the reference's run_vit.py exposes via create_model
VIT_PRESETS = {
    "vit_tiny_patch16_224": dict(embed_dim=192, depth=12, num_heads=3),
    "vit_small_patch16_224": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch16_224": dict(embed_dim=1024, depth=24, num_heads=16),
    "vit_base_patch32_224": dict(embed_dim=768, depth=12, num_heads=12, patch_size=32),
    "vit_base_patch16_384": dict(embed_dim=768, depth=12, num_heads=12, img_size=384),
    "vit_huge_patch14_224": dict(embed_dim=1280, depth=32, num_heads=16, patch_size=14),
}


def vit_config(name: str, **overrides) -> ViTConfig:
    if name not in VIT_PRESETS:
        raise KeyError(f"unknown ViT preset {name!r}; known: {sorted(VIT_PRESETS)}")
    return ViTConfig(**{**VIT_PRESETS[name], **overrides})


def init_vit_params(key, cfg: ViTConfig):
    keys = jax.random.split(key, cfg.depth + 4)
    d, p, c = cfg.embed_dim, cfg.patch_size, cfg.in_chans
    acfg = cfg.attention_config()
    params = {
        "patch_embed": {
            # conv kernel stored matmul-ready: (P*P*C, D)
            "weight": jax.random.normal(keys[0], (p * p * c, d)) * 0.02,
            "bias": jnp.zeros((d,)),
        },
        "pos_embed": jax.random.normal(keys[1], (1, cfg.seq_len, d)) * 0.02,
        "blocks": [],
        "norm": common.ln_params(d),
    }
    if cfg.class_token:
        params["cls_token"] = jnp.zeros((1, 1, d))
    for i in range(cfg.depth):
        bk = jax.random.split(keys[i + 2], 4)
        attn = attention_extras_params(bk[0], acfg)
        # fuse q/k/v into the timm qkv layout
        qw, kw, vw = attn.pop("query"), attn.pop("key"), attn.pop("value")
        attn["qkv"] = {
            "weight": jnp.concatenate([qw["weight"], kw["weight"], vw["weight"]], 0),
            "bias": jnp.concatenate([qw["bias"], kw["bias"], vw["bias"]], 0)
            if cfg.qkv_bias
            else None,
        }
        attn["proj"] = common.dense_params(bk[1], d, d)
        block = {
            "ln1": common.ln_params(d),
            "attn": attn,
            "ln2": common.ln_params(d),
            "mlp": {
                "fc1": common.dense_params(bk[2], d, cfg.mlp_hidden),
                "fc2": common.dense_params(bk[3], cfg.mlp_hidden, d),
            },
        }
        if cfg.init_scale is not None:
            block["ls1"] = {"gamma": jnp.full((d,), cfg.init_scale)}
            block["ls2"] = {"gamma": jnp.full((d,), cfg.init_scale)}
        params["blocks"].append(block)
    if cfg.global_pool == "map":
        mk = jax.random.split(keys[-2], 5)
        params["attn_pool"] = {
            "latent": jax.random.normal(mk[0], (1, 1, d)) * 0.02,
            "q": common.dense_params(mk[1], d, d),
            "kv": common.dense_params(mk[2], d, 2 * d),
            "proj": common.dense_params(mk[3], d, d),
            "norm": common.ln_params(d),
            "mlp": {
                "fc1": common.dense_params(mk[4], d, cfg.mlp_hidden),
                "fc2": common.dense_params(jax.random.fold_in(mk[4], 1), cfg.mlp_hidden, d),
            },
        }
    if cfg.num_classes > 0:
        params["head"] = common.dense_params(keys[-1], d, cfg.num_classes)
    return params


def patch_embed(params, cfg: ViTConfig, images: Array, q: ScopedQuantCtx) -> Array:
    """(B, H, W, C) images → (B, N, D) patch tokens.

    Space-to-depth + matmul ≡ the stride-P conv (`QuantizedPatchEmbed`,
    quantized_vit.py:402: proj conv is weight+act quantized)."""
    b, hh, ww, c = images.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = images.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, gh * gw, p * p * c)
    w = q.weight("patch_embed.proj", params["weight"])
    x = x @ w + params["bias"]
    return q.act("patch_embed.proj", x)


def vit_attention(
    params,
    cfg: ViTConfig,
    x: Array,
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
) -> Array:
    """Fused-qkv attention with pluggable softmax
    (`ViTSelfAttentionWithExtras.forward` + its explicit
    `scaled_dot_product_attention`, vit_attention.py:54-75, 202-263)."""
    n_heads = cfg.num_heads
    acfg = cfg.attention_config()
    qkv = common.dense(params["qkv"], x, q, "qkv")
    qs, ks, vs = jnp.split(qkv, 3, axis=-1)  # packed (B, T, H*D) each

    from outeffhop_tpu.ops.flash import packed_supported, pallas_attention_worthwhile
    from outeffhop_tpu.ops.softmax_variants import fused_softmax_spec

    b, t, _ = x.shape
    fused = fused_softmax_spec(cfg.attn_softmax)
    flash_ok = (
        use_flash
        and not tape.enabled
        and not q.enabled
        and fused is not None
        and (deterministic or cfg.attn_dropout == 0.0)
        # measured crossover (results/probe12.log): the PACKED kernel wins
        # 2.6x at ViT-base B64xT200; XLA wins below ~16M score elements.
        # Round-3 probe14 showed the unpacked kernel + four (B,H,T,D)
        # transpose materializations LOSES 22% e2e at this exact shape — ViT
        # must go through the packed kernel or not at all.
        and pallas_attention_worthwhile(b, n_heads, t, t)
        and packed_supported(b, t, t, n_heads, cfg.head_dim, x.dtype.itemsize)
    )
    if flash_ok:
        from outeffhop_tpu.ops.flash import flash_attention_packed

        context = flash_attention_packed(
            qs, ks, vs,
            heads=n_heads,
            softmax_n=fused[0],
            scale=1.0 / math.sqrt(cfg.head_dim),
            clip=fused[1],
        )
        if cfg.attn_gate_type != "none":
            context = apply_gate_packed(context, params.get("gate"), acfg, x, tape)
        context = q.act("context", context)
        return common.dense(params["proj"], context, q, "proj")

    qs, ks, vs = (split_heads(tns, n_heads) for tns in (qs, ks, vs))
    scores = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) / math.sqrt(cfg.head_dim)
    scores = tape.record("attn_scores", scores)
    scores = q.act("attn_scores", scores)
    probs = acfg.softmax_fn()(scores, axis=-1)
    probs = tape.record("attn_probs_before_dropout", probs)
    probs = q.act("attn_probs", probs)
    # reference bug not replicated: vit_attention.py:74 hard-codes
    # dropout train=True even in eval; we respect `deterministic`
    probs = common.dropout(probs, cfg.attn_dropout, dropout_rng, deterministic)
    context = jnp.einsum("bhqk,bhkd->bhqd", probs, vs)

    if cfg.attn_gate_type != "none":
        context = apply_gate(context, params.get("gate"), acfg, x, tape)

    context = merge_heads(context)
    context = q.act("context", context)
    return common.dense(params["proj"], context, q, "proj")


def _layer_scale(block, name, x, q: ScopedQuantCtx):
    if name not in block:
        return x
    g = q.weight(name, block[name]["gamma"])  # QuantizedLayerScale, :540
    return x * g


def vit_block(
    params,
    cfg: ViTConfig,
    x: Array,
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
) -> Array:
    """Pre-LN block with LayerScale and both residual sums re-quantized
    (`QuantizedBlock`, quantized_vit.py:553-578: res_act_quantizer_1/2)."""
    rngs = jax.random.split(dropout_rng, 2) if dropout_rng is not None else [None, None]
    h = common.quant_layer_norm(params["ln1"], x, q, "ln1", cfg.layer_norm_eps)
    h = vit_attention(
        params["attn"], cfg, h,
        q=q.scoped("attn"), tape=tape.scoped("attn"),
        dropout_rng=rngs[0], deterministic=deterministic, use_flash=use_flash,
    )
    h = _layer_scale(params, "ls1", h, q)
    x = x + h
    x = q.act("res1", x)  # res_act_quantizer_1, :567
    x = tape.record("res1", x)

    f = common.quant_layer_norm(params["ln2"], x, q, "ln2", cfg.layer_norm_eps)
    f = common.dense(params["mlp"]["fc1"], f, q, "mlp.fc1", activation=common.gelu)
    f = common.dense(params["mlp"]["fc2"], f, q, "mlp.fc2")
    f = tape.record("mlp.fc2", f)
    f = common.dropout(f, cfg.dropout, rngs[1], deterministic)
    f = _layer_scale(params, "ls2", f, q)
    x = x + f
    x = q.act("res2", x)  # res_act_quantizer_2, :568
    x = tape.record("res2", x)
    return x


def attention_pool_latent(
    params,
    cfg: ViTConfig,
    x: Array,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
) -> Array:
    """timm AttentionPoolLatent (latent_len=1): a learned latent query
    attends over the tokens, then proj + residual MLP; pooled = the latent
    (`QuantizedAttentionPoolLatent`, quantized_vit.py:278 — same quant sites
    as the block attention: q/kv/proj dense, scores, probs, context)."""
    b = x.shape[0]
    n_heads = cfg.num_heads
    latent = jnp.broadcast_to(params["latent"].astype(x.dtype), (b, 1, x.shape[-1]))
    qs = split_heads(common.dense(params["q"], latent, q, "q"), n_heads)
    kv = common.dense(params["kv"], x, q, "kv")
    ks, vs = jnp.split(kv, 2, axis=-1)
    ks, vs = split_heads(ks, n_heads), split_heads(vs, n_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) / math.sqrt(cfg.head_dim)
    scores = tape.record("attn_scores", scores)
    scores = q.act("attn_scores", scores)
    probs = jax.nn.softmax(scores, axis=-1)  # the pool uses vanilla softmax
    probs = q.act("attn_probs", probs)
    ctx = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, vs))
    ctx = q.act("context", ctx)
    y = common.dense(params["proj"], ctx, q, "proj")
    f = common.quant_layer_norm(params["norm"], y, q, "norm", cfg.layer_norm_eps)
    f = common.dense(params["mlp"]["fc1"], f, q, "mlp.fc1", activation=common.gelu)
    f = common.dense(params["mlp"]["fc2"], f, q, "mlp.fc2")
    y = y + f
    y = q.act("res", y)
    return y[:, 0]


def vit_forward(
    params,
    cfg: ViTConfig,
    images: Array,
    *,
    q: ScopedQuantCtx = NULL_QCTX,
    tape: ScopedTape = NULL_TAPE,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    remat: bool = False,
) -> Array:
    """(B, H, W, C) images → logits (B, num_classes) (or pooled features when
    num_classes == 0). cls token + pos embedding stay FP
    (QuantizedVisionTransformer:650)."""
    x = patch_embed(params["patch_embed"], cfg, images, q.scoped("patch_embed"))
    if cfg.class_token:
        cls = jnp.broadcast_to(
            params["cls_token"].astype(x.dtype), (x.shape[0], 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    x = q.act("pos_embed_sum", x)
    rngs = (
        jax.random.split(dropout_rng, cfg.depth)
        if dropout_rng is not None
        else [None] * cfg.depth
    )
    use_remat = remat and not tape.enabled  # see bert_encoder remat note
    for i, bp in enumerate(params["blocks"]):

        def block_call(bp_, x_, rr, i=i):
            return vit_block(
                bp_, cfg, x_,
                q=q.scoped(f"block{i}"), tape=tape.scoped(f"block{i}"),
                dropout_rng=rr, deterministic=deterministic, use_flash=use_flash,
            )

        if use_remat:
            block_call = common.checkpoint_layer(block_call, remat)
        x = block_call(bp, x, rngs[i])
    x = common.quant_layer_norm(params["norm"], x, q, "norm", cfg.layer_norm_eps)
    x = tape.record("norm", x)

    if cfg.global_pool == "token":
        pooled = x[:, 0]
    elif cfg.global_pool == "avg":
        start = 1 if cfg.class_token else 0
        pooled = jnp.mean(x[:, start:], axis=1)
    elif cfg.global_pool == "map":
        pooled = attention_pool_latent(
            params["attn_pool"], cfg, x, q.scoped("attn_pool"), tape.scoped("attn_pool")
        )
    else:
        return x
    if cfg.num_classes > 0:
        # head IS quantized when present (quantized_vit.py:650)
        return common.dense(params["head"], pooled, q.scoped("head"), "fc")
    return pooled


def vit_cls_loss(logits: Array, labels: Array) -> Array:
    # logsumexp formulation (see models/bert.py:mlm_loss)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logits, labels[:, None], axis=-1
    )[:, 0].astype(jnp.float32)
    return jnp.mean(lse - picked)


def accuracy_topk(logits: Array, labels: Array, k: int = 1) -> Array:
    """timm `accuracy` equivalent (validate_vit1.py:589-596 top-1/top-5)."""
    topk = jnp.argsort(logits, axis=-1)[:, ::-1][:, :k]
    return jnp.mean(jnp.any(topk == labels[:, None], axis=-1).astype(jnp.float32)) * 100.0
