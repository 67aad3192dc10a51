"""ViH (Vision-Hopfield) classifier models for the theory experiments.

Functional re-design of `theory_verification/models.py`:

  * `patch_embedding` (models.py:107-124) — patchify + linear projection
    (the reference uses a stride=patch conv; here it's an equivalent
    unfold-reshape + matmul, which XLA tiles straight onto the MXU) with a
    learned cls token prepended;
  * `MLP` (models.py:14-37) — 512→2048→512 GELU with dropout 0.3 and
    Xavier-uniform init;
  * `Block` (models.py:38-64) — pre-norm self-Hopfield (MHN) or
    LearnableHopfield (UMHN) + pre-norm MLP, both residual;
  * `ThreeLayerViH` (models.py:66-103) — patch embed → 3 Blocks → encoder
    norm → cls-token head (relu → LN → fc);
  * `ViH` (models.py:126-150) — single-layer variant: cls token is the
    query, patches are the memory.

Reference quirk NOT replicated: models.py hardcodes 512 in Block/encoder
norms while taking emb_size as an argument (crashes for emb_size≠512);
here everything derives from cfg.d_model.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.theory.layers import (
    HopfieldConfig,
    hopfield,
    hopfield_params,
    learnable_hopfield,
    learnable_hopfield_params,
    learnable_hopfield_uniform_forward,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViHConfig:
    in_channels: int = 3
    patch_size: int = 16
    d_model: int = 512
    img_size: int = 64
    n_heads: int = 4
    n_class: int = 10
    mode: str = "MHN"  # MHN | UMHN
    activation: str = "softmax"  # softmax | softmax1 | sparsemax | entmax
    update_steps: int = 1
    n_layers: int = 3
    mlp_ratio: int = 4
    dropout: float = 0.3
    scale: Optional[float] = None

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def hopfield_cfg(self) -> HopfieldConfig:
        return HopfieldConfig(
            d_model=self.d_model,
            n_heads=self.n_heads,
            update_steps=self.update_steps,
            mode=self.activation,
            scale=self.scale,
        )


# ---------------------------------------------------------------------------
# Patch embedding (models.py:107-124)
# ---------------------------------------------------------------------------


def patch_embedding_params(key: Array, cfg: ViHConfig):
    k1, k2 = jax.random.split(key)
    patch_dim = cfg.in_channels * cfg.patch_size * cfg.patch_size
    return {
        "projection": common.dense_params(k1, patch_dim, cfg.d_model),
        "cls_token": jax.random.normal(k2, (1, 1, cfg.d_model), jnp.float32),
    }


def patch_embedding(params, cfg: ViHConfig, x: Array) -> Array:
    """x: (B, C, H, W) → (B, 1 + num_patches, d_model) with cls prepended."""
    B, C, H, W = x.shape
    P = cfg.patch_size
    # (B, C, H/P, P, W/P, P) → (B, H/P, W/P, C, P, P) → (B, N, C·P·P):
    # channel-major patch layout matches a conv kernel's (C, P, P) receptive
    # field, so torch conv weights convert by a pure reshape.
    patches = x.reshape(B, C, H // P, P, W // P, P)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(B, (H // P) * (W // P), C * P * P)
    emb = common.dense(params["projection"], patches)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.d_model)).astype(emb.dtype)
    return jnp.concatenate([cls, emb], axis=1)


# ---------------------------------------------------------------------------
# MLP + Block (models.py:14-64)
# ---------------------------------------------------------------------------


def _xavier_dense_params(key: Array, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return {
        "weight": jax.random.uniform(kw, (fan_out, fan_in), jnp.float32, -bound, bound),
        "bias": jax.random.normal(kb, (fan_out,), jnp.float32) * 1e-6,
    }


def mlp_params(key: Array, cfg: ViHConfig):
    k1, k2 = jax.random.split(key)
    hidden = cfg.d_model * cfg.mlp_ratio
    return {
        "fc1": _xavier_dense_params(k1, cfg.d_model, hidden),
        "fc2": _xavier_dense_params(k2, hidden, cfg.d_model),
    }


def mlp(params, cfg: ViHConfig, x: Array, rng: Optional[Array], deterministic: bool) -> Array:
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    h = common.gelu(common.dense(params["fc1"], x))
    h = common.dropout(h, cfg.dropout, r1, deterministic)
    h = common.dense(params["fc2"], h)
    return common.dropout(h, cfg.dropout, r2, deterministic)


def block_params(key: Array, cfg: ViHConfig):
    k1, k2 = jax.random.split(key)
    layer = (
        hopfield_params(k1, cfg.hopfield_cfg)
        if cfg.mode == "MHN"
        else learnable_hopfield_params(k1, cfg.hopfield_cfg)
    )
    return {
        "attention_norm": common.ln_params(cfg.d_model),
        "ffn_norm": common.ln_params(cfg.d_model),
        "layer": layer,
        "ffn": mlp_params(k2, cfg),
    }


def block(
    params,
    cfg: ViHConfig,
    x: Array,
    rng: Optional[Array],
    deterministic: bool,
    get_kernel: bool = False,
):
    """Pre-norm self-Hopfield + pre-norm MLP, both residual (models.py:50-64)."""
    h = x
    xn = common.layer_norm(params["attention_norm"], x, eps=1e-6)
    kernel_out = None
    if cfg.mode == "MHN":
        attn = hopfield(params["layer"], cfg.hopfield_cfg, xn, xn)
    else:
        if get_kernel:
            kernel_out = learnable_hopfield_uniform_forward(params["layer"], xn)
        attn = learnable_hopfield(params["layer"], cfg.hopfield_cfg, xn, xn)
    x = attn + h
    h = x
    xn = common.layer_norm(params["ffn_norm"], x, eps=1e-6)
    x = mlp(params["ffn"], cfg, xn, rng, deterministic) + h
    return (x, kernel_out) if get_kernel else x


# ---------------------------------------------------------------------------
# ThreeLayerViH (models.py:66-103) and ViH (models.py:126-150)
# ---------------------------------------------------------------------------


def three_layer_vih_params(key: Array, cfg: ViHConfig):
    keys = jax.random.split(key, cfg.n_layers + 3)
    return {
        "emb": patch_embedding_params(keys[0], cfg),
        "blocks": [block_params(keys[1 + i], cfg) for i in range(cfg.n_layers)],
        "encoder_norm": common.ln_params(cfg.d_model),
        "ln": common.ln_params(cfg.d_model),
        "fc": common.dense_params(keys[-1], cfg.d_model, cfg.n_class),
    }


def three_layer_vih_forward(
    params,
    cfg: ViHConfig,
    x: Array,
    rng: Optional[Array] = None,
    deterministic: bool = True,
) -> Array:
    """(B, C, H, W) images → (B, n_class) logits."""
    x = patch_embedding(params["emb"], cfg, x)
    rngs = jax.random.split(rng, cfg.n_layers) if rng is not None else [None] * cfg.n_layers
    for p, r in zip(params["blocks"], rngs):
        x = block(p, cfg, x, r, deterministic)
    x = common.layer_norm(params["encoder_norm"], x, eps=1e-6)
    cls = x[:, 0]
    cls = common.layer_norm(params["ln"], jax.nn.relu(cls))
    return common.dense(params["fc"], cls)


def three_layer_vih_kernel_forward(params, cfg: ViHConfig, x: Array):
    """φ(x) per block — UMHN kernel pre-training path (models.py:82-90)."""
    if cfg.mode != "UMHN":
        raise ValueError("Only UMHN supports kernel forward")
    x = patch_embedding(params["emb"], cfg, x)
    outs = []
    for p in params["blocks"]:
        x, k = block(p, cfg, x, None, True, get_kernel=True)
        outs.append(k)
    return outs


def vih_params(key: Array, cfg: ViHConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    layer = (
        hopfield_params(k2, cfg.hopfield_cfg)
        if cfg.mode == "MHN"
        else learnable_hopfield_params(k2, cfg.hopfield_cfg)
    )
    return {
        "emb": patch_embedding_params(k1, cfg),
        "layer": layer,
        "ln": common.ln_params(cfg.d_model),
        "fc": common.dense_params(k3, cfg.d_model, cfg.n_class),
    }


def vih_forward(params, cfg: ViHConfig, x: Array) -> Array:
    """Single-retrieval ViH: cls token queries the patch memory
    (models.py:143-150)."""
    x = patch_embedding(params["emb"], cfg, x)
    query, memory = x[:, :1], x[:, 1:]
    if cfg.mode == "MHN":
        out = hopfield(params["layer"], cfg.hopfield_cfg, query, memory)
    else:
        out = learnable_hopfield(params["layer"], cfg.hopfield_cfg, query, memory)
    cls = common.layer_norm(params["ln"], jax.nn.relu(out[:, 0]))
    return common.dense(params["fc"], cls)
