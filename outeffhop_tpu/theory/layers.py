"""Hopfield retrieval layers for the theory-verification experiments.

Functional re-design of `theory_verification/layers.py`:

  * `association` — the attention/retrieval core (layers.py:90-123):
    einsum(blhe,bshe→bhls), optional score L2-normalization (only when
    H==1, used by `hopfield_layer`), scale 1/√E, mode-selected activation,
    einsum(bhls,bshd→blhd);
  * `hopfield` (layers.py:125-177) — Q/K projections; **values =
    value_proj(key_proj(Y))** (the Hopfield association form, :161-163);
    `update_steps` retrieval iterations re-feed the retrieved state as the
    next query;
  * `hopfield_pooling` (layers.py:179-252) — a learnable (num_pattern,
    d_model) prototype/query bank;
  * `hopfield_layer` (layers.py:254-305) — projection-free retrieval with
    normalized scores;
  * `learnable_hopfield` (layers.py:307-367) — the U-MHN layer: a learnable
    linear kernel φ applied to queries and memory before projection
    (queries = Wq·φ(R), keys = Wk·φ(Y), values = Wv·Y), plus
    `uniform_forward` (:341-343) exposing φ(Y) for kernel pre-training.

TPU-first: retrieval iterations run under `lax.scan`; activations are the
shared `outeffhop_tpu.ops` implementations (softmax_1, entmax15, sparsemax
— exact threshold-and-support, sort-based, fine at these sizes).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.models import common
from outeffhop_tpu.ops.entmax import entmax15, sparsemax
from outeffhop_tpu.ops.softmax_variants import softmax_1

Array = jax.Array

RETRIEVAL_MODES = ("softmax", "softmax1", "sparsemax", "entmax")


def _mode_activation(mode: str) -> Callable[..., Array]:
    if mode == "softmax":
        return jax.nn.softmax
    if mode == "softmax1":
        return softmax_1
    if mode == "sparsemax":
        return sparsemax
    if mode == "entmax":
        return entmax15
    raise ValueError(f"mode must be one of {RETRIEVAL_MODES}, got {mode!r}")


@dataclasses.dataclass(frozen=True)
class HopfieldConfig:
    d_model: int
    n_heads: int = 1
    d_keys: Optional[int] = None
    d_values: Optional[int] = None
    update_steps: int = 1
    mode: str = "softmax"
    scale: Optional[float] = None
    num_pattern: int = 1  # hopfield_pooling prototype count

    @property
    def dk(self) -> int:
        return self.d_keys or self.d_model // self.n_heads

    @property
    def dv(self) -> int:
        return self.d_values or self.d_model // self.n_heads


# ---------------------------------------------------------------------------
# Association core (layers.py:90-123)
# ---------------------------------------------------------------------------


def association(
    cfg: HopfieldConfig,
    queries: Array,  # (B, L, H, E)
    keys: Array,  # (B, S, H, E)
    values: Array,  # (B, S, H, D)
    mask: Optional[Array] = None,  # (B, S) True = masked out
    norm: bool = False,
) -> Array:
    E = queries.shape[-1]
    H = queries.shape[2]
    scale = cfg.scale if cfg.scale is not None else 1.0 / jnp.sqrt(jnp.asarray(E, queries.dtype))
    scores = jnp.einsum("blhe,bshe->bhls", queries, keys)
    if norm and H == 1:
        # F.normalize over the last axis (layers.py:113-114)
        scores = scores / jnp.maximum(jnp.linalg.norm(scores, axis=-1, keepdims=True), 1e-12)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -jnp.inf, scores)
    probs = _mode_activation(cfg.mode)(scale * scores, axis=-1)
    return jnp.einsum("bhls,bshd->blhd", probs, values)


def _iterate_retrieval(
    cfg: HopfieldConfig, queries: Array, keys: Array, values: Array, mask, norm: bool = False
) -> Array:
    """Run cfg.update_steps retrieval iterations; the retrieved state becomes
    the next query (layers.py:165-173). Requires E == D (true for all
    reference configs); iterated under lax.scan for a single trace."""
    if cfg.update_steps == 1:
        return association(cfg, queries, keys, values, mask, norm=norm)

    def body(q, _):
        return association(cfg, q, keys, values, mask, norm=norm), None

    out, _ = jax.lax.scan(body, queries, None, length=cfg.update_steps)
    return out


# ---------------------------------------------------------------------------
# Hopfield (layers.py:125-177)
# ---------------------------------------------------------------------------


def hopfield_params(key: Array, cfg: HopfieldConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "query_projection": common.dense_params(k1, cfg.d_model, cfg.dk * cfg.n_heads),
        "key_projection": common.dense_params(k2, cfg.d_model, cfg.dk * cfg.n_heads),
        "value_projection": common.dense_params(k3, cfg.dv * cfg.n_heads, cfg.dv * cfg.n_heads),
        "out_projection": common.dense_params(k4, cfg.dv * cfg.n_heads, cfg.d_model),
    }


def hopfield(params, cfg: HopfieldConfig, R: Array, Y: Array, mask=None) -> Array:
    """R: (B, L, d_model) state patterns; Y: (B, S, d_model) stored patterns."""
    B, L, _ = R.shape
    S = Y.shape[1]
    H = cfg.n_heads
    queries = common.dense(params["query_projection"], R).reshape(B, L, H, -1)
    keys_flat = common.dense(params["key_projection"], Y)
    values = common.dense(params["value_projection"], keys_flat).reshape(B, S, H, -1)
    keys = keys_flat.reshape(B, S, H, -1)
    out = _iterate_retrieval(cfg, queries, keys, values, mask)
    return common.dense(params["out_projection"], out.reshape(B, L, -1))


# ---------------------------------------------------------------------------
# HopfieldPooling (layers.py:179-252)
# ---------------------------------------------------------------------------


def hopfield_pooling_params(key: Array, cfg: HopfieldConfig):
    k1, k2 = jax.random.split(key)
    p = hopfield_params(k1, cfg)
    p["query"] = jax.random.normal(k2, (1, cfg.num_pattern, cfg.d_model), jnp.float32)
    return p


def hopfield_pooling(params, cfg: HopfieldConfig, Y: Array, mask=None) -> Array:
    """Pool S stored patterns into num_pattern retrieved prototypes."""
    B, S, _ = Y.shape
    H = cfg.n_heads
    L = cfg.num_pattern
    q = jnp.broadcast_to(params["query"], (B, L, cfg.d_model))
    queries = common.dense(params["query_projection"], q).reshape(B, L, H, -1)
    keys_flat = common.dense(params["key_projection"], Y)
    values = common.dense(params["value_projection"], keys_flat).reshape(B, S, H, -1)
    keys = keys_flat.reshape(B, S, H, -1)
    out = _iterate_retrieval(cfg, queries, keys, values, mask)
    return common.dense(params["out_projection"], out.reshape(B, L, -1))


# ---------------------------------------------------------------------------
# HopfieldLayer — projection-free, normalized scores (layers.py:254-305)
# ---------------------------------------------------------------------------


def hopfield_layer(cfg: HopfieldConfig, R: Array, Y: Array) -> Array:
    """Parameter-free retrieval: heads are a pure reshape of d_model, scores
    L2-normalized when single-head (Association(norm=True), layers.py:275)."""
    B, L, _ = R.shape
    S = Y.shape[1]
    H = cfg.n_heads
    queries = R.reshape(B, L, H, -1)
    keys = Y.reshape(B, S, H, -1)
    values = Y.reshape(B, S, H, -1)
    out = _iterate_retrieval(cfg, queries, keys, values, None, norm=True)
    return out.reshape(B, L, -1)


# ---------------------------------------------------------------------------
# LearnableHopfield — U-MHN with a trainable linear kernel (layers.py:307-367)
# ---------------------------------------------------------------------------


def learnable_hopfield_params(key: Array, cfg: HopfieldConfig):
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    return {
        "kernel": common.dense_params(k0, cfg.d_model, cfg.d_model),
        "query_projection": common.dense_params(k1, cfg.d_model, cfg.dk * cfg.n_heads),
        "key_projection": common.dense_params(k2, cfg.d_model, cfg.dk * cfg.n_heads),
        "value_projection": common.dense_params(k3, cfg.d_model, cfg.dv * cfg.n_heads),
        "out_projection": common.dense_params(k4, cfg.dv * cfg.n_heads, cfg.d_model),
    }


def learnable_hopfield_uniform_forward(params, Y: Array) -> Array:
    """φ(Y) — exposed for uniformity pre-training of the kernel
    (layers.py:341-343, plotting.py `learn_kernel`)."""
    return common.dense(params["kernel"], Y)


def learnable_hopfield(params, cfg: HopfieldConfig, R: Array, Y: Array, mask=None) -> Array:
    B, L, _ = R.shape
    S = Y.shape[1]
    H = cfg.n_heads
    phi_R = common.dense(params["kernel"], R)
    phi_Y = common.dense(params["kernel"], Y)
    queries = common.dense(params["query_projection"], phi_R).reshape(B, L, H, -1)
    keys = common.dense(params["key_projection"], phi_Y).reshape(B, S, H, -1)
    values = common.dense(params["value_projection"], Y).reshape(B, S, H, -1)
    out = _iterate_retrieval(cfg, queries, keys, values, mask)
    return common.dense(params["out_projection"], out.reshape(B, L, -1))
