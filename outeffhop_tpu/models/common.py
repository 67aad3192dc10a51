"""Functional building blocks shared by all model families.

Each block is a pure function over a param sub-pytree, threading a
`ScopedQuantCtx` (quant sites) and a `ScopedTape` (telemetry probes). The
quant-site placement mirrors the reference's `QuantizationHijacker` semantics
(`quantization/hijacker.py:78-82`): quantize weights → run op → (fold the
adjacent activation function) → quantize output activations. Biases stay FP,
as in the reference (the hijacker only quantizes `weight`).

Parameter layout convention: Linear kernels are stored (out_features,
in_features) — the torch layout — so HF checkpoint conversion is a copy and
per-channel weight quantization is along axis 0 in both frameworks.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.ops.telemetry import NULL_TAPE, ScopedTape
from outeffhop_tpu.quant.calibrate import NULL_QCTX, ScopedQuantCtx
from outeffhop_tpu.quant.fake_quant import round_ste

Array = jax.Array


# --------------------------------------------------------------------------
# Param initializers
# --------------------------------------------------------------------------


def checkpoint_layer(fn, remat):
    """jax.checkpoint wrapper for the per-layer remat flag, which is
    False | True | "full" | "dots". "dots" uses XLA's
    dots_with_no_batch_dims_saveable policy: matmul outputs are SAVED and
    only the cheap elementwise/norm work recomputes — a much lower recompute
    tax than full remat (probe27: full remat cost 17-26% of the ViT step)
    for a modest part of the memory saving."""
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    return jax.checkpoint(fn)


def dense_params(key, in_features: int, out_features: int, std: float = 0.02):
    kw, _ = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (out_features, in_features), jnp.float32) * std,
        "bias": jnp.zeros((out_features,), jnp.float32),
    }


def ln_params(dim: int):
    return {
        "weight": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def embedding_params(key, num_embeddings: int, dim: int, std: float = 0.02):
    return {"weight": jax.random.normal(key, (num_embeddings, dim), jnp.float32) * std}


# --------------------------------------------------------------------------
# Functional layers with quant sites
# --------------------------------------------------------------------------


def dense(
    params,
    x: Array,
    q: ScopedQuantCtx = NULL_QCTX,
    name: str = "dense",
    activation: Optional[Callable[[Array], Array]] = None,
) -> Array:
    """Linear (+ optionally folded activation fn) with weight & output-act
    quant sites — the `QuantLinear` hijack (`autoquant_utils.py:17-19`,
    `hijacker.py:78-82`). When the run-mode ctx carries a frozen `Int8Dense`
    for this site, the matmul executes as a real int8×int8→int32 MXU op with
    dynamic per-tensor input quantization (quant/int8_exec.py) instead of the
    fake-quant simulation."""
    ip = q.int8_for(name)
    if ip is not None:
        from outeffhop_tpu.quant.int8_exec import int8_dense_apply

        y = int8_dense_apply(ip, x)
        if ip.bias is None and params.get("bias") is not None:
            # Int8Dense built from discovered weights only: the float bias
            # still lives in the param pytree — add it here
            y = y + params["bias"]
        if activation is not None:
            y = activation(y)
        return q.act(name, y)
    w = q.weight(name, params["weight"], per_channel_axis=0)
    y = x @ w.T + params["bias"]
    if activation is not None:
        y = activation(y)
    return q.act(name, y)


# Embedding-table backward formulation. False (default): jnp.take's native
# scatter-add — the A/B (probe31) MEASURED it 0.8 ms FASTER than the one-hot
# MXU matmul on the BERT-base MLM step (28.62 vs 29.46 ms): XLA's TPU
# scatter handles 4k updates into a 23 MB table fine, while the matmul pays
# a (tokens, vocab) one-hot materialization + 192 GFLOP. probe28's "4.8 ms
# scatter cost" signal was a loop-hoisting artifact (see CLAUDE.md). The
# matmul path stays for re-measurement at other scales.
_EMBED_MATMUL_BWD = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _embed_lookup_impl(spec, w: Array, ids: Array) -> Array:
    del spec
    return jnp.take(w, ids, axis=0)


def _embed_lookup_fwd(spec, w, ids):
    del spec
    return jnp.take(w, ids, axis=0), ids


def _embed_lookup_bwd(spec, ids, g):
    vocab, wdtype = spec
    flat = ids.reshape(-1)                      # (N,)
    gf = g.reshape(-1, g.shape[-1])             # (N, H)
    # dW[v] = Σ_{i: ids_i = v} g_i  as  one_hot(ids)^T @ g — an MXU matmul
    # with f32 accumulation (order-independent, unlike the scatter)
    oh = jax.nn.one_hot(flat, vocab, dtype=gf.dtype)
    dw = jax.lax.dot_general(
        oh, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dw.astype(wdtype), None


_embed_lookup_impl.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


def _embed_lookup(w: Array, ids: Array) -> Array:
    return _embed_lookup_impl((w.shape[0], str(w.dtype)), w, ids)


def embedding(
    params,
    ids: Array,
    q: ScopedQuantCtx = NULL_QCTX,
    name: str = "embedding",
) -> Array:
    """Embedding lookup with weight quantization only — the output IS the
    (already quantized) weight rows, so no act quantizer (`QuantEmbedding`,
    `autoquant_utils.py:75-92`)."""
    w = q.weight(name, params["weight"], per_channel_axis=None)
    if _EMBED_MATMUL_BWD:
        return _embed_lookup(w, ids)
    return jnp.take(w, ids, axis=0)


def layer_norm(params, x: Array, eps: float = 1e-12) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * params["weight"] + params["bias"]


def quant_layer_norm(
    params,
    x: Array,
    q: ScopedQuantCtx = NULL_QCTX,
    name: str = "ln",
    eps: float = 1e-12,
) -> Array:
    """Hijacked LayerNorm: gamma weight-quantized, output act-quantized
    (`QuantLayerNorm` in `autoquant_utils.py:63-71`). This is the default LN
    quantization everywhere; the fully decomposed variant is below."""
    gamma = q.weight(name, params["weight"], per_channel_axis=None)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * gamma + params["bias"]
    return q.act(name, y)


def _dynamic_symmetric_fake_quant(x: Array, n_bits: int) -> Array:
    """On-the-fly symmetric current-minmax fake-quant, branchless in the
    signedness (works on traced tensors). Used for LN gamma/beta inside the
    decomposed LN (`quantized_bert.py:126-141` builds a fresh
    SymmetricUniformQuantizer + CurrentMinMaxEstimator per forward)."""
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 1e-8)
    signed = x_min < 0  # traced
    int_max = jnp.where(signed, 2.0 ** (n_bits - 1) - 1, 2.0**n_bits - 1)
    int_min = jnp.where(signed, -(2.0 ** (n_bits - 1)), 0.0)
    absmax = jnp.maximum(jnp.abs(x_min), x_max)
    delta = jnp.maximum(absmax / int_max, 1e-8)
    x_int = jnp.clip(round_ste(x / delta), int_min, int_max)
    return delta * x_int


def decomposed_quant_layer_norm(
    params,
    x: Array,
    q: ScopedQuantCtx,
    name: str = "ln",
    mu_site: Optional[str] = None,
    ver: str = "v1",
    n_bits_params: int = 8,
    eps: float = 1e-12,
) -> Array:
    """Fully decomposed quantized LayerNorm — every intermediate quantized
    (`quantized_bert.QuantLayerNorm`, quantized_bert.py:78-143):

        mu → (input quantizer) ; u = x - mu → binary-bits site
        v1: S = E[x^2], mu² , Σ = relu(S - mu²)  (each unary-bits sites)
        v2: Σ = E[u²]
        v = rsqrt(Σ + 1e-12) ; w = u·v ; y = w·γq + βq  (binary-bits sites)
        γ, β freshly symmetric-quantized from their own minmax each call.

    `mu_site` names the *input* activation quantizer to reuse for mu (the
    reference passes the upstream quantizer instance; folding mu through the
    same named site reproduces the shared-range semantics).
    """
    if not q.enabled:
        return layer_norm(params, x, eps)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    if mu_site is not None:
        mu = q.act(mu_site, mu)
    else:
        mu = q.act(f"{name}.mu", mu)
    u_q = q.act(f"{name}.u", x - mu, kind="ln_binary")
    if ver == "v1":
        s_q = q.act(f"{name}.S", jnp.mean(jnp.square(x), axis=-1, keepdims=True), kind="ln_unary")
        mu2_q = q.act(f"{name}.mu2", mu * mu, kind="ln_unary")
        sigma_q = q.act(f"{name}.Sigma", jax.nn.relu(s_q - mu2_q), kind="ln_unary")
    elif ver == "v2":
        sigma_q = q.act(
            f"{name}.Sigma", jnp.mean(jnp.square(u_q), axis=-1, keepdims=True), kind="ln_unary"
        )
    else:
        raise NotImplementedError(f"layer_norm_ver {ver!r}")
    v_q = q.act(f"{name}.v", jax.lax.rsqrt(sigma_q + eps), kind="ln_unary")
    w_q = q.act(f"{name}.w", u_q * v_q, kind="ln_binary")
    gamma_q = _dynamic_symmetric_fake_quant(params["weight"], n_bits_params)
    beta_q = _dynamic_symmetric_fake_quant(params["bias"], n_bits_params)
    return q.act(f"{name}.y", w_q * gamma_q + beta_q, kind="ln_binary")


# Dropout random-bit width. 32 (default): jax.random.bernoulli — one 32-bit
# word per element from the PRNG (rbg/threefry). 8: ceil(n/4) 32-bit words
# bitcast to uint8 thresholds — 4x less generated-bits traffic (the rbg
# dropout tax was 2.5 ms of the BERT train step, probe28b). The keep
# probability rounds to t/256 (t = round(keep*256)) and the survivor rescale
# uses 256/t, so E[dropout(x)] == x stays EXACT; only the keep probability
# itself moves by <1/512 (e.g. 0.9 -> 229.5/256 ~ 0.8984). Opt in via
# --dropout_rng_bits 8 (set_dropout_rng_bits).
_DROPOUT_RNG_BITS = 32


def set_dropout_rng_bits(bits: int) -> None:
    global _DROPOUT_RNG_BITS
    if bits not in (8, 32):
        raise ValueError("dropout_rng_bits must be 8 or 32")
    _DROPOUT_RNG_BITS = bits


def dropout(x: Array, rate: float, rng: Optional[Array], deterministic: bool) -> Array:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    if _DROPOUT_RNG_BITS == 8:
        t = int(round(keep * 256))
        if t >= 256:  # keep prob rounds to 1: dropout is a no-op
            return x
        t = max(t, 1)
        n = x.size
        n_words = -(-n // 4)
        words = jax.random.bits(rng, (n_words,), jnp.uint32)
        u8 = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)
        u8 = u8[:n].reshape(x.shape)
        return jnp.where(u8 < jnp.uint8(t), x * (256.0 / t), 0.0)
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def gelu(x: Array) -> Array:
    """Exact (erf) GELU — HF BERT's default `gelu` activation."""
    return jax.nn.gelu(x, approximate=False)
