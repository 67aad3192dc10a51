"""Softmax variants: softmax_n / softmax_1, clipped softmax, and the name registry.

Capability parity with the reference's softmax ops
(`OutEffHop/vutils/softmax_1.py:4-28`, `OutEffHop/transformers_language/models/
softmax.py:10-64`), re-derived for JAX. The key numerics property (documented at
`vutils/softmax_1.py:8`): softmax_n is **not shift-invariant** for n != 0 — the
phantom zero logit in the denominator must be shifted by the same running max as
the real logits, i.e. the denominator's extra term is `n * exp(-max)`.

All functions take `axis` (JAX idiom) rather than torch's `dim`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def softmax_n(x: Array, n: float, axis: int = -1) -> Array:
    """softmax_n(x)_i = exp(x_i) / (n + sum_j exp(x_j)).

    Numerically stabilized by subtracting the per-row max from the logits and
    shifting the phantom `n` zero-logits by the same amount (`n * exp(-max)`),
    matching `vutils/softmax_1.py:4-21` semantics exactly.

    `n` must be a static Python number (it selects the formula via `if n:` at
    trace time — every registry preset and model config supplies a literal);
    a traced `n` raises rather than silently mis-tracing.
    """
    if isinstance(n, jax.core.Tracer):
        raise TypeError(
            "softmax_n requires a static (Python) n; got a traced value — "
            "wrap the call or use jnp.where over both branches"
        )
    m = jnp.max(x, axis=axis, keepdims=True)
    if n:
        # The phantom n zero-logits participate in the max-shift: m >= 0 keeps
        # exp(-m) <= 1, so heavily-masked rows (max logit < -88, where
        # exp(-m) overflows f32 to inf) stay finite. Mathematically exact —
        # softmax_n is invariant to WHICH shift is used as long as the phantom
        # term is shifted identically (`vutils/softmax_1.py:8` semantics).
        m = jnp.maximum(m, jnp.zeros_like(m))
    shifted = x - m
    numerator = jnp.exp(shifted)
    denom = jnp.sum(numerator, axis=axis, keepdims=True)
    if n:
        denom = denom + n * jnp.exp(-m)
    return numerator / denom


def softmax_1(x: Array, axis: int = -1) -> Array:
    """softmax_1(x)_i = exp(x_i) / (1 + sum_j exp(x_j)) — the OutEffHop softmax.

    Equivalent to attending to one extra all-zeros key ("no-op attention"):
    rows may sum to < 1, which is what suppresses activation outliers
    (arXiv:2404.03828). Parity: `vutils/softmax_1.py:24-28`.
    """
    return softmax_n(x, 1.0, axis=axis)


def vanilla_softmax(x: Array, axis: int = -1) -> Array:
    """Standard softmax (registry key "vanilla")."""
    return jax.nn.softmax(x, axis=axis)


def clipped_softmax(x: Array, axis: int = -1, eta: float = 1.1, gamma: float = -0.1) -> Array:
    """clip(softmax(x) * (eta - gamma) + gamma, 0, 1).

    The stretch-then-clip lets attention probabilities reach exactly 0 (and 1),
    which kills the outlier-generating "attend to nothing via a junk token"
    mechanism. Parity: `transformers_language/models/softmax.py:10-13`.
    """
    sm = jax.nn.softmax(x, axis=axis)
    return jnp.clip(sm * (eta - gamma) + gamma, 0.0, 1.0)


def clipped_softmax1(x: Array, axis: int = -1, eta: float = 1.1, gamma: float = -0.1) -> Array:
    """clip(softmax_1(x) * (eta - gamma) + gamma, 0, 1).

    Parity: `transformers_language/models/softmax.py:16-19`.
    """
    sm = softmax_1(x, axis=axis)
    return jnp.clip(sm * (eta - gamma) + gamma, 0.0, 1.0)


def _clipped(gamma: float, eta: float) -> Callable[..., Array]:
    return partial(clipped_softmax, gamma=gamma, eta=eta)


def _clipped1(gamma: float, eta: float) -> Callable[..., Array]:
    return partial(clipped_softmax1, gamma=gamma, eta=eta)


def _entmax15(x: Array, axis: int = -1) -> Array:
    # Local import to avoid a cycle (entmax module is independent).
    from outeffhop_tpu.ops.entmax import entmax15

    return entmax15(x, axis=axis)


# name → (softmax_n, clip) decomposition for every preset the fused Pallas
# attention kernels can compute in-kernel (softmax_n core + optional
# stretch-and-clip epilogue). Filled alongside SOFTMAX_MAPPING so the two
# registries cannot drift; entmax is absent (sort-based, XLA path only).
SOFTMAX_FUSED_PARAMS: Dict[str, tuple] = {}


def fused_softmax_spec(name, alpha=None, max_seq_length=None, alpha_softmax1=False):
    """(softmax_n, clip) for a softmax variant the flash kernels can fuse,
    or None if the variant (or a callable) has no in-kernel decomposition.

    `alpha` implements the reference's α-mode (clipped softmax with
    γ=-α/max_seq_length, η=1.0 — `bert_attention.py:89-94`; the
    `alpha_softmax1` opt-in mirrors `OPTConfig.softmax_fn`)."""
    if alpha is not None:
        if max_seq_length is None:
            return None
        return (1.0 if alpha_softmax1 else 0.0, (-alpha / max_seq_length, 1.0))
    if callable(name):
        return None
    return SOFTMAX_FUSED_PARAMS.get(name)


def _build_softmax_mapping() -> Dict[str, Callable[..., Array]]:
    """Name → callable registry with the same keys as the reference's
    `SOFTMAX_MAPPING` (`transformers_language/models/softmax.py:22-64`), so CLI
    strings like `--attn_softmax "clipped(-.025:1)"` are drop-in compatible.

    Two reference-preserved quirks (names don't match params; kept for
    checkpoint/CLI compatibility, documented rather than silently "fixed"):
      * "clipped(-.005:1.005)" maps to gamma=-0.003 (softmax.py:53)
      * "clippedsoftmax1(-.025:1)" maps to eta=1.1 (softmax.py:61)
    """
    mapping: Dict[str, Callable[..., Array]] = {
        "vanilla": vanilla_softmax,
        "softmax1": softmax_1,
        "entmax": _entmax15,
    }
    SOFTMAX_FUSED_PARAMS["vanilla"] = (0.0, None)
    SOFTMAX_FUSED_PARAMS["softmax1"] = (1.0, None)

    def _reg(key, fn, n, gamma, eta):
        mapping[key] = fn
        SOFTMAX_FUSED_PARAMS[key] = (n, (gamma, eta))

    for eta in (1.0003, 1.001, 1.002, 1.003, 1.004, 1.01, 1.02, 1.03, 1.1):
        _reg(f"clipped(0:{_fmt(eta)})", _clipped(0.0, eta), 0.0, 0.0, eta)
    for gamma in (
        -0.1, -0.00001, -0.00003, -0.0001, -0.0003, -0.0005, -0.001, -0.002,
        -0.0025, -0.003, -0.004, -0.005, -0.01, -0.015, -0.02, -0.025, -0.03,
        -0.04,
    ):
        _reg(f"clipped({_fmt_gamma(gamma)}:1)", _clipped(gamma, 1.0), 0.0, gamma, 1.0)
    for gamma, eta in (
        (-0.001, 1.001),
        (-0.002, 1.002),
        (-0.003, 1.003),
        (-0.003, 1.005),  # registry key says -.005 — reference quirk preserved
        (-0.01, 1.01),
        (-0.03, 1.03),
        (-0.1, 1.1),
    ):
        key_gamma = -0.005 if eta == 1.005 else gamma
        _reg(
            f"clipped({_fmt_gamma(key_gamma)}:{_fmt(eta)})",
            _clipped(gamma, eta), 0.0, gamma, eta,
        )
    # eta=1.1 quirk preserved (softmax.py:61)
    _reg("clippedsoftmax1(-.025:1)", _clipped1(-0.025, 1.1), 1.0, -0.025, 1.1)
    _reg("clippedsoftmax1(-.00001:1)", _clipped1(-0.00001, 1.0), 1.0, -0.00001, 1.0)
    _reg("clippedsoftmax1(-.0001:1)", _clipped1(-0.0001, 1.0), 1.0, -0.0001, 1.0)
    return mapping


def _fmt(eta: float) -> str:
    # 1.0003 → "1.0003", 1.0 → "1"
    s = f"{eta:g}"
    return s


def _fmt_gamma(gamma: float) -> str:
    # -0.025 → "-.025", -0.00001 → "-.00001" (reference keys drop the leading 0)
    s = f"{gamma:.10f}".rstrip("0")
    s = s.replace("-0.", "-.")
    return s


SOFTMAX_MAPPING: Dict[str, Callable[..., Array]] = _build_softmax_mapping()


def resolve_softmax(name_or_fn) -> Callable[..., Array]:
    """Accept either a registry name or a callable; return the callable."""
    if callable(name_or_fn):
        return name_or_fn
    try:
        return SOFTMAX_MAPPING[name_or_fn]
    except KeyError:
        raise KeyError(
            f"Unknown softmax variant {name_or_fn!r}; known: {sorted(SOFTMAX_MAPPING)}"
        ) from None


def alpha_clipped_softmax(alpha: float, max_seq_length: int) -> Callable[..., Array]:
    """The reference's `--alpha` mode: clipped softmax with gamma = -alpha/L,
    eta = 1.0 (`bert_attention.py:89-94`)."""
    gamma = -alpha / max_seq_length
    return partial(clipped_softmax, gamma=gamma, eta=1.0)
