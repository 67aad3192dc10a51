"""Outlier telemetry: activation ∞-norms and kurtosis, plus the probe tape.

Parity with the reference's signature instrumentation subsystem:
  * `kurtosis` (`transformers_language/utils.py:9-20`): per-row
    E[(x-mu)^4] / (std^4 + eps) with the **unbiased** (N-1) std, matching
    torch's `Tensor.std` default.
  * activation ∞-norms at named probe points (`validate_mlm_config.py:501-567`).

The reference uses forward hooks on nn.Identity probes; here a `ProbeTape` is
threaded through forwards explicitly — under `jit` the recorded values become
auxiliary outputs, which XLA dead-code-eliminates when the tape is disabled.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def kurtosis(x: Array, eps: float = 1e-6) -> Array:
    """Per-row kurtosis of a (B, d) array: E[(x-mu)^4] / (std^4 + eps).

    Uses the unbiased (ddof=1) standard deviation to match torch `x.std(dim=1)`
    in the reference (`transformers_language/utils.py:9-20`).
    """
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    s = jnp.std(x, axis=1, ddof=1)
    mu4 = jnp.mean((x - mu) ** 4.0, axis=1)
    return mu4 / (s**4.0 + eps)


def inf_norm(x: Array) -> Array:
    """Scalar ∞-norm: max |x| over all elements."""
    return jnp.max(jnp.abs(x))


class ProbeTape:
    """Explicit replacement for the reference's `attach_act_hooks` +
    nn.Identity probe modules (`bert_attention.py:78-81`,
    `validate_mlm_config.py:62-75`).

    Model forwards call `tape.record(name, value)` at stable probe points
    (e.g. "layer3.attn_scores", "layer3.output.LayerNorm"). When `enabled`,
    values (or reduced statistics of them) are captured into `.values`, which
    the caller returns as an aux pytree from the jitted function. When
    disabled, `record` is a no-op, so probes cost nothing.

    `mode`:
      * "stats"  — record (inf_norm, kurtosis-mean) per probe (cheap, default)
      * "full"   — record the raw array (for numerics tests)
    """

    def __init__(self, enabled: bool = True, mode: str = "stats"):
        assert mode in ("stats", "full")
        self.enabled = enabled
        self.mode = mode
        self.values: Dict[str, Array] = {}

    def record(self, name: str, value: Array) -> Array:
        if not self.enabled:
            return value
        if self.mode == "full":
            self.values[name] = value
        else:
            flat = value.reshape(-1, value.shape[-1])
            self.values[name + "|inf_norm"] = inf_norm(value)
            if value.shape[-1] >= 2:  # ddof=1 std is undefined on singletons
                self.values[name + "|kurtosis"] = jnp.mean(kurtosis(flat))
        return value

    def scoped(self, prefix: str) -> "ScopedTape":
        return ScopedTape(self, prefix)


class ScopedTape:
    """Prefix-namespaced view of a ProbeTape (per-layer naming)."""

    def __init__(self, tape: Optional[ProbeTape], prefix: str):
        self._tape = tape
        self._prefix = prefix

    @property
    def enabled(self) -> bool:
        return self._tape is not None and self._tape.enabled

    def record(self, name: str, value: Array) -> Array:
        if self._tape is None:
            return value
        full = f"{self._prefix}.{name}" if self._prefix else name
        return self._tape.record(full, value)

    def scoped(self, prefix: str) -> "ScopedTape":
        new = f"{self._prefix}.{prefix}" if self._prefix else prefix
        return ScopedTape(self._tape, new)


NULL_TAPE = ScopedTape(None, "")
