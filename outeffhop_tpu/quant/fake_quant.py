"""Uniform fake-quantization with straight-through estimators.

Capability parity with the reference quantizers
(`OutEffHop/quantization/quantizers/uniform_quantizers.py`,
`quantizer_utils.py`), re-designed functionally: a quantizer is not a stateful
nn.Module but a `QParams` pytree (scale + zero point + static grid metadata)
plus pure functions. The reference's 4-state FSM (`qstates.py`) collapses into
*which phase of the calibrate → freeze → run pipeline you are executing*.

Numerics contract (bit-exact with the reference in fp32):
  * asymmetric grid:  int ∈ [0, 2^b - 1], zp = clamp(round(zero_float), grid)
  * symmetric grid:   signed → int ∈ [-2^(b-1), 2^(b-1)-1], zp = 0;
                      unsigned → int ∈ [0, 2^b - 1]
  * fake-quant:       scale * (clamp(round(x/scale) + zp, lo, hi) - zp)
                      with scale = max(delta, eps)  (linear scale domain)
  * range setter clamps: x_min := min(x_min, 0), x_max := max(x_max, eps)
    (`uniform_quantizers.py:198-200`)
  * STE: d(round)/dx = 1 (`quantizer_utils.py:6-16`); LSQ-style gradient
    scaling of (scale, zp) by 1/sqrt(int_max * numel)
    (`quantizer_utils.py:19-27`, `uniform_quantizers.py:150-157`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------
# STE primitives
# --------------------------------------------------------------------------


@jax.custom_jvp
def round_ste(x: Array) -> Array:
    """round-to-nearest-even forward, identity gradient (straight-through)."""
    return jnp.round(x)


@round_ste.defjvp
def _round_ste_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return jnp.round(x), dx


@jax.custom_vjp
def scale_grad(x: Array, g: Array) -> Array:
    """Identity forward; backward multiplies the cotangent by `g` (LSQ)."""
    return x


def _scale_grad_fwd(x, g):
    return x, g


def _scale_grad_bwd(g, ct):
    return ct * g, None


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


# --------------------------------------------------------------------------
# QParams
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QParams:
    """Frozen uniform-quantizer parameters (a pytree; statics are aux data).

    delta/zero_float may be scalars (per-tensor) or shaped for broadcasting
    against the target (per-channel, e.g. (C, 1) for a (C, K) weight).
    """

    delta: Array
    zero_float: Array
    n_bits: int = 8
    symmetric: bool = False
    signed: bool = True  # only meaningful when symmetric
    eps: float = 1e-8
    # "linear" stores delta directly; "log" stores log(delta) so a learned
    # scale stays positive during range training (`AsymmetricUniformQuantizer`
    # scale_domain option, uniform_quantizers.py:30-48)
    scale_domain: str = "linear"

    @property
    def int_min(self) -> float:
        if self.symmetric:
            return -(2.0 ** (self.n_bits - 1)) if self.signed else 0.0
        return 0.0

    @property
    def int_max(self) -> float:
        if self.symmetric:
            pos_bits = self.n_bits - (1 if self.signed else 0)
            return 2.0**pos_bits - 1
        return 2.0**self.n_bits - 1

    @property
    def scale(self) -> Array:
        if self.scale_domain == "log":
            return jnp.exp(self.delta)
        return jnp.maximum(self.delta, self.eps)

    @property
    def zero_point(self) -> Array:
        if self.symmetric:
            return jnp.zeros_like(self.delta)
        zp = round_ste(self.zero_float)
        return jnp.clip(zp, self.int_min, self.int_max)

    @property
    def x_min(self) -> Array:
        return self.scale * (self.int_min - self.zero_point)

    @property
    def x_max(self) -> Array:
        return self.scale * (self.int_max - self.zero_point)

    def storage_dtype(self):
        """Integer dtype for real (non-simulated) quantized storage."""
        if self.n_bits <= 8:
            return jnp.int8 if (self.symmetric and self.signed) else jnp.uint8
        return jnp.int16 if (self.symmetric and self.signed) else jnp.uint16


jax.tree_util.register_dataclass(
    QParams,
    data_fields=["delta", "zero_float"],
    meta_fields=["n_bits", "symmetric", "signed", "eps", "scale_domain"],
)


def _grad_scale_factor(qp: QParams, x: Array, per_channel: bool) -> Array:
    n = x.size / (x.shape[0] if per_channel else 1)
    return (qp.int_max * n) ** -0.5


def fake_quant(
    x: Array,
    qp: QParams,
    grad_scaling: bool = False,
    per_channel: bool = False,
) -> Array:
    """Quantize-dequantize simulation with STE (`uniform_quantizers.py:119-148`)."""
    scale = qp.scale
    zero_point = qp.zero_point
    if grad_scaling:
        g = _grad_scale_factor(qp, x, per_channel)
        scale = scale_grad(scale, g)
        if not qp.symmetric:
            zero_point = scale_grad(zero_point, g)
    x_int = round_ste(x / scale) + zero_point
    x_int = jnp.clip(x_int, qp.int_min, qp.int_max)
    return scale * (x_int - zero_point)


def to_integer(x: Array, qp: QParams) -> Array:
    """Real integer quantization for int8 storage / int8-matmul kernels.

    Matches `to_integer_forward` round-then-clamp order
    (`uniform_quantizers.py:92-117`); returned dtype is int8/uint8 (int16 for
    the int16-LayerNorm policies).
    """
    x_int = jnp.round(x / qp.scale) + qp.zero_point
    x_int = jnp.clip(x_int, qp.int_min, qp.int_max)
    return x_int.astype(qp.storage_dtype())


def dequantize(x_int: Array, qp: QParams) -> Array:
    return qp.scale * (x_int.astype(qp.scale.dtype) - qp.zero_point)


# --------------------------------------------------------------------------
# Range → QParams (freeze step)
# --------------------------------------------------------------------------


def _clamp_min_max(x_min, x_max, eps):
    # Always include zero; avoid zero-width ranges (`uniform_quantizers.py:198-200`)
    x_min = jnp.minimum(x_min, 0.0)
    x_max = jnp.maximum(x_max, eps)
    return x_min, x_max


def qparams_from_range_asymmetric(
    x_min, x_max, n_bits: int = 8, eps: float = 1e-8
) -> QParams:
    """delta = (max-min)/int_max, zero = -min/delta (`set_quant_range`, :204-224)."""
    x_min = jnp.asarray(x_min, dtype=jnp.float32)
    x_max = jnp.asarray(x_max, dtype=jnp.float32)
    x_min, x_max = _clamp_min_max(x_min, x_max, eps)
    int_max = 2.0**n_bits - 1
    delta = (x_max - x_min) / int_max
    zero_float = -x_min / delta
    return QParams(delta=delta, zero_float=zero_float, n_bits=n_bits, symmetric=False, eps=eps)


def qparams_from_range_symmetric(
    x_min, x_max, n_bits: int = 8, eps: float = 1e-8, signed: Optional[bool] = None
) -> QParams:
    """signed = (min(x_min) < 0); delta = absmax/int_max (`set_quant_range`, :287-300).

    `signed` is static grid metadata; when x_min is a traced value pass it
    explicitly (freeze normally happens outside jit, where it is concrete).
    """
    x_min = jnp.asarray(x_min, dtype=jnp.float32)
    x_max = jnp.asarray(x_max, dtype=jnp.float32)
    x_min, x_max = _clamp_min_max(x_min, x_max, eps)
    if signed is None:
        signed = bool(np.asarray(jnp.min(x_min)) < 0)
    pos_bits = n_bits - (1 if signed else 0)
    int_max = 2.0**pos_bits - 1
    absmax = jnp.maximum(jnp.abs(x_min), x_max)
    delta = absmax / int_max
    return QParams(
        delta=delta,
        zero_float=jnp.zeros_like(delta),
        n_bits=n_bits,
        symmetric=True,
        signed=signed,
        eps=eps,
    )


def qparams_from_range(
    x_min, x_max, n_bits: int = 8, symmetric: bool = False, eps: float = 1e-8
) -> QParams:
    if symmetric:
        return qparams_from_range_symmetric(x_min, x_max, n_bits=n_bits, eps=eps)
    return qparams_from_range_asymmetric(x_min, x_max, n_bits=n_bits, eps=eps)


def reshape_per_channel(qp: QParams, ndim: int) -> QParams:
    """Broadcast per-channel (C,) params to (C, 1, ..., 1) for an ndim target
    (`_adjust_params_per_channel`, `uniform_quantizers.py:159-171`)."""
    if qp.delta.ndim == 0:
        return qp
    new_shape = (-1,) + (1,) * (ndim - 1)
    return dataclasses.replace(
        qp,
        delta=qp.delta.reshape(new_shape),
        zero_float=qp.zero_float.reshape(new_shape),
    )
