"""Entmax family: entmax15 (exact, sort-based), sparsemax, entmax-bisect.

Capability parity with `OutEffHop/vutils/entmax.py` (entmax15/sparsemax exact
algorithms, Peters et al. 2019 / Martins & Astudillo 2016) and
`STanHop_time_seeries/cross_models/entmax.py` (bisection alpha-entmax with a
learnable, differentiable alpha). Re-derived for JAX with `jax.custom_vjp`
backward passes matching the reference autograd Functions:

  * entmax15 backward:  gppr = sqrt(Y); dX = dY*gppr - (sum(dY*gppr)/sum(gppr))*gppr
    (`vutils/entmax.py:175-183`)
  * sparsemax backward: dX = where(Y>0, dY - mean_{support}(dY), 0)
    (`vutils/entmax.py:150-159`)
  * entmax_bisect backward incl. d/d_alpha (`cross_models/entmax.py:105-133`)

TPU note: these require a sort (or 50-iter bisection) along the softmax axis —
fine for STanHop-scale sequence lengths; they are intentionally kept OUT of the
flash-attention fast path (the reference likewise only uses them in STanHop and
as a BERT option).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _move_axis_last(x: Array, axis: int):
    axis = axis % x.ndim
    if axis == x.ndim - 1:
        return x, lambda y: y
    moved = jnp.moveaxis(x, axis, -1)
    return moved, lambda y: jnp.moveaxis(y, -1, axis)


# --------------------------------------------------------------------------
# entmax15 (alpha = 1.5), exact sort-based
# --------------------------------------------------------------------------


def _entmax15_threshold(x_half: Array) -> Array:
    """tau* for 1.5-entmax on the last axis; x_half is already (x - max)/2.

    Sorted-support algorithm (`vutils/entmax.py:82-133`): for each prefix of the
    descending sort compute mean / mean-of-squares, candidate tau = mean -
    sqrt((1 - rho*(meansq - mean^2))/rho), and pick the largest support where
    tau <= sorted value.
    """
    xsrt = -jnp.sort(-x_half, axis=-1)  # descending
    d = x_half.shape[-1]
    rho = jnp.arange(1, d + 1, dtype=x_half.dtype)
    mean = jnp.cumsum(xsrt, axis=-1) / rho
    mean_sq = jnp.cumsum(xsrt * xsrt, axis=-1) / rho
    ss = rho * (mean_sq - mean * mean)
    delta = (1.0 - ss) / rho
    tau = mean - jnp.sqrt(jnp.maximum(delta, 0.0))
    support_size = jnp.sum((tau <= xsrt).astype(jnp.int32), axis=-1, keepdims=True)
    tau_star = jnp.take_along_axis(tau, support_size - 1, axis=-1)
    return tau_star


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _entmax15_last(x: Array, _unused: int = 0) -> Array:
    m = jnp.max(x, axis=-1, keepdims=True)
    xs = (x - m) / 2.0
    tau_star = _entmax15_threshold(xs)
    y = jnp.square(jnp.maximum(xs - tau_star, 0.0))
    return y


def _entmax15_fwd(x, _unused):
    y = _entmax15_last(x, _unused)
    return y, y


def _entmax15_bwd(_unused, y, dy):
    gppr = jnp.sqrt(y)
    dx = dy * gppr
    q = jnp.sum(dx, axis=-1, keepdims=True) / jnp.sum(gppr, axis=-1, keepdims=True)
    dx = dx - q * gppr
    return (dx,)


_entmax15_last.defvjp(_entmax15_fwd, _entmax15_bwd)


def entmax15(x: Array, axis: int = -1) -> Array:
    """1.5-entmax: sparse normalizing transform; rows sum to 1, may have exact 0s."""
    moved, back = _move_axis_last(x, axis)
    return back(_entmax15_last(moved))


# --------------------------------------------------------------------------
# sparsemax (alpha = 2), exact sort-based
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sparsemax_last(x: Array, _unused: int = 0) -> Array:
    m = jnp.max(x, axis=-1, keepdims=True)
    xs = x - m
    xsrt = -jnp.sort(-xs, axis=-1)
    d = xs.shape[-1]
    rho = jnp.arange(1, d + 1, dtype=xs.dtype)
    cumsum_m1 = jnp.cumsum(xsrt, axis=-1) - 1.0
    support = rho * xsrt > cumsum_m1
    support_size = jnp.sum(support.astype(jnp.int32), axis=-1, keepdims=True)
    tau = jnp.take_along_axis(cumsum_m1, support_size - 1, axis=-1) / support_size.astype(
        xs.dtype
    )
    return jnp.maximum(xs - tau, 0.0)


def _sparsemax_fwd(x, _unused):
    y = _sparsemax_last(x, _unused)
    return y, y


def _sparsemax_bwd(_unused, y, dy):
    nonzero = y > 0
    masked = jnp.where(nonzero, dy, 0.0)
    support_size = jnp.sum(nonzero.astype(y.dtype), axis=-1, keepdims=True)
    v_hat = jnp.sum(masked, axis=-1, keepdims=True) / support_size
    dx = jnp.where(nonzero, dy - v_hat, 0.0)
    return (dx,)


_sparsemax_last.defvjp(_sparsemax_fwd, _sparsemax_bwd)


def sparsemax(x: Array, axis: int = -1) -> Array:
    """sparsemax: Euclidean projection of x onto the probability simplex."""
    moved, back = _move_axis_last(x, axis)
    return back(_sparsemax_last(moved))


# --------------------------------------------------------------------------
# entmax-bisect (general alpha, differentiable w.r.t. alpha)
# --------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _entmax_bisect_last(x: Array, alpha: Array, n_iter: int) -> Array:
    return _entmax_bisect_impl(x, alpha, n_iter)


def _entmax_bisect_impl(x: Array, alpha: Array, n_iter: int) -> Array:
    # alpha has x.shape with last axis = 1.
    d = x.shape[-1]
    xa = x * (alpha - 1.0)
    max_val = jnp.max(xa, axis=-1, keepdims=True)
    # gp(y, alpha) = y**(alpha-1); tau bracket [max-1, max-(1/d)^(alpha-1)]
    tau_lo = max_val - 1.0
    tau_hi = max_val - (1.0 / d) ** (alpha - 1.0)

    def p_of(tau):
        return jnp.maximum(xa - tau, 0.0) ** (1.0 / (alpha - 1.0))

    f_lo = jnp.sum(p_of(tau_lo), axis=-1, keepdims=True) - 1.0
    dm0 = tau_hi - tau_lo

    def body(_, carry):
        dm, tau_lo = carry
        dm = dm / 2.0
        tau_m = tau_lo + dm
        p_m = p_of(tau_m)
        f_m = jnp.sum(p_m, axis=-1, keepdims=True) - 1.0
        mask = f_m * f_lo >= 0
        tau_lo = jnp.where(mask, tau_m, tau_lo)
        return dm, tau_lo

    dm, tau_lo = jax.lax.fori_loop(0, n_iter, body, (dm0, tau_lo))
    # Reference returns p at the LAST midpoint (tau_lo + dm of the final iter
    # before the where-update), i.e. recompute at tau_lo + 0 after update ==
    # p(tau_m of last iter) when mask true. To match exactly: the final p_m is
    # p(tau_lo_final) when the last mask was True, else p(tau_lo_final + dm)...
    # The reference's returned p_m corresponds to the final tau_m = (pre-update
    # tau_lo) + dm_final; after the update tau_lo is either tau_m (mask) or the
    # old tau_lo. We instead recompute at the midpoint of the final bracket,
    # identical to the last tau_m by construction of the loop above:
    p = p_of(tau_lo)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # ensure_sum_one
    return p


def _entmax_bisect_fwd(x, alpha, n_iter):
    y = _entmax_bisect_impl(x, alpha, n_iter)
    return y, (y, alpha)


def _entmax_bisect_bwd(n_iter, res, dy):
    y, alpha = res
    gppr = jnp.where(y > 0, y ** (2.0 - alpha), 0.0)
    dx = dy * gppr
    q = jnp.sum(dx, axis=-1, keepdims=True) / jnp.sum(gppr, axis=-1, keepdims=True)
    dx = dx - q * gppr

    # d/d_alpha (cross_models/entmax.py:113-131)
    s = jnp.where(y > 0, y * jnp.log(jnp.where(y > 0, y, 1.0)), 0.0)
    ent = jnp.sum(s, axis=-1, keepdims=True)
    y_skewed = gppr / jnp.sum(gppr, axis=-1, keepdims=True)
    d_alpha = dy * (y - y_skewed) / jnp.square(alpha - 1.0)
    d_alpha = d_alpha - dy * (s - y_skewed * ent) / (alpha - 1.0)
    d_alpha = jnp.sum(d_alpha, axis=-1, keepdims=True)
    return dx, d_alpha


_entmax_bisect_last.defvjp(_entmax_bisect_fwd, _entmax_bisect_bwd)


def entmax_bisect(x: Array, alpha=1.5, axis: int = -1, n_iter: int = 50) -> Array:
    """alpha-entmax via bisection; differentiable w.r.t. both x and alpha.

    alpha may be a scalar or broadcastable to x.shape with size 1 on `axis`
    (e.g. per-head learnable alpha as in STanHop's `EntmaxAlpha`).
    """
    moved, back = _move_axis_last(x, axis)
    alpha = jnp.asarray(alpha, dtype=moved.dtype)
    alpha_shape = moved.shape[:-1] + (1,)
    # broadcast outside the custom_vjp so the cotangent sums back automatically
    alpha_b = jnp.broadcast_to(alpha, alpha_shape)
    return back(_entmax_bisect_last(moved, alpha_b, n_iter))


def alpha_from_pre_alpha(pre_alpha: Array) -> Array:
    """STanHop's AlphaChooser map: alpha = clip(1 + 2*sigmoid(p), 1.0001, 3)
    (`cross_models/entmax.py:10-21`)."""
    return jnp.clip(1.0 + 2.0 * jax.nn.sigmoid(pre_alpha), 1.0001, 3.0)
