"""MHN retrieval math: overlaps, activations, energies, update rules.

Capability parity with `theory_verification/functions.py` (reference):

  * overlap functions — `dot_product` (:86), `manhattan_distance` (:89),
    `l2_distance` (:94), kernelized overlap (:81-84);
  * activation variants used in the retrieval sweeps — softmax, softmax_1,
    random-mask softmax (:42-49), top-k softmax (:51-76), polynomial (:99);
  * energies — `MHN_energy` (:102-105): −logsumexp(β·Ξᵀx) + ½‖x‖² + log M + ½,
    and the kernelized `LMHN_energy` (:113-118);
  * update rules — `MHN_update_rule` (:134-139), `UMHN_update_rule`
    (:141-147), `LMHN_update_rule` (:120-132).

TPU-first differences from the reference: update rules iterate via
`jax.lax.scan` (single trace, no Python-loop unrolling for large step
counts), activations are shape-polymorphic (operate on the last axis), and
everything is jit/vmap-compatible pure functions.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.ops.softmax_variants import softmax_1 as _softmax_1

Array = jax.Array


# ---------------------------------------------------------------------------
# Overlap (similarity) functions — reference functions.py:81-97
# ---------------------------------------------------------------------------


def dot_product(u: Array, v: Array) -> Array:
    """uᵀv overlap; u: (D, M), v: (D,) or (D, N) → (M,) or (M, N)."""
    return u.T @ v


def kernel_overlap(u: Array, v: Array, kernel: Callable[[Array], Array]) -> Array:
    """Kernelized overlap k(u)ᵀk(v) (functions.py:83-84)."""
    return kernel(u).T @ kernel(v)


def manhattan_distance(u: Array, v: Array) -> Array:
    """Σ|uᵢ−vᵢ| per stored pattern; u: (D, M), v: (D,) → (M,)
    (functions.py:89-92; reference spells it `manhhatan_distance`)."""
    return jnp.abs(u - v[:, None]).sum(axis=0)


def l2_distance(u: Array, v: Array) -> Array:
    """Euclidean distance per stored pattern (functions.py:94-97)."""
    return jnp.sqrt(jnp.square(u - v[:, None]).sum(axis=0))


# ---------------------------------------------------------------------------
# Activation variants — reference functions.py:42-76,99
# ---------------------------------------------------------------------------


def softmax(x: Array, axis: int = -1) -> Array:
    return jax.nn.softmax(x, axis=axis)


def softmax_1(x: Array, axis: int = -1) -> Array:
    return _softmax_1(x, axis=axis)


def random_mask_softmax(x: Array, p: float, key: Array, axis: int = -1) -> Array:
    """softmax(dropout(x, p)) — the reference's `random_mask_0{2,5,8}`
    (functions.py:42-49). torch.dropout zeroes with prob p and scales
    survivors by 1/(1−p); replicated here with an explicit PRNG key."""
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    dropped = jnp.where(keep, x / (1.0 - p), 0.0)
    return jax.nn.softmax(dropped, axis=axis)


def topk_softmax(x: Array, frac: float, axis: int = -1) -> Array:
    """softmax over x with all but the top ⌈frac·n⌉ entries zeroed — the
    reference's `topk_{80,50,20}` (functions.py:51-76). Note the reference
    zeroes non-top-k entries to 0 (not −inf) before the softmax; replicated."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    k = max(int(frac * n), 1)
    vals, idx = jax.lax.top_k(x, k)
    masked = jnp.zeros_like(x)
    masked = jnp.put_along_axis(masked, idx, vals, axis=-1, inplace=False)
    return jnp.moveaxis(jax.nn.softmax(masked, axis=-1), -1, axis)


def polynomial(x: Array, param: float = 10.0, axis: int = -1) -> Array:
    """x^param separation function (functions.py:99-100)."""
    del axis
    return jnp.power(x, param)


def topk_80(x, axis=-1):
    return topk_softmax(x, 0.8, axis=axis)


def topk_50(x, axis=-1):
    return topk_softmax(x, 0.5, axis=axis)


def topk_20(x, axis=-1):
    return topk_softmax(x, 0.2, axis=axis)


# ---------------------------------------------------------------------------
# Energies — reference functions.py:102-118
# ---------------------------------------------------------------------------


def MHN_energy(Xi: Array, x: Array, beta: float = 1.0) -> Array:
    """Modern Hopfield energy (functions.py:102-105):
    E(x) = −(1/β)·logsumexp(β·Ξᵀx)·β ... replicated exactly as written:
    E = −logsumexp(β·Ξᵀx) + ½ xᵀx + log M + ½   with Ξ: (D, M), x: (D,)."""
    M = Xi.shape[-1]
    return (
        -jax.nn.logsumexp(beta * (Xi.T @ x))
        + 0.5 * jnp.dot(x, x)
        + jnp.log(jnp.asarray(M, x.dtype))
        + 0.5
    )


def LMHN_energy(Xi: Array, x: Array, w: Array, beta: float = 1.0) -> Array:
    """Kernelized (learnable) MHN energy (functions.py:113-118): apply the
    linear kernel W to both memory and state, then the MHN energy in feature
    space."""
    phi_Xi = w @ Xi
    phi_x = w @ x
    M = Xi.shape[-1]
    return (
        -jax.nn.logsumexp(beta * (phi_Xi.T @ phi_x))
        + 0.5 * jnp.dot(phi_x, phi_x)
        + jnp.log(jnp.asarray(M, x.dtype))
        + 0.5
    )


# ---------------------------------------------------------------------------
# Update rules — reference functions.py:120-147
# ---------------------------------------------------------------------------


def _scan_updates(step_fn: Callable[[Array], Array], x: Array, steps: int) -> Array:
    """Iterate x ← step_fn(x) `steps` times under lax.scan (one trace)."""
    if steps == 1:  # common case: skip the scan machinery
        return step_fn(x)

    def body(carry, _):
        return step_fn(carry), None

    out, _ = jax.lax.scan(body, x, None, length=steps)
    return out


def MHN_update_rule(
    Xi: Array,
    x: Array,
    beta: float,
    steps: int,
    activation: Callable[..., Array] = softmax,
    overlap: Callable[[Array, Array], Array] = dot_product,
) -> Array:
    """x ← Ξ·(β·activation(overlap(Ξ, x))) iterated (functions.py:134-139).

    NOTE the reference applies β *outside* the activation (score =
    β·activation(Ξᵀx), not activation(β·Ξᵀx)); replicated exactly — with
    β=1 (all experiment configs) the two coincide."""

    def step(state):
        score = beta * activation(overlap(Xi, state), axis=-1)
        return Xi @ score

    return _scan_updates(step, x, steps)


def UMHN_update_rule(
    Xi: Array,
    x: Array,
    beta: float,
    steps: int,
    overlap: Callable[[Array, Array], Array],
    activation: Callable[..., Array] = softmax,
) -> Array:
    """Uniform-memory (kernelized-overlap) MHN update (functions.py:141-147);
    identical recursion with a kernel overlap."""

    def step(state):
        score = beta * activation(overlap(Xi, state), axis=-1)
        return Xi @ score

    return _scan_updates(step, x, steps)


def LMHN_update_rule(Xi: Array, x: Array, W: Array, beta: float = 1.0, steps: int = 1) -> Array:
    """Learnable-kernel MHN update (functions.py:120-132): softmax over
    φ(Ξ)ᵀφ(x) in feature space, retrieve in input space."""

    def step(state):
        phi_x = W @ state
        phi_Xi = W @ Xi
        score = beta * jax.nn.softmax(phi_Xi.T @ phi_x, axis=-1)
        return Xi @ score

    return _scan_updates(step, x, steps)


# ---------------------------------------------------------------------------
# Kernel-training loss — reference plotting.py (uniformity objective)
# ---------------------------------------------------------------------------


def uniform_loss(x: Array, t: float = 2.0) -> Array:
    """Uniformity loss log E[exp(−t‖u−v‖²)] over all pairs (Wang & Isola
    2020), used to pre-train the UMHN kernel so memory patterns spread
    uniformly on the sphere (plotting.py `learn_kernel`). x: (N, D),
    rows assumed normalized."""
    sq = jnp.sum(jnp.square(x[:, None, :] - x[None, :, :]), axis=-1)
    n = x.shape[0]
    off_diag = sq[jnp.triu_indices(n, k=1)]
    return jax.nn.logsumexp(-t * off_diag) - jnp.log(off_diag.shape[0] * 1.0)


ACTIVATIONS = {
    "softmax": softmax,
    "softmax1": softmax_1,
    "topk_80": topk_80,
    "topk_50": topk_50,
    "topk_20": topk_20,
    "polynomial": polynomial,
}


def get_activation(name: str) -> Callable[..., Array]:
    """Resolve a retrieval-activation by name; sparsemax/entmax come from
    `outeffhop_tpu.ops` (imported lazily to keep this module lightweight)."""
    if name in ACTIVATIONS:
        return ACTIVATIONS[name]
    if name == "sparsemax":
        from outeffhop_tpu.ops.entmax import sparsemax

        return sparsemax
    if name == "entmax":
        from outeffhop_tpu.ops.entmax import entmax15

        return entmax15
    raise ValueError(f"unknown retrieval activation {name!r}")
