"""Range estimators: current-minmax, running-minmax (EMA), percentile, MSE grid.

Capability parity with `OutEffHop/quantization/range_estimators.py`, re-designed
as a functional fold so calibration can run under jit:

  * `batch_stats(x)`  — jittable reduction of one activation tensor to a small
    stats pytree (min/max or percentile pair; MSE: per-candidate losses)
  * `update(state, stats)` — fold step (EMA / overwrite / accumulate)
  * `finalize(state)` — (x_min, x_max)

Semantics preserved exactly:
  * RunningMinMax: EMA with momentum 0.9, **first batch initializes**
    (`range_estimators.py:99-104`); percentile mode takes
    (100-p, p) percentiles (p like 99.999).
  * CurrentMinMax: last batch wins; percentile mode takes (p, 100-p)
    percentiles (p like 0.01) — note the two classes' opposite conventions
    (`range_estimators.py:62-69` vs `:89-94`).
  * MSE grid: candidate thresholds are i*step for i in 1..N with
    step = max_range/N where the search range is fixed by the FIRST batch
    (absmax + 0.5 margin); losses accumulate across batches; symmetric or
    one-sided → 1-D search, else 2-D search over (range, int-skew, sign)
    (`range_estimators.py:215-306`).

Percentile note (SURVEY.md §7 hard parts): the reference uses `np.percentile`
(exact, linear interpolation). We use `jnp.percentile`, which implements the
same linear-interpolation definition — exact parity, computed via sort on
device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.quant.fake_quant import QParams, qparams_from_range

Array = jax.Array


class RangeEstimator:
    """Base: a stateless descriptor; state is an explicit pytree."""

    per_channel: bool = False

    def init_state(self):
        return None

    def batch_stats(self, x: Array):
        raise NotImplementedError

    def update(self, state, stats):
        raise NotImplementedError

    def finalize(self, state) -> Tuple[Array, Array]:
        raise NotImplementedError

    def estimate(self, batches) -> Tuple[Array, Array]:
        """Convenience: fold a list of tensors (used for weights / tests)."""
        state = self.init_state()
        for x in batches:
            state = self.update(state, self.batch_stats(x))
        return self.finalize(state)


def _flatten_per_channel(x: Array) -> Array:
    return x.reshape(x.shape[0], -1)


@dataclasses.dataclass
class CurrentMinMax(RangeEstimator):
    """Last batch's (min, max); optional two-sided percentile
    (`CurrentMinMaxEstimator`, range_estimators.py:53-74)."""

    percentile: Optional[float] = None
    per_channel: bool = False

    def init_state(self):
        return None

    def batch_stats(self, x: Array):
        if self.per_channel:
            x = _flatten_per_channel(x)
            if self.percentile:
                lo = jnp.percentile(x, self.percentile, axis=-1)
                hi = jnp.percentile(x, 100.0 - self.percentile, axis=-1)
            else:
                lo = jnp.min(x, axis=-1)
                hi = jnp.max(x, axis=-1)
        else:
            if self.percentile:
                lo = jnp.percentile(x, self.percentile)
                hi = jnp.percentile(x, 100.0 - self.percentile)
            else:
                lo = jnp.min(x)
                hi = jnp.max(x)
        return lo, hi

    def update(self, state, stats):
        return stats

    def finalize(self, state):
        if state is None:
            raise ValueError("no data passed to range estimator")
        return state


@dataclasses.dataclass
class RunningMinMax(RangeEstimator):
    """EMA of per-batch (min, max), momentum 0.9, first batch initializes
    (`RunningMinMaxEstimator`, range_estimators.py:77-106)."""

    momentum: float = 0.9
    percentile: Optional[float] = None
    per_channel: bool = False

    def init_state(self):
        return None

    def batch_stats(self, x: Array):
        if self.per_channel:
            xf = _flatten_per_channel(x)
            return jnp.min(xf, axis=-1), jnp.max(xf, axis=-1)
        if self.percentile:
            # NOTE opposite convention to CurrentMinMax: p like 99.999
            lo = jnp.percentile(x, 100.0 - self.percentile)
            hi = jnp.percentile(x, self.percentile)
            return lo, hi
        return jnp.min(x), jnp.max(x)

    def update(self, state, stats):
        lo, hi = stats
        if state is None:
            return lo, hi
        old_lo, old_hi = state
        m = self.momentum
        return (1 - m) * lo + m * old_lo, (1 - m) * hi + m * old_hi

    def finalize(self, state):
        if state is None:
            raise ValueError("no data passed to range estimator")
        return state


@functools.partial(
    jax.jit, static_argnames=("n_bits", "symmetric", "per_channel", "signed")
)
def _grid_losses_jit(x, thrs, *, n_bits, symmetric, per_channel, signed):
    """Module-level jitted grid so the compile is SHARED across all weight
    tensors of the same shape (a fresh `jax.jit(lambda ...)` per call — the
    round-4-early version — misses jax's cache on the new function object and
    recompiled for every tensor: ~seconds per freeze through the remote
    compiler, times ~72 dense sites per BERT)."""
    from outeffhop_tpu.quant.fake_quant import (
        fake_quant,
        qparams_from_range_asymmetric,
        qparams_from_range_symmetric,
    )

    def one(thr):
        if symmetric:
            qp = qparams_from_range_symmetric(
                thr[0], thr[1], n_bits=n_bits, signed=signed
            )
        else:
            qp = qparams_from_range_asymmetric(thr[0], thr[1], n_bits=n_bits)
        y = fake_quant(x, qp)
        se = jnp.sum(jnp.square(x - y).reshape(x.shape[0], -1), axis=1)
        return se if per_channel else jnp.sum(se)[None]

    return jax.lax.map(one, thrs)


@dataclasses.dataclass
class MSEEstimator(RangeEstimator):
    """Grid-search MSE-optimal clipping range (`MSE_Estimator`,
    range_estimators.py:114-382, OptMethod.grid).

    Used at freeze time for weights (and optionally embeddings, the reference's
    `quant_dict['Et']` option), so it runs as a direct fold over full tensors.
    The candidate losses are computed vectorized over the candidate axis (vmap)
    rather than a Python loop per candidate — same math, TPU-shaped.
    """

    n_bits: int = 8
    symmetric: bool = False
    num_candidates: int = 100
    range_margin: float = 0.5
    per_channel: bool = False
    opt_method: str = "grid"  # grid | golden_section (OptMethod, :109-111)

    def init_state(self):
        # (search_range_def, loss_accumulator); defined on first batch
        return None

    # -- search-space definition (first batch) --
    def _define_search(self, x: Array):
        one_sided = bool(np.asarray(jnp.min(x)) >= 0)
        if one_sided or self.symmetric:
            max_pos = float(
                max(abs(float(jnp.min(x))), float(jnp.max(x))) + self.range_margin
            )
            return dict(one_sided=one_sided, mode="1d", max_range=max_pos)
        max_pos = float(jnp.max(x)) + self.range_margin
        max_neg = float(jnp.min(x)) - self.range_margin
        return dict(
            one_sided=False,
            mode="2d",
            max_range=float(max(abs(max_pos), abs(max_neg))),
            max_pos_thr=max_pos,
            max_neg_thr=max_neg,
        )

    def _quant_mse(self, x: Array, neg_thr, pos_thr, per_channel_loss: bool):
        qp = qparams_from_range(neg_thr, pos_thr, n_bits=self.n_bits, symmetric=self.symmetric)
        from outeffhop_tpu.quant.fake_quant import fake_quant

        y = fake_quant(x, qp)
        se = jnp.sum(jnp.square(x - y).reshape(x.shape[0], -1), axis=1)
        return se if per_channel_loss else jnp.sum(se)[None]

    def _grid_losses(self, x: Array, thrs: np.ndarray, signed=None) -> np.ndarray:
        """Quantization MSE for every (neg, pos) threshold pair in ONE jitted
        `lax.map` — the round-3 version dispatched one eager device program per
        grid cell (100 cands x 64 skews x 2 signs = 12,800 round trips for one
        asymmetric weight tensor; minutes through the remote-chip tunnel).
        Returns (n_thresholds, channels)."""
        losses = _grid_losses_jit(
            x,
            jnp.asarray(thrs, jnp.float32),
            n_bits=self.n_bits,
            symmetric=self.symmetric,
            per_channel=self.per_channel,
            signed=signed,
        )
        return np.asarray(losses)

    def _candidate_losses(self, search, x: Array) -> np.ndarray:
        step = search["max_range"] / self.num_candidates
        cands = np.arange(1, self.num_candidates + 1, dtype=np.float64)
        if search["mode"] == "1d":
            neg = np.zeros_like(cands) if search["one_sided"] else -step * cands
            thrs = np.stack([neg, step * cands], axis=1)  # (N, 2)
            # symmetric grids: signed is static per search (neg<0 for every
            # candidate unless one-sided), matching set_quant_range semantics
            losses = self._grid_losses(x, thrs, signed=not search["one_sided"])
            return losses.T  # (channels, num_candidates)
        # 2d: (channels, cand, skew, sign) — same grid/order as the reference's
        # triple loop (`MSE_Estimator`, range_estimators.py:114-382)
        max_int_skew = (2**self.n_bits) // 4
        int_max = 2.0**self.n_bits - 1
        start, finish = -step * cands, step * cands  # (N,)
        delta = (finish - start) / int_max
        shifts = np.arange(max_int_skew, dtype=np.float64)
        signs = np.array([1.0, -1.0])  # reverse=0 → +shift, reverse=1 → −shift
        skew = signs[None, None, :] * shifts[None, :, None] * delta[:, None, None]
        neg = np.maximum(start[:, None, None] + skew, search["max_neg_thr"])
        pos = np.minimum(finish[:, None, None] + skew, search["max_pos_thr"])
        thrs = np.stack([neg.reshape(-1), pos.reshape(-1)], axis=1)  # (N·S·2, 2)
        losses = self._grid_losses(x, thrs)  # (N·S·2, channels)
        channels = x.shape[0] if self.per_channel else 1
        return losses.T.reshape(channels, self.num_candidates, max_int_skew, 2)

    def batch_stats(self, x: Array):
        return x  # MSE needs the raw tensor

    def update(self, state, x: Array):
        if self.opt_method == "golden_section":
            # golden search needs the data at finalize time; accumulate
            # tensors (weights/embeddings only — one "batch" in practice)
            if state is None:
                return (self._define_search(x), [x])
            search, xs = state
            return (search, xs + [x])
        if state is None:
            search = self._define_search(x)
            loss = self._candidate_losses(search, x)
            return (search, loss)
        search, loss = state
        return (search, loss + self._candidate_losses(search, x))

    # -- golden-section search (OptMethod.golden_section,
    #    range_estimators.py — scipy.optimize golden equivalent) --
    def _golden_minimize(self, f, lo: float, hi: float, iters: int = 40) -> float:
        gr = (np.sqrt(5.0) - 1.0) / 2.0
        a, b = lo, hi
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        fc, fd = f(c), f(d)
        for _ in range(iters):
            if fc < fd:
                b, d, fd = d, c, fc
                c = b - gr * (b - a)
                fc = f(c)
            else:
                a, c, fc = c, d, fd
                d = a + gr * (b - a)
                fd = f(d)
        return (a + b) / 2.0

    # vectorized-over-channels golden section: one f(thresholds (C,)) → (C,)
    # evaluation per iteration, channels' brackets contract independently
    # (the reference runs scipy golden per channel in a Python loop;
    # range_estimators.py golden + per_channel — same math, TPU-shaped)
    def _golden_minimize_vec(self, f, lo, hi, iters: int = 40):
        gr = (np.sqrt(5.0) - 1.0) / 2.0
        a = np.asarray(lo, np.float64)
        b = np.asarray(hi, np.float64)
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        fc, fd = np.asarray(f(c)), np.asarray(f(d))
        for _ in range(iters):
            take = fc < fd  # per-channel: keep [a, d) vs (c, b]
            a = np.where(take, a, c)
            b = np.where(take, d, b)
            new_c = b - gr * (b - a)
            new_d = a + gr * (b - a)
            eval_pts = np.where(take, new_c, new_d)
            fnew = np.asarray(f(eval_pts))
            fc, fd = (
                np.where(take, fnew, fd),
                np.where(take, fc, fnew),
            )
            c, d = np.where(take, new_c, d), np.where(take, c, new_d)
        return (a + b) / 2.0

    def _per_channel_mse(self, xs, neg, pos) -> np.ndarray:
        """Σ_batches per-channel quant MSE for per-channel thresholds (C,)."""
        qp = qparams_from_range(
            jnp.asarray(neg, jnp.float32), jnp.asarray(pos, jnp.float32),
            n_bits=self.n_bits, symmetric=self.symmetric,
        )
        total = None
        for x in xs:
            from outeffhop_tpu.quant.fake_quant import fake_quant, reshape_per_channel

            y = fake_quant(x, reshape_per_channel(qp, x.ndim), per_channel=True)
            se = np.asarray(jnp.sum(jnp.square(x - y).reshape(x.shape[0], -1), axis=1))
            total = se if total is None else total + se
        return total

    def _finalize_golden_per_channel(self, search, xs):
        C = xs[0].shape[0]
        lo = np.full((C,), search["max_range"] / self.num_candidates)
        hi = np.full((C,), search["max_range"])
        if search["mode"] == "1d":
            one_sided = search["one_sided"]

            def f(t):
                return self._per_channel_mse(xs, np.zeros_like(t) if one_sided else -t, t)

            thr = self._golden_minimize_vec(f, lo, hi)
            xmin = np.zeros_like(thr) if one_sided else -thr
            return jnp.asarray(xmin, jnp.float32), jnp.asarray(thr, jnp.float32)
        # 2d: per-channel range size, then per-channel skew
        mn, mx = search["max_neg_thr"], search["max_pos_thr"]

        def mse_for_size(size):
            return self._per_channel_mse(
                xs, np.maximum(-size, mn), np.minimum(size, mx)
            )

        half = self._golden_minimize_vec(mse_for_size, lo, hi)
        skew = self._golden_minimize_vec(
            lambda s: self._per_channel_mse(
                xs, np.maximum(-half + s, mn), np.minimum(half + s, mx)
            ),
            -half / 2,
            half / 2,
        )
        xmin = np.maximum(-half + skew, mn)
        xmax = np.minimum(half + skew, mx)
        return jnp.asarray(xmin, jnp.float32), jnp.asarray(xmax, jnp.float32)

    def _finalize_golden(self, search, xs):
        if self.per_channel:
            return self._finalize_golden_per_channel(search, xs)

        def total_mse(neg, pos):
            return float(sum(float(jnp.sum(self._quant_mse(x, neg, pos, False))) for x in xs))

        if search["mode"] == "1d":
            one_sided = search["one_sided"]
            thr = self._golden_minimize(
                lambda t: total_mse(0.0 if one_sided else -t, t),
                search["max_range"] / self.num_candidates,
                search["max_range"],
            )
            xmin = 0.0 if one_sided else -thr
            return (
                jnp.asarray(xmin, jnp.float32),
                jnp.asarray(thr, jnp.float32),
            )
        # 2d asymmetric: golden over the range size, then over the skew
        # (the reference's asymmetric-with-skew search, sequentially)
        def mse_for_size(size):
            return total_mse(max(-size, search["max_neg_thr"]), min(size, search["max_pos_thr"]))

        size = self._golden_minimize(
            mse_for_size, search["max_range"] / self.num_candidates, search["max_range"]
        )
        half = size
        skew = self._golden_minimize(
            lambda s: total_mse(
                max(-half + s, search["max_neg_thr"]), min(half + s, search["max_pos_thr"])
            ),
            -half / 2,
            half / 2,
        )
        xmin = max(-half + skew, search["max_neg_thr"])
        xmax = min(half + skew, search["max_pos_thr"])
        return jnp.asarray(xmin, jnp.float32), jnp.asarray(xmax, jnp.float32)

    def finalize(self, state):
        if state is None:
            raise ValueError("no data passed to range estimator")
        if self.opt_method == "golden_section":
            return self._finalize_golden(*state)
        search, loss = state
        step = search["max_range"] / self.num_candidates
        if search["mode"] == "1d":
            min_cand = loss.argmin(axis=1) + 1  # candidates are 1-indexed
            xmax = step * min_cand
            xmin = np.zeros_like(xmax) if search["one_sided"] else -xmax
        else:
            int_max = 2.0**self.n_bits - 1
            channels = loss.shape[0]
            xmin = np.zeros(channels)
            xmax = np.zeros(channels)
            for ch in range(channels):
                cand, shift, reverse = np.unravel_index(loss[ch].argmin(), loss[ch].shape)
                cand += 1
                start, finish = -step * cand, step * cand
                delta = (finish - start) / int_max
                skew = ((-1) ** reverse) * shift * delta
                xmin[ch] = max(start + skew, search["max_neg_thr"])
                xmax[ch] = min(finish + skew, search["max_pos_thr"])
        xmin = jnp.asarray(xmin, dtype=jnp.float32)
        xmax = jnp.asarray(xmax, dtype=jnp.float32)
        if not self.per_channel:
            xmin, xmax = xmin.reshape(()), xmax.reshape(())
        return xmin, xmax


def make_estimator(name: str, **kw) -> RangeEstimator:
    """Registry matching the reference's `RangeEstimators` enum
    (range_estimators.py:392-395) + CLI names."""
    name = name.lower()
    if name in ("current_minmax", "currentminmax"):
        return CurrentMinMax(**kw)
    if name in ("running_minmax", "runningminmax"):
        return RunningMinMax(**kw)
    if name == "mse":
        return MSEEstimator(**kw)
    raise KeyError(f"unknown range estimator {name!r}")
