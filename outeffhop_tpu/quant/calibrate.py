"""Calibrate → freeze → run: the functional PTQ pipeline.

Replaces the reference's stateful machinery — `QuantizationManager` 4-state FSM
(`quantization_manager.py:11-108`), `QuantizationHijacker` forward wrapping
(`hijacker.py:27-134`), and `pass_data_for_range_estimation`
(`transformers_language/utils.py:50-71`) — with three explicit phases:

  1. **discover**: one eager dummy forward records every weight tensor and
     activation-site name (the functional analogue of the reference's
     dummy-forward quantizer materialization, `base_quantized_model.py:74-79`).
  2. **calibrate**: the forward runs under jit with an explicit estimator-state
     pytree threaded in/out; each activation site updates its range estimate
     with the current batch and then fake-quants with the *updated* estimate —
     exactly the manager's estimate-then-quantize order
     (`quantization_manager.py:94-102`). Weights use ranges precomputed at
     build time from the (static) weight tensors.
  3. **freeze → run**: estimator states are finalized into a static
     `QParams`-per-site pytree; the run-phase forward fake-quants (or
     integer-quantizes for real, on the int8 kernel path) with frozen
     parameters.

Model forwards thread a `QuantCtx` (or `None` for the FP path) and call
`ctx.weight(name, w)` / `ctx.act(name, x, kind)` at each quantization point.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.quant.config import QuantizedModelConfig, SiteCfg
from outeffhop_tpu.quant.fake_quant import (
    QParams,
    fake_quant,
    qparams_from_range_asymmetric,
    qparams_from_range_symmetric,
    reshape_per_channel,
)
from outeffhop_tpu.quant.ranges import make_estimator

Array = jax.Array

# Estimator state under jit: dict(lo, hi, n). `n` counts batches so the
# first-batch-initializes EMA semantics survive inside a jitted fold.
EstState = Dict[str, Array]


def _init_est_state() -> EstState:
    return dict(
        lo=jnp.zeros((), jnp.float32),
        hi=jnp.zeros((), jnp.float32),
        n=jnp.zeros((), jnp.int32),
    )


def _histogram_quantile_pair(
    x: Array, p_lo: float, p_hi: float, bins: int = 8192
) -> Tuple[Array, Array]:
    """Two-sided quantiles from a fixed-bin histogram CDF with in-bin linear
    interpolation — the TPU-friendly percentile (SURVEY §7: the reference's
    `np.percentile` is a full sort of the whole tensor per batch,
    `range_estimators.py:62-69`). Worst-case error is one bin width,
    (max-min)/bins — with 8192 bins that is 0.012% of the dynamic range,
    far below the int8 grid step of ~0.4% (tested in tests/test_calibrate)."""
    xf = x.reshape(-1)
    lo = jnp.min(xf)
    hi = jnp.max(xf)
    width = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((xf - lo) / width * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    cdf = jnp.cumsum(hist) / xf.size

    def q_at(p):
        i = jnp.clip(jnp.searchsorted(cdf, p), 0, bins - 1)
        c_prev = jnp.where(i > 0, cdf[jnp.maximum(i - 1, 0)], 0.0)
        frac = jnp.clip((p - c_prev) / jnp.maximum(cdf[i] - c_prev, 1e-12), 0.0, 1.0)
        return lo + (i.astype(jnp.float32) + frac) * (width / bins)

    return q_at(p_lo / 100.0), q_at(p_hi / 100.0)


def _batch_lo_hi(cfg: SiteCfg, x: Array) -> Tuple[Array, Array]:
    x = x.astype(jnp.float32)
    pct = cfg.estimator_kw.get("percentile")
    if pct:
        if cfg.estimator == "running_minmax":
            # (100-p, p) convention, p like 99.999 (range_estimators.py:89-94)
            p_lo, p_hi = 100.0 - pct, pct
        else:
            # current_minmax convention: (p, 100-p), p like 0.01 (:62-69)
            p_lo, p_hi = pct, 100.0 - pct
        if cfg.estimator_kw.get("percentile_impl", "exact") == "histogram":
            return _histogram_quantile_pair(
                x, p_lo, p_hi, bins=int(cfg.estimator_kw.get("percentile_bins", 8192))
            )
        return jnp.percentile(x, p_lo), jnp.percentile(x, p_hi)
    return jnp.min(x), jnp.max(x)


def _update_est_state(cfg: SiteCfg, state: EstState, x: Array) -> EstState:
    if cfg.estimator.lower() == "mse":
        return _update_mse_state(cfg, state, x)
    lo, hi = _batch_lo_hi(cfg, x)
    if cfg.estimator == "running_minmax":
        m = cfg.estimator_kw.get("momentum", 0.9)
        first = state["n"] == 0
        new_lo = jnp.where(first, lo, (1 - m) * lo + m * state["lo"])
        new_hi = jnp.where(first, hi, (1 - m) * hi + m * state["hi"])
    elif cfg.estimator == "current_minmax":
        new_lo, new_hi = lo, hi
    else:
        raise NotImplementedError(
            f"in-jit calibration supports current/running_minmax/MSE, got {cfg.estimator!r}"
        )
    return dict(lo=new_lo, hi=new_hi, n=state["n"] + 1)


# --------------------------------------------------------------------------
# MSE activation range estimation (`--ranges_acts MSE`)
#
# Reference: `quantization/range_estimators.py:114-382`. The first batch
# defines the candidate search space (`_define_search_range`, :215-239); each
# batch then accumulates the quant-MSE of every candidate range over the full
# tensor (no momentum, :241-259/:264-290); the current/final range is the
# accumulated argmin. Symmetric quantizers (and one-sided data) use the 1-D
# grid; the asymmetric two-sided case is the 2-D grid over (range, skew).
# The 2-D skew axis is subsampled by `skew_stride` (default 8; reference
# sweeps all 2^b/4 = 64 integer skews — set skew_stride=1 via
# act_range_options for the exact, 64x slower sweep).
#
# The running `jax.lax.map` over candidates keeps the fold jit-compatible:
# the estimator state is (search-space scalars + loss accumulator), all
# arrays, so calibration still runs as one compiled scan per batch.
# --------------------------------------------------------------------------


def _mse_fake_quant(x: Array, lo: Array, hi: Array, cfg: SiteCfg) -> Array:
    if cfg.symmetric:
        qp = qparams_from_range_symmetric(lo, hi, n_bits=cfg.n_bits, signed=True)
    else:
        qp = qparams_from_range_asymmetric(lo, hi, n_bits=cfg.n_bits)
    return fake_quant(x, qp)


def _mse_candidates_1d(state):
    nc = state["loss"].shape[0] - 1
    step = state["thr"] / nc
    cand = step * jnp.arange(1, nc + 1, dtype=jnp.float32)  # (nc,)
    pos = cand
    neg = jnp.where(state["one_sided"] > 0, 0.0, -cand)
    return neg, pos


def _mse_candidates_2d(state, n_bits: int, skew_stride: int):
    nc, n_skew, _ = state["loss"].shape
    nc -= 1
    step = state["thr"] / nc
    cand = step * jnp.arange(1, nc + 1, dtype=jnp.float32)  # (nc,)
    temp_delta = 2.0 * cand / (2.0**n_bits - 1)  # (nc,)
    s_idx = jnp.arange(n_skew, dtype=jnp.float32) * skew_stride  # (S,)
    sign = jnp.array([1.0, -1.0], jnp.float32)  # (2,)
    skew = (
        temp_delta[:, None, None] * s_idx[None, :, None] * sign[None, None, :]
    )  # (nc, S, 2)
    neg = jnp.maximum(-cand[:, None, None] + skew, state["max_neg"])
    pos = jnp.minimum(cand[:, None, None] + skew, state["max_pos"])
    return neg, pos


def _init_mse_state(cfg: SiteCfg, x: Array) -> EstState:
    """First-batch search-space definition (runs EAGERLY — run_calibration
    executes the first batch outside jit, so min/max here are concrete)."""
    kw = cfg.estimator_kw
    nc = int(kw.get("num_candidates", 100))
    margin = float(kw.get("range_margin", 0.5))
    skew_stride = int(kw.get("skew_stride", 8))
    xf = x.astype(jnp.float32)
    xmin = float(jax.device_get(jnp.min(xf)))
    xmax = float(jax.device_get(jnp.max(xf)))
    one_sided = xmin >= 0.0
    if one_sided or cfg.symmetric:
        # 1-D search (range_estimators.py:220-229)
        thr = max(abs(xmin), abs(xmax)) + margin
        loss = jnp.zeros((nc + 1,), jnp.float32).at[0].set(jnp.inf)
        return dict(
            thr=jnp.float32(thr),
            one_sided=jnp.float32(1.0 if one_sided else 0.0),
            loss=loss,
            n=jnp.zeros((), jnp.int32),
        )
    # 2-D search (range_estimators.py:230-239): skew axis subsampled
    max_int_skew = (2**cfg.n_bits) // 4
    n_skew = max(1, -(-max_int_skew // skew_stride))
    max_pos = xmax + margin
    max_neg = xmin - margin
    thr = max(abs(max_pos), abs(max_neg))
    loss = jnp.zeros((nc + 1, n_skew, 2), jnp.float32).at[0].set(jnp.inf)
    return dict(
        thr=jnp.float32(thr),
        one_sided=jnp.zeros((), jnp.float32),
        max_pos=jnp.float32(max_pos),
        max_neg=jnp.float32(max_neg),
        loss=loss,
        n=jnp.zeros((), jnp.int32),
    )


def _update_mse_state(cfg: SiteCfg, state: EstState, x: Array) -> EstState:
    xf = x.astype(jnp.float32)
    skew_stride = int(cfg.estimator_kw.get("skew_stride", 8))
    if state["loss"].ndim == 1:
        neg, pos = _mse_candidates_1d(state)  # (nc,)
        flat_neg, flat_pos = neg, pos
    else:
        neg, pos = _mse_candidates_2d(state, cfg.n_bits, skew_stride)
        flat_neg, flat_pos = neg.reshape(-1), pos.reshape(-1)

    def one(args):
        lo, hi = args
        y = _mse_fake_quant(xf, lo, hi, cfg)
        return jnp.sum(jnp.square(xf - y))

    losses = jax.lax.map(one, (flat_neg, flat_pos))
    new_loss = state["loss"].at[
        (slice(1, None),) if state["loss"].ndim == 1 else (slice(1, None), slice(None), slice(None))
    ].add(losses.reshape(state["loss"].shape[0] - 1, *state["loss"].shape[1:]))
    out = dict(state)
    out["loss"] = new_loss
    out["n"] = state["n"] + 1
    return out


def _mse_lo_hi(cfg: SiteCfg, state: EstState):
    """Current argmin range of the accumulated candidate losses
    (`_perform_1D_search`/`_perform_2D_search` argmin, :256-262/:292-305)."""
    skew_stride = int(cfg.estimator_kw.get("skew_stride", 8))
    if state["loss"].ndim == 1:
        neg, pos = _mse_candidates_1d(state)
        idx = jnp.argmin(state["loss"][1:])
        return neg[idx], pos[idx]
    neg, pos = _mse_candidates_2d(state, cfg.n_bits, skew_stride)
    flat = state["loss"][1:].reshape(-1)
    idx = jnp.argmin(flat)
    return neg.reshape(-1)[idx], pos.reshape(-1)[idx]


def _qparams_from_state(cfg: SiteCfg, lo: Array, hi: Array) -> QParams:
    if cfg.symmetric:
        # `signed` must be static under jit; activations quantized symmetric
        # are assumed signed (the reference's default act method is
        # asymmetric, where this never arises).
        return qparams_from_range_symmetric(lo, hi, n_bits=cfg.n_bits, signed=True)
    return qparams_from_range_asymmetric(lo, hi, n_bits=cfg.n_bits)


class QuantCtx:
    """Per-forward quantization context. Construct with one of the
    classmethods; thread through the model forward; read the mutated fields
    (`discovered_*` or `est_state`) afterwards."""

    def __init__(self, mode: str, config: Optional[QuantizedModelConfig]):
        assert mode in ("discover", "calibrate", "run")
        self.mode = mode
        self.config = config
        self.weight_qparams: Dict[str, Optional[QParams]] = {}
        self.act_qparams: Dict[str, Optional[QParams]] = {}
        self.est_state: Dict[str, EstState] = {}
        self.discovered_weights: Dict[str, Tuple[Array, Optional[int]]] = {}
        self.discovered_acts: list = []
        # name ('...|w') → Int8Dense: real integer execution for these dense
        # sites in run mode (quant/int8_exec.py); empty = simulate only.
        self.int8_dense: dict = {}
        # learned-ranges QAT: LSQ-style 1/sqrt(Qp*N) gradient scaling on the
        # quantizer params (`base_quantized_model.py:157` grad_scaling toggle,
        # `uniform_quantizers.py:150-157`); only meaningful when the qparams
        # dicts are trainable leaves of the optimizer pytree.
        self.grad_scaling: bool = False

    # -- constructors ------------------------------------------------------

    @classmethod
    def discover(cls, config: QuantizedModelConfig) -> "QuantCtx":
        return cls("discover", config)

    @classmethod
    def trace_discovery(
        cls, config: QuantizedModelConfig, forward_with_qctx, batch
    ) -> "QuantCtx":
        """Discovery as a TRACE, not an execution. Site recording is a Python
        side effect of running the forward, so `jax.eval_shape` over abstract
        batch inputs performs it with ZERO device computation — the recorded
        weight leaves stay concrete because the params are closed over by
        `forward_with_qctx`, untouched before their `q.weight(...)` call
        (see `weight()` above: discover mode records the array verbatim).

        This replaces the reference's dummy-forward re-materialization
        (`base_quantized_model.py:74-79`), which executes a real forward. On
        an accelerator behind a high-latency link an eager dummy forward
        costs one dispatch round trip per op; the trace costs none.
        """
        ctx = cls("discover", config)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            batch,
        )
        jax.eval_shape(
            lambda b: forward_with_qctx(b, ScopedQuantCtx(ctx, "")), abstract
        )
        return ctx

    @classmethod
    def calibrate(
        cls,
        config: QuantizedModelConfig,
        weight_qparams: Dict[str, Optional[QParams]],
        est_state: Dict[str, EstState],
    ) -> "QuantCtx":
        ctx = cls("calibrate", config)
        ctx.weight_qparams = weight_qparams
        ctx.est_state = dict(est_state)
        return ctx

    @classmethod
    def run(
        cls,
        config: QuantizedModelConfig,
        weight_qparams: Dict[str, Optional[QParams]],
        act_qparams: Dict[str, Optional[QParams]],
        int8_dense: Optional[dict] = None,
        grad_scaling: bool = False,
    ) -> "QuantCtx":
        ctx = cls("run", config)
        ctx.weight_qparams = weight_qparams
        ctx.act_qparams = act_qparams
        ctx.grad_scaling = grad_scaling
        if int8_dense:
            ctx.int8_dense = dict(int8_dense)
        return ctx

    # -- site handlers -----------------------------------------------------

    def weight(self, name: str, w: Array, per_channel_axis: Optional[int] = 0) -> Array:
        """Weight quantization point. `name` must carry the '|w' (or
        '|ln_param') suffix already applied by the caller's scope helper."""
        if self.mode == "discover":
            self.discovered_weights[name] = (w, per_channel_axis)
            return w
        qp = self.weight_qparams.get(name)
        if qp is None:
            return w
        return fake_quant(
            w, qp, grad_scaling=self.grad_scaling, per_channel=qp.delta.ndim > 0
        )

    def act(self, name: str, x: Array) -> Array:
        """Activation quantization point (name carries its kind suffix)."""
        if self.mode == "discover":
            self.discovered_acts.append(name)
            return x
        cfg = self.config.act_site(name)
        if not cfg.enabled:
            return x
        if self.mode == "calibrate":
            state = self.est_state.get(name)
            if state is None:
                state = (
                    _init_mse_state(cfg, x)
                    if cfg.estimator.lower() == "mse"
                    else _init_est_state()
                )
            state = _update_est_state(cfg, state, x)
            self.est_state[name] = state
            if cfg.estimator.lower() == "mse":
                lo, hi = _mse_lo_hi(cfg, state)
            else:
                lo, hi = state["lo"], state["hi"]
            qp = _qparams_from_state(cfg, lo, hi)
            return fake_quant(x, qp)
        qp = self.act_qparams.get(name)
        if qp is None:
            return x
        return fake_quant(x, qp, grad_scaling=self.grad_scaling)

    def scoped(self, prefix: str) -> "ScopedQuantCtx":
        return ScopedQuantCtx(self, prefix)


class ScopedQuantCtx:
    """Prefix-namespaced view (mirrors telemetry.ScopedTape)."""

    def __init__(self, ctx: Optional[QuantCtx], prefix: str):
        self._ctx = ctx
        self._prefix = prefix

    def _full(self, name: str, kind: str) -> str:
        base = f"{self._prefix}.{name}" if self._prefix else name
        return f"{base}|{kind}"

    def weight(self, name: str, w: Array, per_channel_axis: Optional[int] = 0,
               kind: str = "w") -> Array:
        if self._ctx is None:
            return w
        return self._ctx.weight(self._full(name, kind), w, per_channel_axis)

    def act(self, name: str, x: Array, kind: str = "a") -> Array:
        if self._ctx is None:
            return x
        return self._ctx.act(self._full(name, kind), x)

    def int8_for(self, name: str, kind: str = "w"):
        """Int8Dense for this dense site when integer execution is frozen in
        (run mode only); None → float/fake-quant path."""
        if self._ctx is None or not self._ctx.int8_dense:
            return None
        return self._ctx.int8_dense.get(self._full(name, kind))

    def scoped(self, prefix: str) -> "ScopedQuantCtx":
        if self._ctx is None:
            return self
        new = f"{self._prefix}.{prefix}" if self._prefix else prefix
        return ScopedQuantCtx(self._ctx, new)

    @property
    def enabled(self) -> bool:
        return self._ctx is not None

    @property
    def needs_reference_shapes(self) -> bool:
        """True while range estimation observes tensors (discover/calibrate):
        paths that restructure batching (e.g. the shared-prototype-bank
        HopfieldPooling contraction) must present the reference's per-call
        tensor shapes so estimator state (EMA observation counts, percentile
        samples) matches the reference's. A frozen run-mode ctx applies
        row-wise elementwise ops only (fake-quant grids / int8 dense), so
        restructured fast paths are numerically identical there and allowed."""
        ctx = self._ctx
        return ctx is not None and ctx.mode in ("discover", "calibrate")

    @property
    def act_sites_enabled(self) -> bool:
        """True when activation quant sites actually do something — False for
        a run-mode ctx carrying only int8 weights (act_qparams empty, acts
        disabled). Fast paths (flash attention, decode_fast) that must skip
        only when score/prob sites are live key off this, not `enabled`."""
        ctx = self._ctx
        if ctx is None:
            return False
        if ctx.mode in ("discover", "calibrate"):
            return True
        if ctx.act_qparams and any(v is not None for v in ctx.act_qparams.values()):
            return True
        return False


NULL_QCTX = ScopedQuantCtx(None, "")


# --------------------------------------------------------------------------
# Build-time helpers
# --------------------------------------------------------------------------


def compute_weight_qparams(
    discovered: Dict[str, Tuple[Array, Optional[int]]],
    config: QuantizedModelConfig,
) -> Dict[str, Optional[QParams]]:
    """Freeze weight ranges from the (static) weight tensors.

    current_minmax default; per-channel along axis 0 of the weight (the
    out-feature axis, `uniform_quantizers.py:159-171`); MSE grid/golden
    optional (`weight_range_options`)."""
    out: Dict[str, Optional[QParams]] = {}
    for name, (w, pc_axis) in discovered.items():
        cfg = config.weight_site(name)
        if not cfg.enabled:
            out[name] = None
            continue
        per_channel = cfg.per_channel and pc_axis is not None
        est_kw = dict(cfg.estimator_kw)
        if cfg.estimator == "mse":
            est_kw.setdefault("n_bits", cfg.n_bits)
            est_kw.setdefault("symmetric", cfg.symmetric)
        est = make_estimator(cfg.estimator, per_channel=per_channel, **est_kw)
        w2 = jnp.moveaxis(w, pc_axis, 0) if (per_channel and pc_axis != 0) else w
        if per_channel:
            lo, hi = est.estimate([w2])
        else:
            lo, hi = est.estimate([w2.reshape(1, -1) if cfg.estimator == "mse" else w2])
        if cfg.symmetric:
            qp = qparams_from_range_symmetric(lo, hi, n_bits=cfg.n_bits)
        else:
            qp = qparams_from_range_asymmetric(lo, hi, n_bits=cfg.n_bits)
        if per_channel:
            qp = reshape_per_channel(qp, w.ndim)
        out[name] = qp
    return out


def freeze_act_qparams(
    est_state: Dict[str, EstState], config: QuantizedModelConfig
) -> Dict[str, Optional[QParams]]:
    """Finalize calibration: estimator states → frozen per-site QParams
    (the `fix_ranges` step, `base_quantized_model.py:137`)."""
    out: Dict[str, Optional[QParams]] = {}
    for name, state in est_state.items():
        cfg = config.act_site(name)
        if not cfg.enabled:
            out[name] = None
            continue
        if "loss" in state:  # MSE grid state → accumulated-argmin range
            lo, hi = _mse_lo_hi(cfg, state)
        else:
            lo, hi = state["lo"], state["hi"]
        lo = jnp.asarray(jax.device_get(lo), jnp.float32)
        hi = jnp.asarray(jax.device_get(hi), jnp.float32)
        if cfg.symmetric:
            out[name] = qparams_from_range_symmetric(lo, hi, n_bits=cfg.n_bits)
        else:
            out[name] = qparams_from_range_asymmetric(lo, hi, n_bits=cfg.n_bits)
    return out


def run_calibration(
    forward_with_qctx,
    config: QuantizedModelConfig,
    weight_qparams: Dict[str, Optional[QParams]],
    batches,
    jit: bool = True,
) -> Dict[str, EstState]:
    """Fold estimator state over calibration batches.

    `forward_with_qctx(batch, qctx)` must run the model forward through the
    given ScopedQuantCtx. Returns the final estimator-state pytree.
    """

    def step(est_state, batch):
        ctx = QuantCtx.calibrate(config, weight_qparams, est_state)
        forward_with_qctx(batch, ScopedQuantCtx(ctx, ""))
        return ctx.est_state

    step_fn = jax.jit(step) if jit else step
    est_state: Dict[str, EstState] = {}
    for i, batch in enumerate(batches):
        if i >= config.est_num_batches:
            break
        if i <= 1:
            # first call populates the site set (structure change → retrace)
            est_state = step(est_state, batch)
        else:
            est_state = step_fn(est_state, batch)
    return est_state
