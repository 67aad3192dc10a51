"""Profiling + roofline accounting.

The reference has no profiling subsystem at all (SURVEY.md §5 — only
wall-clock AverageMeters); on TPU, per-kernel accounting is how the
speed-of-light targets in BASELINE.md are checked. Provides:

  * `trace(logdir)` — context manager around `jax.profiler` (view with
    tensorboard/xprof);
  * `benchmark(fn, *args)` — robust wall-clock timing with a device fence
    that works through the remote-TPU tunnel (scalar host transfer);
  * analytic FLOP/byte counters for the framework's model families and a
    `roofline_report()` that turns a measured step time into MXU-utilization
    and HBM-bandwidth fractions against the chip's peaks.

Chip peaks are looked up by `jax.devices()[0].device_kind` (table below;
override via the `peaks=` argument for unlisted chips).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

# (bf16 TFLOP/s, int8 TOPS, HBM GB/s) per chip generation — public figures.
CHIP_PEAKS: Dict[str, Dict[str, float]] = {
    "TPU v4": {"bf16_tflops": 275.0, "int8_tops": 275.0, "hbm_gbps": 1228.0},
    "TPU v5 lite": {"bf16_tflops": 197.0, "int8_tops": 394.0, "hbm_gbps": 819.0},
    "TPU v5e": {"bf16_tflops": 197.0, "int8_tops": 394.0, "hbm_gbps": 819.0},
    "TPU v5p": {"bf16_tflops": 459.0, "int8_tops": 918.0, "hbm_gbps": 2765.0},
    "TPU v6e": {"bf16_tflops": 918.0, "int8_tops": 1836.0, "hbm_gbps": 1640.0},
}
_DEFAULT_PEAKS = {"bf16_tflops": 197.0, "int8_tops": 394.0, "hbm_gbps": 819.0}


def device_peaks(peaks: Optional[dict] = None) -> dict:
    if peaks is not None:
        return peaks
    kind = jax.devices()[0].device_kind
    for name, p in CHIP_PEAKS.items():
        if kind.startswith(name) or name.startswith(kind):
            return p
    return _DEFAULT_PEAKS


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture (tensorboard-viewable)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Capture a jax.profiler trace of a window of train-loop steps.

    Drivers construct one from `--profile_dir/--profile_start_step/
    --profile_steps` and call `tick(step, fence_on=loss)` once per step (after
    the step function). The trace starts at `start` (default 2, so compile and
    the first dispatch stay out of the capture) and stops `steps` steps later,
    fencing on the supplied array so every dispatched program is actually in
    the trace (through the remote-TPU tunnel, `block_until_ready` alone can
    return early — same reason as `fence`). A `logdir` of None makes every
    method a no-op, so drivers can call `tick` unconditionally.

    Because `tick` runs AFTER the step's dispatch, the captured window is
    steps `start+1 .. start+steps` (the fence before start_trace drains
    step `start` and everything earlier, so no prior async step bleeds into
    the capture through the tunnel).

    Usable as a context manager — `with StepProfiler(dir) as prof:` — which
    guarantees the trace is stopped even if the train loop raises (e.g. the
    NaN-loss ValueError), so a later start_trace in the same process cannot
    fail with "profiler already running".

    The reference has no profiler hook-up at all (SURVEY.md §5); this is the
    TPU-native equivalent of "run it under nsight": the dumped directory is
    viewable with tensorboard's profile plugin / xprof.
    """

    def __init__(self, logdir: Optional[str], start: int = 2, steps: int = 3):
        self.logdir = logdir
        self.start = start
        self.stop = start + steps
        self._running = False

    def __enter__(self) -> "StepProfiler":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # No fence on the exception path: the raising step may hold a bad
        # value; stopping the trace unfenced is safe (partial window).
        self.close()

    def tick(self, step: int, fence_on=None) -> None:
        if self.logdir is None:
            return
        if not self._running and self.start <= step < self.stop:
            if fence_on is not None:
                fence(fence_on)  # drain in-flight prior steps out of the window
            jax.profiler.start_trace(self.logdir)
            self._running = True
        elif self._running and step >= self.stop:
            if fence_on is not None:
                fence(fence_on)
            jax.profiler.stop_trace()
            self._running = False
            print(f"profiler trace written to {self.logdir}")

    def close(self, fence_on=None) -> None:
        """Stop the trace if the loop ended inside the capture window."""
        if self._running:
            if fence_on is not None:
                fence(fence_on)
            jax.profiler.stop_trace()
            self._running = False
            print(f"profiler trace written to {self.logdir}")


def fence(x) -> float:
    """Device fence that is reliable through the remote-TPU tunnel: a scalar
    host transfer (block_until_ready alone can return early there)."""
    return float(jnp.sum(x).astype(jnp.float32)) if hasattr(x, "dtype") else 0.0


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Mean seconds per call (compiled fn; fences on the last output)."""
    for _ in range(warmup):
        fence(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# Analytic cost models
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Cost:
    flops: float  # multiply-accumulate * 2
    bytes_hbm: float  # parameter + activation traffic lower bound


def transformer_forward_cost(
    n_layers: int,
    hidden: int,
    ffn: int,
    seq: int,
    batch: int,
    vocab: int = 0,
    heads: Optional[int] = None,
    param_bytes: int = 2,
) -> Cost:
    """Dense-transformer forward: QKV/out projections + FFN + attention
    einsums (+ optional LM head). Byte count is the one-pass parameter read
    (weights dominate at small batch) — a lower bound for the roofline."""
    tokens = seq * batch
    proj = 4 * hidden * hidden  # q,k,v,out
    ffn_p = 2 * hidden * ffn
    per_layer_matmul = 2 * tokens * (proj + ffn_p)
    attn = 4 * batch * seq * seq * hidden  # QK^T + PV, all heads combined
    head = 2 * tokens * hidden * vocab if vocab else 0.0
    flops = n_layers * (per_layer_matmul + attn) + head
    params = n_layers * (proj + ffn_p + 4 * hidden) + hidden * vocab
    return Cost(flops=flops, bytes_hbm=params * param_bytes)


def attention_cost(batch: int, heads: int, seq_q: int, seq_k: int, head_dim: int,
                   dtype_bytes: int = 2) -> Cost:
    """The fused flash-softmax₁ kernel's work: QK^T + PV FLOPs; HBM traffic =
    one read of Q/K/V + one write of O (scores never leave VMEM)."""
    flops = 4.0 * batch * heads * seq_q * seq_k * head_dim
    io = batch * heads * (2 * seq_q + 2 * seq_k) * head_dim * dtype_bytes
    return Cost(flops=flops, bytes_hbm=io)


def roofline_report(
    cost: Cost,
    seconds: float,
    dtype: str = "bf16",
    peaks: Optional[dict] = None,
) -> Dict[str, float]:
    """Measured time + analytic cost → utilization fractions.

    `sol_fraction` is the max of compute- and bandwidth-utilization: a kernel
    at its roofline has sol_fraction ≈ 1 on whichever resource binds it."""
    p = device_peaks(peaks)
    peak_flops = (p["int8_tops"] if dtype == "int8" else p["bf16_tflops"]) * 1e12
    achieved_flops = cost.flops / seconds
    achieved_bw = cost.bytes_hbm / seconds
    compute_frac = achieved_flops / peak_flops
    bw_frac = achieved_bw / (p["hbm_gbps"] * 1e9)
    return {
        "seconds": seconds,
        "achieved_tflops": achieved_flops / 1e12,
        "compute_fraction": compute_frac,
        "achieved_gbps": achieved_bw / 1e9,
        "bandwidth_fraction": bw_frac,
        "sol_fraction": max(compute_frac, bw_frac),
        "arithmetic_intensity": cost.flops / max(cost.bytes_hbm, 1.0),
    }


# Per-chip aggregate ICI bandwidth (GB/s, bidirectional, all links) and
# host-level DCN — public figures; override via the `peaks=` argument.
# v5e: 1,600 Gbps ICI per chip; v5p: 4,800 Gbps; v4: 2,400 Gbps.
ICI_GBPS: Dict[str, float] = {
    "TPU v4": 300.0,
    "TPU v5 lite": 200.0,
    "TPU v5e": 200.0,
    "TPU v5p": 600.0,
    "TPU v6e": 448.0,
}
DCN_GBPS_PER_HOST = 25.0  # 200 Gbps NIC, the usual pod-slice host fabric


def scaling_report(
    n_layers: int,
    hidden: int,
    ffn: int,
    seq: int,
    per_chip_batch: int,
    vocab: int,
    dp: int,
    tp: int = 1,
    *,
    measured_mfu: float = 0.5,
    chips_per_host: int = 8,
    param_bytes: int = 2,
    act_bytes: int = 2,
    peaks: Optional[dict] = None,
) -> Dict[str, float]:
    """PROJECTED multi-chip training-step efficiency for a dp×tp mesh.

    Multi-chip hardware is not reachable from this sandbox (BASELINE.md
    target "tokens/s/chip at 1/N chips"), so this grounds the projection in
    what IS measured: single-chip MFU (`measured_mfu`, e.g. 0.52 for the
    BERT-base MLM train step, probe31) and public fabric bandwidths.

    Collective volumes per chip per step (ring algorithms, 2(n-1)/n factor):
      * dp gradient all-reduce: 2 · P_bytes · (dp−1)/dp — rides DCN when dp
        spans hosts (the mesh layout puts `data` outermost, parallel/mesh.py)
        and overlaps with the backward in XLA's latency-hiding scheduler;
      * tp activation all-reduces: 2 per layer per direction (out-proj and
        FFN-down row-parallel sums), each 2 · tokens·hidden·act_bytes ·
        (tp−1)/tp, riding ICI.

    Returns step-time components (s) and `scaling_efficiency` = compute /
    (compute + exposed collectives), under the stated overlap assumptions
    (dp all-reduce fully overlapped, tp all-reduces exposed — the
    conservative end for tp)."""
    p = device_peaks(peaks)
    kind = jax.devices()[0].device_kind if jax.devices() else "TPU v5e"
    ici = (peaks or {}).get("ici_gbps", ICI_GBPS.get(kind, 200.0)) * 1e9

    fwd = transformer_forward_cost(
        n_layers, hidden, ffn, seq, per_chip_batch * tp, vocab=vocab,
        param_bytes=param_bytes,
    )
    train_flops_per_chip = 3.0 * fwd.flops / tp
    compute_s = train_flops_per_chip / (
        p["bf16_tflops"] * 1e12 * max(measured_mfu, 1e-6)
    )

    params = n_layers * (4 * hidden * hidden + 2 * hidden * ffn) + hidden * vocab
    dp_bytes = 2.0 * params * param_bytes * (dp - 1) / max(dp, 1)
    n_hosts = max(1, dp * tp // chips_per_host)
    dp_fabric = ici if dp * tp <= chips_per_host or n_hosts == 1 else (
        DCN_GBPS_PER_HOST * 1e9 / max(1, chips_per_host // tp)
    )
    dp_s = dp_bytes / dp_fabric if dp > 1 else 0.0

    tokens = per_chip_batch * tp * seq
    tp_bytes = (
        2.0  # fwd + bwd
        * 2 * n_layers  # two row-parallel sums per layer
        * 2.0 * tokens * hidden * act_bytes * (tp - 1) / max(tp, 1)
    )
    tp_s = tp_bytes / ici if tp > 1 else 0.0

    exposed = tp_s + max(0.0, dp_s - compute_s)  # dp overlaps with bwd
    step_s = compute_s + exposed
    return {
        "compute_s": compute_s,
        "dp_allreduce_s": dp_s,
        "tp_allreduce_s": tp_s,
        "exposed_collective_s": exposed,
        "step_s": step_s,
        "tokens_per_s_per_chip": tokens / tp / step_s,
        "scaling_efficiency": compute_s / step_s,
    }


def pipeline_scaling_report(
    n_layers: int,
    hidden: int,
    ffn: int,
    seq: int,
    per_chip_batch: int,
    vocab: int,
    n_stages: int,
    n_micro: int,
    n_data: int = 1,
    *,
    measured_mfu: float = 0.5,
    act_bytes: int = 2,
    peaks: Optional[dict] = None,
) -> Dict[str, float]:
    """PROJECTED GPipe efficiency for the ('pipe','data') mesh of
    parallel/pipeline.py, grounded like `scaling_report` in the measured
    single-chip MFU.

    Components:
      * bubble: the hard GPipe bound M/(M+S−1) — the schedule runs M+S−1
        ticks, each stage computes during M of them;
      * hop: one (mb, seq, hidden) activation ppermute per tick per
        direction over ICI — tiny next to a stage's compute, but modeled;
      * per-stage compute: 1/S of the layer FLOPs (embedding/head run
        replicated and are excluded from the trunk split, matching the
        module's design).
    """
    p = device_peaks(peaks)
    kind = jax.devices()[0].device_kind if jax.devices() else "TPU v5e"
    ici = (peaks or {}).get("ici_gbps", ICI_GBPS.get(kind, 200.0)) * 1e9

    assert n_layers % n_stages == 0 and n_micro >= 1
    mb = max(per_chip_batch // n_micro, 1)
    trunk = transformer_forward_cost(
        n_layers, hidden, ffn, seq, mb, vocab=0, param_bytes=act_bytes
    )
    stage_tick_s = (3.0 * trunk.flops / n_stages) / (
        p["bf16_tflops"] * 1e12 * max(measured_mfu, 1e-6)
    )
    hop_s = (mb * seq * hidden * act_bytes) / ici
    ticks = n_micro + n_stages - 1
    bubble_eff = n_micro / ticks
    step_s = ticks * (stage_tick_s + 2.0 * hop_s)  # fwd + bwd hops
    ideal_s = n_micro * stage_tick_s
    tokens = per_chip_batch * seq * n_data
    return {
        "bubble_efficiency": bubble_eff,
        "stage_tick_s": stage_tick_s,
        "hop_s": hop_s,
        "step_s": step_s,
        "pipeline_efficiency": ideal_s / step_s,
        "tokens_per_s_per_chip": tokens / (n_stages * n_data) / step_s,
    }
