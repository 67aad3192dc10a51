"""Shared driver machinery: model building from args, PTQ quantize block,
telemetry aggregation, results writing.

The quantize block reproduces `validate_mlm_config.py:408-478` /
`validate_clm.py:418-499`: build QuantizedModelConfig from CLI → discover
sites with one forward → weight qparams → `pass_data_for_range_estimation`
(calibration scan) → freeze ranges → quantized eval context.

Telemetry aggregation reproduces `validate_mlm_config.py:542-575`: per-probe
∞-norms and kurtosis averaged over batches, then max/avg across probes.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.telemetry import ProbeTape, ScopedTape
from outeffhop_tpu.quant import (
    QuantCtx,
    ScopedQuantCtx,
    compute_weight_qparams,
    freeze_act_qparams,
    run_calibration,
)
from outeffhop_tpu.quant.calibrate import NULL_QCTX
from outeffhop_tpu.quant.config import QuantizedModelConfig


def build_quant_ctx(
    forward_with_qctx: Callable,
    config: QuantizedModelConfig,
    calib_batches: Iterable,
    execute_int8: bool = False,
) -> ScopedQuantCtx:
    """discover → weight qparams → calibrate → freeze → run-mode ctx.

    `execute_int8=True` additionally freezes every calibrated symmetric dense
    weight to Int8Dense so those matmuls run as real int8×int8→int32 MXU ops
    (quant/int8_exec.py) instead of the fake-quant simulation."""
    calib_batches = list(calib_batches)
    # discovery is a trace (jax.eval_shape) — site recording happens at trace
    # time with no device execution (QuantCtx.trace_discovery)
    ctx = QuantCtx.trace_discovery(config, forward_with_qctx, calib_batches[0])
    wq = compute_weight_qparams(ctx.discovered_weights, config)
    est = run_calibration(forward_with_qctx, config, wq, calib_batches)
    aq = freeze_act_qparams(est, config)
    int8_map = None
    if execute_int8:
        from outeffhop_tpu.quant.int8_exec import build_int8_dense_map

        int8_map = build_int8_dense_map(ctx.discovered_weights, wq)
    return ScopedQuantCtx(QuantCtx.run(config, wq, aq, int8_dense=int8_map), "")


def token_nll(logits, labels, ignore_index=-100, shift=False):
    """(sum of per-token NLL, token count) in the logsumexp formulation —
    -logp[y] = logsumexp(logits) - logits[y], so the (B, S, V) f32
    log-probability tensor is never materialized (probe28: ~1 ms/step of
    pure HBM traffic on BERT-base at B32xS128). Shared by every MLM/CLM
    driver loss; `shift=True` applies the causal-LM one-token shift."""
    if shift:
        logits = logits[:, :-1]
        labels = labels[:, 1:]
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logits, safe[..., None], axis=-1
    )[..., 0].astype(jnp.float32)
    nll = lse - picked
    return jnp.sum(jnp.where(mask, nll, 0.0)), jnp.sum(mask)


def eval_loop(
    loss_and_count: Callable,
    batches: Iterable,
    qctx: ScopedQuantCtx = NULL_QCTX,
    collect_telemetry: bool = True,
    max_telemetry_batches: int = 256,
):
    """Average loss over batches; optional probe telemetry on the same passes.

    `loss_and_count(batch, qctx, tape)` → (sum_loss, n_items). Returns
    (mean_loss, telemetry_dict).

    Host-boundary discipline (VERDICT r3 #8), two layers:
      * each batch runs as ONE jitted program — the tape's probe values are
        auxiliary jitted outputs (the design `ops/telemetry.ProbeTape`
        documents), so telemetry adds fused reductions to the graph instead
        of eager per-probe dispatches (round-4 probe24 measured the eager
        version at 4.3× the telemetry-off eval through the ~100 ms tunnel);
      * per-batch scalars stay ON DEVICE and pipeline asynchronously;
        everything crosses the host boundary ONCE at the end (one stacked
        reduction per quantity — the round-3 version blocked per value)."""
    losses, counts = [], []
    probe_vals: Dict[str, list] = {}

    def make_fn(with_tape: bool):
        def fn(batch):
            tape = ProbeTape() if with_tape else None
            stape = ScopedTape(tape, "")
            s, n = loss_and_count(batch, qctx, stape)
            vals = (
                {k: jnp.asarray(v, jnp.float32).reshape(()) for k, v in tape.values.items()}
                if tape is not None
                else {}
            )
            return (
                jnp.asarray(s, jnp.float32).reshape(()),
                jnp.asarray(n, jnp.float32).reshape(()),
                vals,
            )

        return jax.jit(fn)

    compiled = {}
    for i, batch in enumerate(batches):
        with_tape = collect_telemetry and i < max_telemetry_batches
        if with_tape not in compiled:
            compiled[with_tape] = make_fn(with_tape)
        s, n, vals = compiled[with_tape](batch)
        losses.append(s)
        counts.append(n)
        for k, v in vals.items():
            probe_vals.setdefault(k, []).append(v)
    if not losses:
        return 0.0, aggregate_telemetry({})
    keys = sorted(probe_vals)
    # one device reduction producing a single flat vector, one host transfer
    summary = jnp.stack(
        [jnp.sum(jnp.stack(losses)), jnp.sum(jnp.stack(counts))]
        + [jnp.mean(jnp.stack(probe_vals[k])) for k in keys]
    )
    host = np.asarray(summary)
    mean_loss = float(host[0]) / max(float(host[1]), 1.0)
    telem = aggregate_telemetry({k: float(host[2 + i]) for i, k in enumerate(keys)})
    return mean_loss, telem


def aggregate_telemetry(per_probe: Dict[str, float]) -> Dict[str, float]:
    """validate_mlm_config.py:553-575 aggregation: max/avg over probes for
    ∞-norms and kurtosis (probe keys end with |inf_norm / |kurtosis)."""
    inf_norms = {k: v for k, v in per_probe.items() if k.endswith("|inf_norm")}
    kurts = {k: v for k, v in per_probe.items() if k.endswith("|kurtosis")}
    out: Dict[str, float] = {}
    if inf_norms:
        out["max_inf_norm"] = max(inf_norms.values())
        out["avg_inf_norm"] = float(np.mean(list(inf_norms.values())))
        ln_in = [v for k, v in inf_norms.items() if "ln_input" in k or "LayerNorm_input" in k]
        if ln_in:
            out["max_ln_input_inf_norm"] = max(ln_in)
        ffn = [v for k, v in inf_norms.items() if "output.dense" in k or "fc2" in k]
        if ffn:
            out["max_ffn_out_inf_norm"] = max(ffn)
    if kurts:
        out["avg_kurtosis"] = float(np.mean(list(kurts.values())))
        out["max_kurtosis"] = max(kurts.values())
    return out


def write_results(output_dir: Optional[str], results: dict, verbose: bool = True):
    """all_results.json (`validate_mlm_config.py:577-580`)."""
    if verbose:
        print(json.dumps(results, indent=2, default=float))
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "all_results.json"), "w") as f:
            json.dump(results, f, indent=2, default=float)


def resolve_train_use_flash(
    arg: Optional[bool],
    *,
    causal: bool,
    n_layers: int,
    batch: int,
    seq: int,
    n_heads: int,
) -> bool:
    """Measured-regime TRAIN-step flash policy (BASELINE.md probe45/45b/21).

    Explicit --use_flash/--no_flash always wins. Otherwise (auto):
      * non-TPU backends: off (Pallas kernels are TPU programs).
      * bidirectional models (BERT/ViT): ON — the packed one-pass backward
        measured +10% e2e on the ViT-base train step (probe21), and the
        per-shape dispatch gate inside the models still routes to XLA
        wherever XLA wins, so enabling is safe at gated shapes.
      * causal models (OPT): on ONLY past the memory threshold where the
        streaming recurrence backward wins. probe45: at T2048·B2 XLA's
        saved-probs backward beats any recompute by ~9% (residuals
        ~2.4 GB fit easily); probe45b: at T4096·B1 (~4.8 GB) flash is
        2.28x, and at T8192 XLA cannot compile at all. The 3.5 GB
        threshold on L·B·H·T² bf16 separates the measured regimes.
    """
    if arg is not None:
        return bool(arg)
    if jax.default_backend() != "tpu":
        return False
    if not causal:
        return True
    residual_bytes = n_layers * batch * n_heads * seq * seq * 2
    return residual_bytes > 3.5 * 1024**3


def dropout_key(seed: int, impl: str = "auto", rng_bits: int = 32):
    """Training dropout PRNG key. `rbg` maps to the TPU's hardware RNG
    (lax.rng_bit_generator); threefry's software counter sequence measured
    34% of the whole BERT train step on chip, and rbg recovered +46% train
    throughput (results/probe25_rng.log). `auto` picks rbg on TPU (matching
    the reference's cheap cuRAND dropout) and threefry elsewhere; pass
    --rng_impl threefry for bit-reproducibility across backends.

    `rng_bits=8` switches every dropout site to uint8 thresholds
    (`models.common.set_dropout_rng_bits`): 4x less generated-bits traffic,
    keep prob rounds to the nearest 1/256 (still exactly unbiased)."""
    from outeffhop_tpu.models.common import set_dropout_rng_bits

    set_dropout_rng_bits(rng_bits)
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if impl == "rbg":
        return jax.random.key(seed, impl="rbg")
    return jax.random.PRNGKey(seed)


def cast_params(params, dtype):
    if dtype == "float32":
        return params
    target = jnp.bfloat16
    return jax.tree.map(
        lambda x: x.astype(target)
        if x is not None and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
        is_leaf=lambda x: x is None,
    )


def build_pipeline_mesh(args):
    """Shared driver helper: the ('pipe','data') mesh for --pipeline_stages,
    with the --pipeline_data fallback of device_count // stages."""
    from outeffhop_tpu.parallel import make_pipe_mesh

    n_dev = jax.device_count()
    n_pdata = args.pipeline_data or max(n_dev // args.pipeline_stages, 1)
    return make_pipe_mesh(
        args.pipeline_stages, n_pdata,
        devices=jax.devices()[: args.pipeline_stages * n_pdata],
    )
