"""STanHop train/test/eval driver — `main_stanhop.py` + `Exp_Stanhop` parity.

CLI mirrors `STanHop_time_seeries/main_stanhop.py` (data/in_len/out_len/
seg_len/win_size/factor/d_model/d_ff/n_heads/e_layers/dropout/mode/eta/gamma/
itr…). The experiment harness reproduces `cross_exp/exp_stanhop.py`:

  train (:195-288): Adam + MSE, grad-clip 5.0, per-epoch vali on val+test,
      EarlyStopping(patience) with best-checkpoint save, `adjust_learning_rate`
      type1 halving, args.json + scale_statistic persisted for reproducible
      eval (:203-207), NaN-loss raise (:263-264).
  test (:290-401): MAE/MSE/RMSE/MAPE/MSPE + ∞-norm/kurtosis telemetry over
      decoder probes → results dir.
  eval (:415-481): restore args.json + scale_statistic + checkpoint, re-test
      (also `eval_crossformer.py`).

Also supports `--quantize`: W8A8 PTQ of the trained forecaster — the
capability the reference's empty `OutEffHop/STanHop_outlier/` advertises.
Hermetic by default (synthetic multi-sine series); pass `--root_path/--data`
to read an ETT-style CSV.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from outeffhop_tpu.data.timeseries import MTSWindows, load_mts_csv, synthetic_mts
from outeffhop_tpu.models.stanhop import STanHopConfig, init_stanhop_params, stanhop_forward
from outeffhop_tpu.utils.metrics import metric
from outeffhop_tpu.utils.train_tools import EarlyStopping, adjust_learning_rate
from outeffhop_tpu.utils.checkpoint import save_params_npz, load_params_npz

DATA_PARSER = {
    # data → (csv, dim, split) (main_stanhop.py:68-78)
    "ETTh1": ("ETTh1.csv", 7, [12 * 30 * 24, 4 * 30 * 24, 4 * 30 * 24]),
    "ETTm1": ("ETTm1.csv", 7, [4 * 12 * 30 * 24, 4 * 4 * 30 * 24, 4 * 4 * 30 * 24]),
    "WTH": ("WTH.csv", 12, [28 * 30 * 24, 10 * 30 * 24, 10 * 30 * 24]),
    "ECL": ("ECL.csv", 321, [15 * 30 * 24, 3 * 30 * 24, 4 * 30 * 24]),
    "ILI": ("national_illness.csv", 7, [0.7, 0.1, 0.2]),
    "Traffic": ("traffic.csv", 862, [0.7, 0.1, 0.2]),
    "synthetic": (None, 7, [0.7, 0.1, 0.2]),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, default="synthetic", choices=list(DATA_PARSER))
    p.add_argument("--root_path", type=str, default="./datasets/")
    p.add_argument("--checkpoints", type=str, default="./stanhop_checkpoints/")
    p.add_argument("--in_len", type=int, default=168)
    p.add_argument("--out_len", type=int, default=24)
    p.add_argument("--seg_len", type=int, default=6)
    p.add_argument("--win_size", type=int, default=2)
    p.add_argument("--factor", type=int, default=10)
    p.add_argument("--data_dim", type=int, default=None)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--d_ff", type=int, default=512)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--e_layers", type=int, default=3)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--mode", type=str, default="entmax")
    p.add_argument("--eta", type=float, default=1.1)
    p.add_argument("--gamma", type=float, default=-0.1)
    p.add_argument("--baseline", action="store_true")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--train_epochs", type=int, default=3)
    p.add_argument("--patience", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lradj", type=str, default="type1")
    p.add_argument("--itr", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_pred", action="store_true")
    p.add_argument("--synthetic_len", type=int, default=2000)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--execute_int8", action="store_true",
                   help="with --quantize: run calibrated symmetric dense "
                        "weights as real int8*int8->int32 MXU ops "
                        "(quant/int8_exec.py) instead of fake-quant "
                        "simulation — same flag as validate_mlm/clm/vit")
    p.add_argument("--est_num_batches", type=int, default=8)
    p.add_argument("--save_quantized_dir", type=str, default=None,
                   help="with --quantize: save the calibrated quant state "
                        "(qparams + int8 weights under --execute_int8) — the "
                        "quantized-STanHop checkpoints the reference README "
                        "advertises but ships no code for "
                        "(OutEffHop/STanHop_outlier/ is empty)")
    p.add_argument("--load_quantized_dir", type=str, default=None,
                   help="reload a saved quant state and skip recalibration")
    p.add_argument("--eval_dir", type=str, default=None,
                   help="restore args.json+checkpoint from a past run and test only")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of train steps "
                        "2..4 into this directory (see run_mlm --profile_dir)")
    p.add_argument("--platform", type=str, default=None)
    return p


def get_data(args, flag: str, scale_statistic=None) -> MTSWindows:
    csv, dim, split = DATA_PARSER[args.data]
    if args.data == "synthetic":
        raw = synthetic_mts(args.synthetic_len, dim=args.data_dim or dim, seed=7)
        split = [0.7, 0.1, 0.2]
    else:
        raw = load_mts_csv(os.path.join(args.root_path, csv))
    return MTSWindows(raw, flag, args.in_len, args.out_len, data_split=split,
                      scale_statistic=scale_statistic)


def make_config(args) -> STanHopConfig:
    _, dim, _ = DATA_PARSER[args.data]
    return STanHopConfig(
        data_dim=args.data_dim or dim,
        in_len=args.in_len, out_len=args.out_len, seg_len=args.seg_len,
        win_size=args.win_size, factor=args.factor, d_model=args.d_model,
        d_ff=args.d_ff, n_heads=args.n_heads, e_layers=args.e_layers,
        dropout=args.dropout, baseline=args.baseline,
        eta=args.eta, gamma=args.gamma, mode=args.mode,
    )


def train(args, cfg: STanHopConfig, setting: str):
    train_set = get_data(args, "train")
    val_set = get_data(args, "val", train_set.scaler.statistic())
    ckpt_dir = os.path.join(args.checkpoints, setting)
    os.makedirs(ckpt_dir, exist_ok=True)
    # args.json + scale_statistic.pkl (exp_stanhop.py:203-207)
    with open(os.path.join(ckpt_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
    with open(os.path.join(ckpt_dir, "scale_statistic.pkl"), "wb") as f:
        pickle.dump(train_set.scaler.statistic(), f)

    params = init_stanhop_params(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),  # exp_stanhop.py:252
        optax.inject_hyperparams(optax.adam)(learning_rate=args.learning_rate),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y, rng):
        def loss_fn(p):
            pred = stanhop_forward(p, cfg, x, dropout_rng=rng, deterministic=False)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_mse(params, x, y):
        pred = stanhop_forward(params, cfg, x)
        return jnp.sum((pred - y) ** 2), pred.size

    def vali(params, dataset):
        tot, cnt = 0.0, 0
        for x, y in dataset.batches(args.batch_size):
            s, n = eval_mse(params, jnp.asarray(x), jnp.asarray(y))
            tot += float(s)
            cnt += int(n)
        return tot / max(cnt, 1)

    stopper = EarlyStopping(patience=args.patience)
    # dropout_key also resets the process-global dropout bit-width (a prior
    # in-process run_mlm(--dropout_rng_bits 8) must not leak into this run)
    from outeffhop_tpu.drivers.common import dropout_key

    rng = dropout_key(args.seed + 1, getattr(args, "rng_impl", "auto"),
                      getattr(args, "dropout_rng_bits", 32))
    from outeffhop_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler(getattr(args, "profile_dir", None))
    try:
        step_idx = 0
        for epoch in range(args.train_epochs):
            lr = adjust_learning_rate(args.learning_rate, epoch + 1, args.lradj)
            opt_state.inner_states if hasattr(opt_state, "inner_states") else None
            opt_state[1].hyperparams["learning_rate"] = jnp.asarray(lr)
            losses = []
            for i, (x, y) in enumerate(
                train_set.batches(args.batch_size, shuffle=True, seed=epoch)
            ):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = train_step(
                    params, opt_state, jnp.asarray(x), jnp.asarray(y), sub
                )
                profiler.tick(step_idx, fence_on=loss)
                step_idx += 1
                lf = float(loss)
                if not np.isfinite(lf):
                    raise ValueError("NaN loss")  # exp_stanhop.py:263-264
                losses.append(lf)
            val_loss = vali(params, val_set)
            print(f"epoch {epoch}: train {np.mean(losses):.5f} val {val_loss:.5f} lr {lr:g}")
            save, stop = stopper.update(val_loss)
            if save:
                save_params_npz(os.path.join(ckpt_dir, "checkpoint.npz"), jax.device_get(params))
            if stop:
                break
    finally:
        profiler.close()
    # reload best (exp_stanhop.py:283-286)
    params = load_params_npz(os.path.join(ckpt_dir, "checkpoint.npz"), params)
    return params, train_set.scaler.statistic()


def test(args, cfg: STanHopConfig, params, scale_statistic, setting: str,
         qctx=None):
    from outeffhop_tpu.ops.telemetry import ProbeTape, ScopedTape
    from outeffhop_tpu.quant.calibrate import NULL_QCTX
    from outeffhop_tpu.drivers.common import aggregate_telemetry

    test_set = get_data(args, "test", scale_statistic)
    preds, trues = [], []
    probe_sums, probe_counts = {}, {}
    q = qctx if qctx is not None else NULL_QCTX
    for i, (x, y) in enumerate(test_set.batches(args.batch_size)):
        tape = ProbeTape() if i < 32 else None
        pred = stanhop_forward(
            params, cfg, jnp.asarray(x), q=q,
            tape=ScopedTape(tape, "") if tape else ScopedTape(None, ""),
        )
        preds.append(np.asarray(pred))
        trues.append(y)
        if tape:
            for k, v in tape.values.items():
                probe_sums[k] = probe_sums.get(k, 0.0) + float(v)
                probe_counts[k] = probe_counts.get(k, 0) + 1
    pred = np.concatenate(preds)
    true = np.concatenate(trues)
    mae, mse, rmse, mape, mspe = metric(pred, true)
    telem = aggregate_telemetry({k: probe_sums[k] / probe_counts[k] for k in probe_sums})
    results = {"mae": mae, "mse": mse, "rmse": rmse, "mape": mape, "mspe": mspe, **telem}
    out_dir = os.path.join("results", setting)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "metrics.npy"), np.array([mae, mse, rmse, mape, mspe]))
    if args.save_pred:
        np.save(os.path.join(out_dir, "pred.npy"), pred)
        np.save(os.path.join(out_dir, "true.npy"), true)
    with open(os.path.join(out_dir, "all_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))
    return results


def quantize_forecaster(args, cfg, params, scale_statistic):
    """W8A8 PTQ of the trained STanHop (the missing STanHop_outlier capability)."""
    from outeffhop_tpu.drivers.common import build_quant_ctx
    from outeffhop_tpu.quant.config import QuantizedModelConfig

    train_set = get_data(args, "train", scale_statistic)
    calib = []
    for x, _ in train_set.batches(args.batch_size):
        calib.append(jnp.asarray(x))
        if len(calib) >= args.est_num_batches:
            break
    config = QuantizedModelConfig(est_num_batches=args.est_num_batches)
    return build_quant_ctx(
        lambda b, q: stanhop_forward(params, cfg, b, q=q), config, calib,
        execute_int8=getattr(args, "execute_int8", False),
    )


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if not args.quantize:
        for flag in ("execute_int8", "save_quantized_dir", "load_quantized_dir"):
            if getattr(args, flag):
                parser.error(f"--{flag} requires --quantize (it is silently "
                             "a no-op otherwise)")
    if args.execute_int8 and args.load_quantized_dir:
        print("WARNING: --execute_int8 with --load_quantized_dir: the loaded "
              "checkpoint decides the execution mode; if it was saved without "
              "--execute_int8 it carries no int8 weights and this flag has "
              "no effect.")
    if args.execute_int8 and args.d_model < 1024:
        print(f"WARNING: --execute_int8 at d_model={args.d_model}: real int8 "
              "execution MEASURED SLOWER than fp32 at small-tile forecaster "
              "shapes (probe42: 8.31 vs 7.29 ms/step at d_model=256 — "
              "per-site quant/dequant overhead exceeds the int8 MXU win "
              "below ~1024-wide matmuls). Use it for deployment-parity "
              "accuracy evaluation, not speed.")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.eval_dir:  # eval_crossformer.py path
        with open(os.path.join(args.eval_dir, "args.json")) as f:
            saved = json.load(f)
        for k, v in saved.items():
            if k not in ("eval_dir", "platform") and hasattr(args, k):
                setattr(args, k, type(getattr(args, k))(v) if getattr(args, k) is not None else v)
        cfg = make_config(args)
        with open(os.path.join(args.eval_dir, "scale_statistic.pkl"), "rb") as f:
            stat = pickle.load(f)
        params = load_params_npz(
            os.path.join(args.eval_dir, "checkpoint.npz"),
            init_stanhop_params(jax.random.PRNGKey(0), cfg),
        )
        return test(args, cfg, params, stat, "eval")

    all_results = []
    for it in range(args.itr):
        setting = (
            f"stanhop_{args.data}_il{args.in_len}_ol{args.out_len}"
            f"_sl{args.seg_len}_win{args.win_size}_fa{args.factor}"
            f"_dm{args.d_model}_nh{args.n_heads}_el{args.e_layers}_itr{it}"
        )
        args.seed = args.seed + it
        cfg = make_config(args)
        params, stat = train(args, cfg, setting)
        res = test(args, cfg, params, stat, setting)
        if args.quantize:
            if args.load_quantized_dir:
                # recalibration-free reload (validate_clm --load_quantized_dir)
                from outeffhop_tpu.quant.checkpoint import quant_ctx_from_ckpt

                qctx = quant_ctx_from_ckpt(args.load_quantized_dir)
            else:
                qctx = quantize_forecaster(args, cfg, params, stat)
            if args.save_quantized_dir:
                from outeffhop_tpu.quant.checkpoint import save_quantized_ckpt

                save_quantized_ckpt(args.save_quantized_dir, qctx)
            qres = test(args, cfg, params, stat, setting + "_int8", qctx=qctx)
            res.update({f"int8_{k}": v for k, v in qres.items()})
        all_results.append(res)
    return all_results


if __name__ == "__main__":
    main()
