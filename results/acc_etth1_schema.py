"""Driver-round-5 accuracy row (VERDICT r4 missing #1): a PINNED,
realistic-scale ETTh1-schema series driven through the FULL main_stanhop
train -> test -> eval path, producing a reproducible forecasting MSE/MAE
BASELINE row entirely in-sandbox (the real ETTh1 CSV needs network; this
generates a deterministic series with ETTh1's exact schema — 17420 hourly
rows x 7 channels + date column — and uses the reference's ETTh1 border
arithmetic 12*30*24 / 4*30*24 / 4*30*24, `data_loader.py:37-47`).

Run:  python results/acc_etth1_schema.py [--platform cpu]
Produces results/etth1_schema/ETTh1.csv (pinned, seed 1234) and prints the
train/test metrics plus the eval-restore re-test (must match bit-for-bit).
"""

import json
import os
import sys

import numpy as np

ROWS = 17420  # real ETTh1 length
DIM = 7
SEED = 1234
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "etth1_schema")


def make_pinned_csv() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "ETTh1.csv")
    rs = np.random.RandomState(SEED)
    t = np.arange(ROWS)[:, None]  # hours
    periods = rs.uniform(12, 24 * 30, size=(1, DIM))      # half-day .. month
    phases = rs.uniform(0, 2 * np.pi, size=(1, DIM))
    amps = rs.uniform(0.5, 3.0, size=(1, DIM))
    daily = np.sin(2 * np.pi * t / 24.0 + phases) * amps
    slow = np.sin(2 * np.pi * t / periods + phases * 0.5) * amps * 0.7
    trend = t / ROWS * rs.uniform(-2, 2, size=(1, DIM))
    # AR(1) noise gives the series realistic short-range structure
    eps = rs.randn(ROWS, DIM) * 0.3
    noise = np.empty_like(eps)
    noise[0] = eps[0]
    for i in range(1, ROWS):
        noise[i] = 0.7 * noise[i - 1] + eps[i]
    data = daily + slow + trend + noise
    with open(path, "w") as f:
        cols = ",".join(f"c{i}" for i in range(DIM))
        f.write(f"date,{cols}\n")
        for i in range(ROWS):
            f.write(f"2016-07-01 {i % 24:02d}:00:00,"
                    + ",".join(f"{v:.6f}" for v in data[i]) + "\n")
    return path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    platform = None
    if "--platform" in argv:
        i = argv.index("--platform")
        platform = argv[i + 1]
        del argv[i:i + 2]
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)

    make_pinned_csv()
    from outeffhop_tpu.drivers.main_stanhop import main as stanhop_main

    ckpt = os.path.join(OUT_DIR, "checkpoints")
    common = [
        "--data", "ETTh1", "--root_path", OUT_DIR,
        "--in_len", "168", "--out_len", "24", "--seg_len", "6",
        "--win_size", "2", "--factor", "10",
        "--d_model", "256", "--d_ff", "512", "--n_heads", "4",
        "--e_layers", "3", "--dropout", "0.2", "--mode", "softmax1",
        "--batch_size", "32", "--train_epochs", "3", "--patience", "2",
        "--learning_rate", "1e-4", "--seed", "2024",
        "--checkpoints", ckpt,
    ]
    res = stanhop_main(common)
    print("TRAIN+TEST:", json.dumps(
        {k: res[0][k] for k in ("mae", "mse", "rmse")}, indent=None))

    # eval_crossformer path: restore args.json + scale_statistic + checkpoint
    setting = [d for d in os.listdir(ckpt) if d.startswith("stanhop_ETTh1")][0]
    res_eval = stanhop_main(["--eval_dir", os.path.join(ckpt, setting)])
    print("EVAL-RESTORE:", json.dumps(
        {k: res_eval[k] for k in ("mae", "mse", "rmse")}, indent=None))
    assert abs(res_eval["mse"] - res[0]["mse"]) < 1e-9, "eval restore mismatch"
    print("PASS: eval restore reproduces the test metrics bit-for-bit")


if __name__ == "__main__":
    main()
