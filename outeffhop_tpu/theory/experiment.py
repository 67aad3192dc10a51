"""MHN retrieval-experiment driver (reference: theory_verification/plotting.py).

Runs the 3-seed sweep over (mode, activation) ∈ {(MHN, softmax1),
(MHN, softmax), (MHN, sparsemax), ...} on a ViH classifier (plotting.py:204-275):
Adam + cosine-annealing LR, per-epoch train/test loss+accuracy logs, CSV
output, optional loss/accuracy curve PNGs (matplotlib gated — headless safe).

TPU-first: the whole epoch is two jitted functions (train_step / eval_step);
UMHN kernel pre-training (`learn_kernel`, plotting.py:103-126) minimizes the
uniformity loss of φ(patches) with SGD, matching the reference's procedure.

CLI:
  python -m outeffhop_tpu.theory.experiment --mode MHN --activation softmax1 \
      --epoch 5 --datasize 512 --out_dir results/theory
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from outeffhop_tpu.theory import data as theory_data
from outeffhop_tpu.theory.functions import uniform_loss
from outeffhop_tpu.theory.models import (
    ViHConfig,
    three_layer_vih_forward,
    three_layer_vih_kernel_forward,
    three_layer_vih_params,
)

Array = jax.Array


@dataclasses.dataclass
class ExpArgs:
    batch_size: int = 128
    data: str = "synthetic"
    update_steps: int = 1
    kernel_epoch: int = 2
    activation: str = "softmax1"
    mode: str = "MHN"
    seed: int = 0
    datasize: int = 512
    patch_size: int = 8
    d_model: int = 512
    init_lr: float = 1e-3
    epoch: int = 5
    n_class: int = 10
    channel: int = 3
    n_heads: int = 4
    img_size: int = 32
    out_dir: str = "results/theory"


def _build(args: ExpArgs) -> ViHConfig:
    return ViHConfig(
        in_channels=args.channel,
        patch_size=args.patch_size,
        d_model=args.d_model,
        img_size=args.img_size,
        n_heads=args.n_heads,
        n_class=args.n_class,
        mode=args.mode,
        activation=args.activation,
        update_steps=args.update_steps,
    )


def _loaders(args: ExpArgs):
    if args.data == "synthetic":
        (xtr, ytr), (xte, yte) = theory_data.synthetic_image_classification(
            n_train=args.datasize,
            n_test=max(args.datasize // 4, args.batch_size),
            n_class=args.n_class,
            img_size=args.img_size,
            channels=args.channel,
            seed=args.seed,
        )
    else:
        xtr, ytr = theory_data.load_torchvision(args.data, root="./data", train=True)
        xte, yte = theory_data.load_torchvision(args.data, root="./data", train=False)
        sel = np.random.RandomState(args.seed).choice(len(xtr), args.datasize, replace=False)
        xtr, ytr = xtr[sel], ytr[sel]
    return (xtr, ytr), (xte, yte)


class Exp:
    """Experiment harness (plotting.py:42-201)."""

    def __init__(self, args: ExpArgs):
        self.args = args
        self.cfg = _build(args)
        key = jax.random.PRNGKey(args.seed)
        self.params = three_layer_vih_params(key, self.cfg)
        # CosineAnnealingLR(T_max=epoch) steps per *epoch* in the reference
        # (plotting.py:172,199); optax schedules count optimizer steps, so
        # scale the horizon by steps-per-epoch.
        steps_per_epoch = max(args.datasize // args.batch_size, 1)
        sched = optax.cosine_decay_schedule(
            args.init_lr, max(args.epoch * steps_per_epoch, 1), alpha=0.0
        )
        self.tx = optax.adam(sched)
        self.opt_state = self.tx.init(self.params)
        self._epoch = 0

        cfg = self.cfg

        def loss_fn(params, x, y, rng):
            logits = three_layer_vih_forward(params, cfg, x, rng=rng, deterministic=False)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, logits

        @jax.jit
        def train_step(params, opt_state, x, y, rng):
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, y, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            matches = jnp.sum(jnp.argmax(logits, -1) == y)
            return params, opt_state, loss, matches

        @jax.jit
        def eval_step(params, x, y):
            logits = three_layer_vih_forward(params, cfg, x, deterministic=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, jnp.sum(jnp.argmax(logits, -1) == y)

        self._train_step = train_step
        self._eval_step = eval_step

    # -- UMHN kernel pre-training (plotting.py:103-126) --------------------
    def learn_kernel(self):
        if self.args.mode != "UMHN":
            return
        cfg = self.cfg
        (xtr, ytr), _ = _loaders(self.args)
        tx = optax.sgd(0.1)
        opt_state = tx.init(self.params)

        def kloss(params, x):
            outs = three_layer_vih_kernel_forward(params, cfg, x)
            total, count = 0.0, 0
            for phi in outs:  # (B, N, D): uniformity per sample over patches
                phi_n = phi / jnp.maximum(
                    jnp.linalg.norm(phi, axis=-1, keepdims=True), 1e-12
                )
                total = total + jax.vmap(uniform_loss)(phi_n).sum()
                count += phi.shape[0]
            return total / count

        @jax.jit
        def step(p, s, x):
            g = jax.grad(kloss)(p, x)
            updates, s = tx.update(g, s, p)
            return optax.apply_updates(p, updates), s
        for _ in range(self.args.kernel_epoch):
            for x, _y in theory_data.iterate_batches(
                xtr, ytr, min(self.args.batch_size, len(xtr)), seed=self.args.seed
            ):
                self.params, opt_state = step(self.params, opt_state, jnp.asarray(x))

    # -- train / test (plotting.py:128-168) ---------------------------------
    def train(self, xs, ys) -> Tuple[float, float]:
        losses, matches, n = [], 0, 0
        # reset the process-global dropout bit-width (see drivers/common.
        # dropout_key) so a prior in-process --dropout_rng_bits run can't leak
        from outeffhop_tpu.models.common import set_dropout_rng_bits

        set_dropout_rng_bits(32)
        rng = jax.random.PRNGKey(1000 * self.args.seed + self._epoch)
        for i, (x, y) in enumerate(
            theory_data.iterate_batches(xs, ys, self.args.batch_size, seed=self._epoch)
        ):
            self.params, self.opt_state, loss, m = self._train_step(
                self.params, self.opt_state, jnp.asarray(x), jnp.asarray(y),
                jax.random.fold_in(rng, i),
            )
            losses.append(float(loss))
            matches += int(m)
            n += len(x)
        self._epoch += 1
        return float(np.mean(losses)), matches / max(n, 1)

    def test(self, xs, ys) -> Tuple[float, float]:
        losses, matches, n = [], 0, 0
        for x, y in theory_data.iterate_batches(
            xs, ys, self.args.batch_size, shuffle=False
        ):
            loss, m = self._eval_step(self.params, jnp.asarray(x), jnp.asarray(y))
            losses.append(float(loss))
            matches += int(m)
            n += len(x)
        return float(np.mean(losses)) if losses else 0.0, matches / max(n, 1)

    def run(self) -> Dict[str, List]:
        (xtr, ytr), (xte, yte) = _loaders(self.args)
        log: Dict[str, List] = {
            "train loss": [], "train acc": [], "test loss": [], "test acc": [],
            "mode": [], "epoch": [],
        }
        if self.args.mode == "UMHN":
            self.learn_kernel()
        for e in range(self.args.epoch):
            tr_loss, tr_acc = self.train(xtr, ytr)
            te_loss, te_acc = self.test(xte, yte)
            log["train loss"].append(tr_loss)
            log["train acc"].append(tr_acc)
            log["test loss"].append(te_loss)
            log["test acc"].append(te_acc)
            log["mode"].append(f"{self.args.mode}+ {self.args.activation}")
            log["epoch"].append(e)
            print(f"[EPOCH] {e} Train Loss: {tr_loss:.4f} Train Acc {tr_acc*100:.2f}")
            print(f"[EPOCH] {e} Test Loss: {te_loss:.4f} Test Acc {te_acc*100:.2f}")
        return log


def save_logs_csv(path: str, logs: List[Dict[str, List]]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = ["epoch", "mode", "train loss", "train acc", "test loss", "test acc"]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(keys)
        for log in logs:
            for row in zip(*(log[k] for k in keys)):
                w.writerow(row)


def plot_curves(path_prefix: str, logs: List[Dict[str, List]]) -> None:
    """Loss/accuracy curves per mode (plotting.py:256-273); no-op if
    matplotlib is unavailable or the backend can't render."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    for metric in ("test loss", "test acc"):
        fig, ax = plt.subplots()
        for log in logs:
            ax.plot(log["epoch"], log[metric], label=log["mode"][0])
        ax.set_xlabel("epoch")
        ax.set_ylabel(metric)
        ax.legend()
        fig.savefig(f"{path_prefix}_{metric.replace(' ', '_')}.png", dpi=120)
        plt.close(fig)


def main(argv: Optional[List[str]] = None) -> List[Dict[str, List]]:
    p = argparse.ArgumentParser()
    for f in dataclasses.fields(ExpArgs):
        if f.type in ("int", int):
            p.add_argument(f"--{f.name}", type=int, default=f.default)
        elif f.type in ("float", float):
            p.add_argument(f"--{f.name}", type=float, default=f.default)
        else:
            p.add_argument(f"--{f.name}", type=str, default=f.default)
    ns = p.parse_args(argv)
    args = ExpArgs(**vars(ns))

    # 3-seed sweep over retrieval activations (plotting.py:204-250).
    sweep = [("MHN", "softmax1"), ("MHN", "softmax"), ("MHN", "sparsemax")]
    if args.mode == "UMHN":
        sweep = [("UMHN", args.activation)]
    logs = []
    for seed in range(3):
        for mode, act in sweep:
            a = dataclasses.replace(args, mode=mode, activation=act, seed=seed)
            print(f"=== seed {seed} mode {mode} activation {act} ===")
            logs.append(Exp(a).run())
    save_logs_csv(os.path.join(args.out_dir, "theory_results.csv"), logs)
    plot_curves(os.path.join(args.out_dir, "theory"), logs)
    return logs


if __name__ == "__main__":
    main()
