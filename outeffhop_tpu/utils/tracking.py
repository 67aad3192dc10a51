"""Experiment tracking — the wandb/TensorBoard surface of the reference.

The reference logs through `accelerator.init_trackers` → wandb/TB
(`run_mlm.py:487-491`, `--with_tracking/--report_to/--run_name`
`args.py:201-220`) plus direct `wandb.init` in `run_vit.py:528-531`. Here a
single `Tracker` fans out to:

  * JSONL (always; `<dir>/metrics.jsonl`, one {"step", ...scalars} per line —
    machine-readable like the reference's all_results.json),
  * TensorBoard via `torch.utils.tensorboard` when requested and available,
  * wandb when requested and importable (not bundled; silently skipped).

Scalar histories stay host-side; nothing here touches traced values — call
with plain floats after the step.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Tracker:
    def __init__(
        self,
        output_dir: Optional[str],
        report_to: str = "jsonl",
        run_name: Optional[str] = None,
        config: Optional[dict] = None,
    ):
        self.run_name = run_name or f"run-{int(time.time())}"
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        wants = report_to.split(",") if report_to else []
        if output_dir and ("tensorboard" in wants or "all" in wants):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb", self.run_name))
            except Exception:
                pass
        if "wandb" in wants or "all" in wants:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="outeffhop_tpu", name=self.run_name, config=config)
            except Exception:
                self._wandb = None
        if config is not None and output_dir:
            with open(os.path.join(output_dir, f"{self.run_name}.config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        clean = {k: float(v) for k, v in metrics.items()}
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **clean}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb:
            self._wandb.log(clean, step=step)

    def log_histogram(self, name: str, values, step: int) -> None:
        """Weight/activation histograms at log intervals — the reference's
        `tb.add_histogram` telemetry (`run_mlm_ddp.py:617-641`). `values` is
        any array-like; JSONL gets summary stats (min/max/mean/absmax) so the
        histogram signal survives without a TB viewer."""
        import numpy as np

        arr = np.asarray(values, dtype=np.float32).ravel()
        if self._jsonl:
            self._jsonl.write(
                json.dumps(
                    {
                        "step": step,
                        f"{name}/min": float(arr.min()),
                        f"{name}/max": float(arr.max()),
                        f"{name}/mean": float(arr.mean()),
                        f"{name}/inf_norm": float(np.abs(arr).max()),
                    }
                )
                + "\n"
            )
            self._jsonl.flush()
        if self._tb:
            self._tb.add_histogram(name, arr, step)
        if self._wandb:
            self._wandb.log({name: self._wandb.Histogram(arr)}, step=step)

    def finish(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None
        if self._tb:
            self._tb.close()
        if self._wandb:
            self._wandb.finish()


class NullTracker:
    def log(self, metrics, step):
        pass

    def log_histogram(self, name, values, step):
        pass

    def finish(self):
        pass


def init_tracker(args, config: Optional[dict] = None):
    """`--with_tracking/--report_to/--run_name` → Tracker (or a no-op)."""
    if not getattr(args, "with_tracking", False):
        return NullTracker()
    return Tracker(
        output_dir=getattr(args, "output_dir", None),
        report_to=getattr(args, "report_to", "jsonl") or "jsonl",
        run_name=getattr(args, "run_name", None),
        config=config,
    )
