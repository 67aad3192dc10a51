"""Checkpoint save/restore — Orbax-backed with the reference's semantics.

Replaces `accelerator.save_state`/`load_state` (`run_mlm.py:606-611,520`) and
HF `save_pretrained` (`:790-799`). Training state (params + opt state + step)
goes through Orbax (async-capable, TPU-sharding-aware); plain param pytrees
can also round-trip to a flat .npz for portability.

Resume naming parity: checkpoints are saved under `step_{N}`/`epoch_{N}`
directories and `latest_checkpoint()` re-derives the resume point by parsing
those names (`run_mlm.py:517-543`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix[:-1] + "|none"] = np.zeros(0)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params_npz(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_params_npz(path: str, like) -> Any:
    """Restore into the structure of `like` (list-vs-dict shape preserved)."""
    flat = dict(np.load(path))

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [build(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        key = prefix[:-1]
        if key + "|none" in flat:
            return None
        import jax.numpy as jnp

        return jnp.asarray(flat[key])

    return build(like)


def save_checkpoint(ckpt_dir: str, name: str, state) -> str:
    """Save a pytree train state under ckpt_dir/name via Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), item=jax.device_get(like))
    return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[str, str, int]]:
    """Find the newest `step_{i}` / `epoch_{i}` dir (run_mlm.py:517-543).
    Returns (path, kind, index) or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(step|epoch)_(\d+)", d)
        if m:
            idx = int(m.group(2))
            if best is None or idx > best[2]:
                best = (os.path.join(ckpt_dir, d), m.group(1), idx)
    return best


def prune_checkpoints(ckpt_dir: str, keep: int) -> list:
    """Keep only the newest `keep` step_/epoch_ checkpoints
    (`--max_checkpointing_number`; the reference's accelerate
    `project_configuration.total_limit`, `run_mlm.py:108-109`). Returns the
    removed paths."""
    import shutil

    if not os.path.isdir(ckpt_dir) or keep is None or keep <= 0:
        return []
    found = []
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(step|epoch)_(\d+)", d)
        if m:
            found.append((int(m.group(2)), os.path.join(ckpt_dir, d)))
    found.sort()
    removed = []
    for _, path in found[:-keep] if keep < len(found) else []:
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def save_run_config(path: str, args: dict) -> None:
    """args.json for reproducible eval (`exp_stanhop.py:203-207`)."""
    with open(path, "w") as f:
        json.dump(args, f, indent=2, default=str)


def load_run_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
