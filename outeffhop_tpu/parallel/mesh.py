"""Device mesh + sharding layout — the TPU-native replacement for the
reference's NCCL data-parallel stack.

The reference's only parallelism is DDP (accelerate / NativeDDP / DataParallel;
SURVEY.md §2.8, `run_vit.py:513-567`, `run_mlm_ddp.py:84-92`). On TPU the whole
transport layer disappears: we declare ONE `jax.sharding.Mesh` with a `data`
axis (batch, rides DCN across hosts) and a `model` axis (tensor parallelism,
rides ICI within a slice), annotate parameter and batch shardings with
`NamedSharding`, and let XLA insert/overlap the collectives. Gradient
all-reduce — DDP's core service — falls out of jit automatically: batch is
sharded on `data`, params are replicated over `data`, so XLA emits the psum.

Tensor-parallel layout (Megatron-style, the layout the reference anticipates in
`opt_attention.py:320-322` but never implements):

  * qkv projections        (out, in)  → shard axis 0 on `model` (head-parallel)
  * attention out-proj     (out, in)  → shard axis 1 on `model` (row-parallel)
  * FFN up (intermediate)  (out, in)  → shard axis 0 on `model`
  * FFN down (fc2/output)  (out, in)  → shard axis 1 on `model`
  * embedding / LM head    (vocab, h) → shard axis 0 on `model` (vocab-parallel)
  * LayerNorm, biases of row-parallel layers, gates → replicated

With this layout each transformer block needs exactly one all-reduce per
sub-block (after out-proj / after FFN-down), which XLA emits from the sharding
constraints — no hand-written collectives.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-regex → PartitionSpec factory. First match wins. Paths look like
# "layers/3/attention/query/weight" (pytree path joined with '/').
_RULES = [
    # attention column-parallel projections (BERT naming + OPT naming)
    (r"(query|key|value|q_proj|k_proj|v_proj)/weight$", lambda: P("model", None)),
    (r"(query|key|value|q_proj|k_proj|v_proj)/bias$", lambda: P("model")),
    # row-parallel output projections: shard the contracting (in) dim
    (r"(attention_output/dense|out_proj)/weight$", lambda: P(None, "model")),
    # FFN up: column-parallel
    (r"(intermediate|fc1)/weight$", lambda: P("model", None)),
    (r"(intermediate|fc1)/bias$", lambda: P("model")),
    # FFN down: row-parallel
    (r"(output/dense|fc2)/weight$", lambda: P(None, "model")),
    # vocab-parallel embeddings & output head
    (r"(word|embed_tokens|head/decoder|head/lm)/weight$", lambda: P("model", None)),
    # everything else (LN, row-parallel biases, gates, pos embeddings): replicated
]


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh over all (or given) devices.

    Axis order puts `model` innermost so that TP collectives land on
    neighbouring devices (ICI) and `data` spans hosts (DCN)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model == devices.size, (
        f"mesh {n_data}x{n_model} != {devices.size} devices"
    )
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def _spec_for_path(path: str, leaf) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path):
            s = spec()
            # don't shard dims the leaf doesn't have / that don't divide
            if leaf is not None and hasattr(leaf, "ndim") and leaf.ndim < len(s):
                return P()
            return s
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspecs(params, mesh: Optional[Mesh] = None):
    """PartitionSpec pytree for a model param pytree (BERT or OPT naming).

    If `mesh` is given, specs whose `model` dim does not divide the leaf shape
    are demoted to replicated (keeps tiny test models shardable on any mesh)."""
    msize = mesh.shape["model"] if mesh is not None else 1

    def spec(path, leaf):
        if leaf is None:
            return P()
        s = _spec_for_path(_path_str(path), leaf)
        if mesh is not None:
            for dim, axis in enumerate(s):
                if axis == "model" and leaf.shape[dim] % msize != 0:
                    return P()
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh per `param_pspecs`."""
    specs = param_pspecs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)) if x is not None else None,
        params,
        specs,
        is_leaf=lambda x: x is None,
    )


def batch_pspec() -> P:
    """Batch tensors: leading dim on `data`, rest replicated."""
    return P("data")


# ---------------------------------------------------------------------------
# Multi-host (pod-slice) support — the run_*_ddp.py / SLURM-bootstrap
# equivalent (`run_mlm_ddp.py:84-92`, `run_vit.py:513-567`)
# ---------------------------------------------------------------------------


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """`jax.distributed.initialize()` — one call per host process.

    On TPU pod slices everything auto-detects from the metadata server; on
    other clusters pass coordinator/num/id explicitly or export
    JAX_COORDINATOR_ADDRESS / SLURM_NTASKS / SLURM_PROCID (the same env
    bootstrap the reference's DDP variants use). Returns True if a
    multi-process runtime was actually initialized."""
    kw = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("SLURM_NTASKS"):
        num_processes = int(os.environ["SLURM_NTASKS"])
    if process_id is None and os.environ.get("SLURM_PROCID"):
        process_id = int(os.environ["SLURM_PROCID"])
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    try:
        jax.distributed.initialize(**kw)
        return jax.process_count() > 1
    except Exception:
        # single-process (already-initialized, or no cluster env): fine
        return jax.process_count() > 1


def put_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host-local batch dict onto the mesh, data-sharded.

    Single-process: a plain device_put. Multi-process: each host contributes
    its local shard of the global batch via
    `jax.make_array_from_process_local_data` — the per-host data-loading
    pattern (each host reads only its slice of the dataset; SURVEY.md §2.8
    'per-host data loading')."""
    sharding = NamedSharding(mesh, batch_pspec())
    if jax.process_count() == 1:
        return {
            k: jax.device_put(jax.numpy.asarray(v), sharding) for k, v in batch.items()
        }
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def host_batch_slice(global_len: int) -> slice:
    """This host's contiguous slice of a globally-indexed dataset."""
    per = global_len // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
