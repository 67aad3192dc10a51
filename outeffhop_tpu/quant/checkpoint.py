"""Quantized-checkpoint round trip: persist a calibrated run-mode quant state
and re-materialize it WITHOUT recalibration.

The reference can save a calibrated INT8 model (`validate_clm.py:501-512`) and
re-serve it: its `QuantizedModel.load_state_dict` override re-materializes
every quantizer buffer by running a dummy forward before loading the saved
`_delta`/`x_min` tensors (`quantization/base_quantized_model.py:34-82`). In
the functional design nothing needs a dummy forward — the entire quantization
state is three explicit pytrees (weight QParams, act QParams, optional
Int8Dense integer weights) plus the static `QuantizedModelConfig`. This module
serializes exactly those and rebuilds a run-mode `QuantCtx` from disk.

Format: NON-EXECUTABLE on purpose — `quantized_ckpt.npz` (raw arrays) +
`quantized_ckpt.json` (config, per-site statics, and the name→array-key map).
Unlike pickle (or torch.load), loading a checkpoint from an untrusted source
cannot run arbitrary code. Int8 weights are stored as int8 — a quantized
checkpoint is ~4x smaller than the fp32 params it replaces. Legacy v1 pickle
checkpoints are still readable when a `.pkl` path is passed EXPLICITLY (with
the usual pickle trust caveat); directories are searched for the npz format
first.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.quant.calibrate import QuantCtx, ScopedQuantCtx
from outeffhop_tpu.quant.config import QuantizedModelConfig
from outeffhop_tpu.quant.fake_quant import QParams
from outeffhop_tpu.quant.int8_exec import Int8Dense

FILENAME_NPZ = "quantized_ckpt.npz"
FILENAME_META = "quantized_ckpt.json"
LEGACY_PICKLE = "quantized_ckpt.pkl"
_VERSION = 2

_QP_STATICS = ("n_bits", "symmetric", "signed", "eps", "scale_domain")


class _ArrayStore:
    """Accumulates arrays under opaque sequential keys (site names can
    contain any character, so they live in the JSON meta, not in npz keys)."""

    def __init__(self):
        self.arrays = {}

    def put(self, arr) -> str:
        key = f"arr_{len(self.arrays)}"
        self.arrays[key] = np.asarray(jax.device_get(arr))
        return key


def _qparams_meta(qp: Optional[QParams], store: _ArrayStore):
    if qp is None:
        return None
    return {
        "delta": store.put(qp.delta),
        "zero_float": store.put(qp.zero_float),
        "statics": {k: getattr(qp, k) for k in _QP_STATICS},
    }


def _qparams_from_meta(meta, arrays) -> Optional[QParams]:
    if meta is None:
        return None
    return QParams(
        delta=jnp.asarray(arrays[meta["delta"]]),
        zero_float=jnp.asarray(arrays[meta["zero_float"]]),
        **meta["statics"],
    )


def save_quantized_ckpt(directory: str, qctx: ScopedQuantCtx) -> str:
    """Save a run-mode quantization context's full state to
    `directory/quantized_ckpt.{npz,json}`. Returns the npz path."""
    ctx = qctx._ctx
    if ctx is None:
        raise ValueError("cannot save a NULL quant ctx")
    if ctx.mode != "run":
        raise ValueError(f"expected a frozen run-mode ctx, got mode={ctx.mode!r}")
    os.makedirs(directory, exist_ok=True)
    store = _ArrayStore()
    meta = {
        "version": _VERSION,
        "config": dataclasses.asdict(ctx.config),
        "weight_qparams": {
            name: _qparams_meta(qp, store)
            for name, qp in ctx.weight_qparams.items()
        },
        "act_qparams": {
            name: _qparams_meta(qp, store)
            for name, qp in ctx.act_qparams.items()
        },
        "int8_dense": None,
    }
    if ctx.int8_dense:
        meta["int8_dense"] = {
            name: {
                "w_int": store.put(d.w_int),
                "w_scale": store.put(d.w_scale),
                "w_colsum": store.put(d.w_colsum),
                "bias": store.put(d.bias) if d.bias is not None else None,
            }
            for name, d in ctx.int8_dense.items()
        }
    npz_path = os.path.join(directory, FILENAME_NPZ)
    np.savez(npz_path, **store.arrays)
    with open(os.path.join(directory, FILENAME_META), "w") as f:
        json.dump(meta, f, indent=1)
    return npz_path


def _load_legacy_pickle(path: str):
    """v1 format: one pickle. Only reachable by passing a .pkl path
    explicitly — pickle executes code on load; trust the file's origin."""
    warnings.warn(
        "loading a legacy v1 pickle quantized checkpoint; pickle can execute "
        "arbitrary code — only load files you produced yourself. Re-save to "
        "get the non-executable npz+json format.",
        stacklevel=3,
    )
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != 1:
        raise ValueError(
            f"unknown quantized-checkpoint version {payload.get('version')!r}"
        )

    def to_device(t):
        return jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None,
            t,
            is_leaf=lambda x: x is None,
        )

    cfg_dict = dict(payload["config"])
    if "fp32_acts_patterns" in cfg_dict:
        cfg_dict["fp32_acts_patterns"] = tuple(cfg_dict["fp32_acts_patterns"])
    config = QuantizedModelConfig(**cfg_dict)
    wq = to_device(payload["weight_qparams"])
    aq = to_device(payload["act_qparams"])
    int8 = to_device(payload["int8_dense"]) if payload.get("int8_dense") else None
    return config, wq, aq, int8


def load_quantized_ckpt(directory_or_file: str):
    """Load (config, weight_qparams, act_qparams, int8_dense) with array
    leaves placed back on the default device."""
    path = directory_or_file
    if os.path.isdir(path):
        npz = os.path.join(path, FILENAME_NPZ)
        if not os.path.exists(npz) and os.path.exists(
            os.path.join(path, LEGACY_PICKLE)
        ):
            raise ValueError(
                f"{path} holds only a legacy v1 pickle checkpoint; pass the "
                f".pkl file path explicitly to acknowledge the pickle trust "
                f"assumption (it executes code on load)"
            )
        path = npz
    if path.endswith(".pkl"):
        return _load_legacy_pickle(path)
    meta_path = os.path.join(os.path.dirname(path), FILENAME_META)
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"unknown quantized-checkpoint version {meta.get('version')!r}"
        )
    arrays = dict(np.load(path))
    cfg_dict = dict(meta["config"])
    if "fp32_acts_patterns" in cfg_dict:
        cfg_dict["fp32_acts_patterns"] = tuple(cfg_dict["fp32_acts_patterns"])
    config = QuantizedModelConfig(**cfg_dict)
    wq = {
        name: _qparams_from_meta(m, arrays)
        for name, m in meta["weight_qparams"].items()
    }
    aq = {
        name: _qparams_from_meta(m, arrays)
        for name, m in meta["act_qparams"].items()
    }
    int8 = None
    if meta.get("int8_dense"):
        int8 = {
            name: Int8Dense(
                w_int=jnp.asarray(arrays[d["w_int"]]),
                w_scale=jnp.asarray(arrays[d["w_scale"]]),
                w_colsum=jnp.asarray(arrays[d["w_colsum"]]),
                bias=jnp.asarray(arrays[d["bias"]]) if d["bias"] else None,
            )
            for name, d in meta["int8_dense"].items()
        }
    return config, wq, aq, int8


def quant_ctx_from_ckpt(directory_or_file: str) -> ScopedQuantCtx:
    """Rebuild the frozen run-mode quantization context from a saved
    checkpoint — the recalibration-free eval path (`--load_quantized_dir`)."""
    config, wq, aq, int8 = load_quantized_ckpt(directory_or_file)
    return ScopedQuantCtx(QuantCtx.run(config, wq, aq, int8_dense=int8), "")
