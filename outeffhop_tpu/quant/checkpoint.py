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

Format: a single pickle of numpy-ified pytrees (`QParams`/`Int8Dense` are
plain registered dataclasses, so they pickle structurally) + the config as a
dict, under a version key. Int8 weights are stored as int8 — a quantized
checkpoint is ~4x smaller than the fp32 params it replaces.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp

from outeffhop_tpu.quant.calibrate import QuantCtx, ScopedQuantCtx
from outeffhop_tpu.quant.config import QuantizedModelConfig

FILENAME = "quantized_ckpt.pkl"
_VERSION = 1


def _is_qleaf(x) -> bool:
    # QParams / Int8Dense are registered pytree dataclasses; stop tree
    # traversal at array leaves only (None bias fields are leaves too)
    return x is None


def save_quantized_ckpt(directory: str, qctx: ScopedQuantCtx) -> str:
    """Save a run-mode quantization context's full state to
    `directory/quantized_ckpt.pkl`. Returns the file path."""
    ctx = qctx._ctx
    if ctx is None:
        raise ValueError("cannot save a NULL quant ctx")
    if ctx.mode != "run":
        raise ValueError(f"expected a frozen run-mode ctx, got mode={ctx.mode!r}")
    os.makedirs(directory, exist_ok=True)
    payload = {
        "version": _VERSION,
        "config": dataclasses.asdict(ctx.config),
        "weight_qparams": jax.device_get(ctx.weight_qparams),
        "act_qparams": jax.device_get(ctx.act_qparams),
        "int8_dense": jax.device_get(ctx.int8_dense) if ctx.int8_dense else None,
    }
    path = os.path.join(directory, FILENAME)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_quantized_ckpt(directory_or_file: str):
    """Load (config, weight_qparams, act_qparams, int8_dense) with array
    leaves placed back on the default device."""
    path = directory_or_file
    if os.path.isdir(path):
        path = os.path.join(path, FILENAME)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != _VERSION:
        raise ValueError(f"unknown quantized-checkpoint version {payload.get('version')!r}")
    cfg_dict = dict(payload["config"])
    # asdict turns the fp32_acts_patterns tuple into a list
    if "fp32_acts_patterns" in cfg_dict:
        cfg_dict["fp32_acts_patterns"] = tuple(cfg_dict["fp32_acts_patterns"])
    config = QuantizedModelConfig(**cfg_dict)

    def to_device(t):
        return jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None,
            t,
            is_leaf=_is_qleaf,
        )

    wq = to_device(payload["weight_qparams"])
    aq = to_device(payload["act_qparams"])
    int8 = to_device(payload["int8_dense"]) if payload.get("int8_dense") else None
    return config, wq, aq, int8


def quant_ctx_from_ckpt(directory_or_file: str) -> ScopedQuantCtx:
    """Rebuild the frozen run-mode quantization context from a saved
    checkpoint — the recalibration-free eval path (`--load_quantized_dir`)."""
    config, wq, aq, int8 = load_quantized_ckpt(directory_or_file)
    return ScopedQuantCtx(QuantCtx.run(config, wq, aq, int8_dense=int8), "")
