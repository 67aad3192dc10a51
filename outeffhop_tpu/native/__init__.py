"""Native (C++) host data-pipeline layer with transparent NumPy fallback.

Builds `dataio.cpp` with g++ on first import (cached by source hash under
`_build/`), binds via ctypes, and exposes:

    mlm_mask(tokens, mlm_prob, seed, mask_id, vocab_size, special_ids)
    csv_parse(path) -> (T, D) float32
    gather_windows(data, idx, in_len, out_len) -> (x, y)
    HAS_NATIVE: bool — which implementation is active

The C++ and NumPy implementations are bit-identical (counter-based
splitmix64 RNG for masking; same parse rules), so the choice is purely a
throughput matter — correctness tests assert equality of both.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Dict, Optional, Tuple

import numpy as np

from outeffhop_tpu.native import fallback

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataio.cpp")

_lib = None
HAS_NATIVE = False


def _build_lib() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        build_dir = os.path.join(_HERE, "_build")
        so_path = os.path.join(build_dir, f"dataio-{digest}.so")
        if not os.path.exists(so_path):
            os.makedirs(build_dir, exist_ok=True)
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)  # atomic vs concurrent builders
        lib = ctypes.CDLL(so_path)
        lib.mlm_mask.restype = ctypes.c_int
        lib.csv_shape.restype = ctypes.c_int
        lib.csv_parse.restype = ctypes.c_int
        lib.gather_windows.restype = ctypes.c_int
        return lib
    except Exception as e:  # no toolchain / sandboxed build: fall back
        if os.environ.get("OUTEFFHOP_NATIVE_REQUIRED"):
            raise
        print(f"[outeffhop_tpu.native] falling back to NumPy dataio ({e})",
              file=sys.stderr)
        return None


if os.environ.get("OUTEFFHOP_NO_NATIVE") != "1":
    _lib = _build_lib()
    HAS_NATIVE = _lib is not None


def mlm_mask(
    tokens: np.ndarray,
    mlm_prob: float,
    seed: int,
    mask_id: int,
    vocab_size: int,
    special_ids: Tuple[int, ...] = (),
) -> Dict[str, np.ndarray]:
    """Counter-based dynamic MLM masking (80/10/10). Deterministic in
    (tokens, seed) and identical across the C++/NumPy implementations."""
    if _lib is None:
        return fallback.mlm_mask(tokens, mlm_prob, seed, mask_id, vocab_size, special_ids)
    flat = np.ascontiguousarray(tokens, np.int32).reshape(-1)
    out_ids = np.empty_like(flat)
    out_labels = np.empty_like(flat)
    spec = np.asarray(special_ids, np.int32)
    rc = _lib.mlm_mask(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(flat.size),
        ctypes.c_double(mlm_prob),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        ctypes.c_int32(mask_id),
        ctypes.c_int32(vocab_size),
        spec.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(len(spec)),
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"native mlm_mask failed rc={rc}")
    return {
        "input_ids": out_ids.reshape(tokens.shape),
        "labels": out_labels.reshape(tokens.shape),
    }


def csv_parse(path: str) -> np.ndarray:
    """CSV → (T, D) float32 (header + date column dropped); native parser
    when available (`data_loader.py:36-50` equivalent)."""
    if _lib is None:
        return fallback.csv_parse(path)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = _lib.csv_shape(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise FileNotFoundError(path)
    out = np.empty((rows.value, cols.value), np.float32)
    rc = _lib.csv_parse(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(rows.value),
        ctypes.c_int64(cols.value),
    )
    if rc != 0:
        raise RuntimeError(f"native csv_parse failed rc={rc}")
    return out


def gather_windows(
    data: np.ndarray, idx: np.ndarray, in_len: int, out_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch sliding-window gather: (T, D) + starts (B,) → (B, in_len, D),
    (B, out_len, D)."""
    if _lib is None:
        return fallback.gather_windows(data, idx, in_len, out_len)
    data = np.ascontiguousarray(data, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    T, D = data.shape
    B = idx.size
    x = np.empty((B, in_len, D), np.float32)
    y = np.empty((B, out_len, D), np.float32)
    rc = _lib.gather_windows(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(T),
        ctypes.c_int64(D),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(B),
        ctypes.c_int64(in_len),
        ctypes.c_int64(out_len),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"native gather_windows failed rc={rc}")
    return x, y
