"""Pure-NumPy fallbacks for the native dataio kernels.

Bit-identical to dataio.cpp: the MLM masking uses the same splitmix64
counter-based RNG evaluated vectorized (uint64 arithmetic wraps mod 2^64 in
NumPy exactly as in C), so tests can assert array equality between the two
implementations, and a host without a C++ toolchain produces the same
batches as one with it.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_STREAM = np.uint64(0xD1B54A32D192ED03)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _sm64_mix(z: np.ndarray) -> np.ndarray:
    z = z ^ (z >> np.uint64(30))
    z = z * _M1
    z = z ^ (z >> np.uint64(27))
    z = z * _M2
    z = z ^ (z >> np.uint64(31))
    return z


def _sm64_at(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (
            np.uint64(seed)
            + (idx.astype(np.uint64) + np.uint64(1)) * _GOLDEN
            + np.uint64(stream) * _STREAM
        )
        return _sm64_mix(z)


def _u64_to_unit(r: np.ndarray) -> np.ndarray:
    return (r >> np.uint64(11)).astype(np.float64) * (1.0 / 9007199254740992.0)


def mlm_mask(
    tokens: np.ndarray,
    mlm_prob: float,
    seed: int,
    mask_id: int,
    vocab_size: int,
    special_ids: Tuple[int, ...] = (),
) -> Dict[str, np.ndarray]:
    """Counter-based MLM masking (HF collator semantics); flat or batched."""
    flat = np.ascontiguousarray(tokens, np.int32).reshape(-1)
    idx = np.arange(flat.size)
    special = (
        np.isin(flat, np.asarray(special_ids, np.int32))
        if special_ids
        else np.zeros(flat.size, bool)
    )
    p = _u64_to_unit(_sm64_at(seed, idx, 0))
    masked = (~special) & (p < mlm_prob)
    labels = np.where(masked, flat, -100).astype(np.int32)
    a = _u64_to_unit(_sm64_at(seed, idx, 1))
    rand_tok = (_sm64_at(seed, idx, 2) % np.uint64(vocab_size)).astype(np.int32)
    ids = flat.copy()
    ids[masked & (a < 0.8)] = mask_id
    sel = masked & (a >= 0.8) & (a < 0.9)
    ids[sel] = rand_tok[sel]
    return {
        "input_ids": ids.reshape(tokens.shape),
        "labels": labels.reshape(tokens.shape),
    }


def csv_parse(path: str) -> np.ndarray:
    """CSV → (T, D) float32, header row + first (date) column dropped."""
    import csv

    with open(path) as f:
        rows = list(csv.reader(f))
    return np.asarray([[float(v) for v in r[1:]] for r in rows[1:]], np.float32)


def gather_windows(
    data: np.ndarray, idx: np.ndarray, in_len: int, out_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    x = np.stack([data[s : s + in_len] for s in idx])
    y = np.stack([data[s + in_len : s + in_len + out_len] for s in idx])
    return x.astype(np.float32), y.astype(np.float32)
