"""Multivariate time-series windowing — `Dataset_MTS` equivalent
(`STanHop_time_seeries/data/data_loader.py:13-81`).

TPU-native shape: instead of a torch Dataset yielding one window per
__getitem__, windows are materialized as dense arrays (the datasets are tiny —
ETT is ~17k rows) and batched with static shapes, so the whole eval set can be
fed to a jitted step without host-side per-item indexing.

Split/border arithmetic replicated exactly (`data_loader.py:37-47`):
  ratio splits: train = int(n·r_train), test = int(n·r_test),
                val = n − train − test
  absolute splits when data_split[0] > 1
  border1s = [0, train − in_len, train + val − in_len]
  border2s = [train, train + val, train + val + test]
Scaler: StandardScaler fit on the TRAIN slice only (`:52-58`), persisted as
`scale_statistic` for eval reproducibility (`exp_stanhop.py:203-207`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class StandardScaler:
    """utils/tools.py:53-70 (per-feature mean/std over axis 0)."""

    mean: np.ndarray | float = 0.0
    std: np.ndarray | float = 1.0

    def fit(self, data: np.ndarray) -> "StandardScaler":
        self.mean = data.mean(0)
        self.std = data.std(0)
        return self

    def transform(self, data: np.ndarray) -> np.ndarray:
        return (data - self.mean) / self.std

    def inverse_transform(self, data: np.ndarray) -> np.ndarray:
        return data * self.std + self.mean

    def statistic(self) -> Dict[str, np.ndarray]:
        return {"mean": np.asarray(self.mean), "std": np.asarray(self.std)}


def load_mts_csv(path: str) -> np.ndarray:
    """CSV → (T, D) float array, dropping the first (date) column
    (`data_loader.py:36-50`); native C++ parser when available."""
    from outeffhop_tpu import native

    return native.csv_parse(path)


class MTSWindows:
    """Sliding in_len→out_len windows over one split of a multivariate series."""

    def __init__(
        self,
        data: np.ndarray,
        flag: str,
        in_len: int,
        out_len: int,
        data_split: Sequence[float] = (0.7, 0.1, 0.2),
        scale: bool = True,
        scale_statistic: Optional[Dict[str, np.ndarray]] = None,
    ):
        assert flag in ("train", "val", "test")
        set_type = {"train": 0, "val": 1, "test": 2}[flag]
        n = len(data)
        if data_split[0] > 1:
            train_num, val_num, test_num = (int(x) for x in data_split)
        else:
            train_num = int(n * data_split[0])
            test_num = int(n * data_split[2])
            val_num = n - train_num - test_num
        border1s = [0, train_num - in_len, train_num + val_num - in_len]
        border2s = [train_num, train_num + val_num, train_num + val_num + test_num]
        b1, b2 = border1s[set_type], border2s[set_type]

        if scale:
            if scale_statistic is None:
                self.scaler = StandardScaler().fit(data[border1s[0] : border2s[0]])
            else:
                self.scaler = StandardScaler(
                    mean=scale_statistic["mean"], std=scale_statistic["std"]
                )
            data = self.scaler.transform(data)
        else:
            self.scaler = StandardScaler()
        self.data = np.asarray(data[b1:b2], np.float32)
        self.in_len = in_len
        self.out_len = out_len

    def __len__(self) -> int:
        return len(self.data) - self.in_len - self.out_len + 1

    def window(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        x = self.data[i : i + self.in_len]
        y = self.data[i + self.in_len : i + self.in_len + self.out_len]
        return x, y

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = False):
        """Yield (x, y) arrays of shape (B, in_len, D) / (B, out_len, D)."""
        idx = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        from outeffhop_tpu import native

        for s in range(0, len(idx), batch_size):
            chunk = idx[s : s + batch_size]
            if drop_last and len(chunk) < batch_size:
                return
            yield native.gather_windows(
                self.data, chunk.astype(np.int64), self.in_len, self.out_len
            )


def synthetic_mts(n: int = 2000, dim: int = 7, seed: int = 0) -> np.ndarray:
    """Deterministic multi-sine series for tests/smoke runs (no CSV needed)."""
    rs = np.random.RandomState(seed)
    t = np.arange(n)[:, None]
    freqs = rs.uniform(0.01, 0.1, (1, dim))
    phase = rs.uniform(0, 2 * np.pi, (1, dim))
    return (
        np.sin(2 * np.pi * freqs * t + phase) + 0.05 * rs.randn(n, dim)
    ).astype(np.float32)
