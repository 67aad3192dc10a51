"""tiny-imagenet loader (theory/data.py) against a fabricated on-disk layout
(`theory_verification/data.py:101-147` directory structure)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from outeffhop_tpu.theory.data import load_tiny_imagenet, load_torchvision


@pytest.fixture
def tiny_root(tmp_path):
    root = tmp_path
    base = root / "tiny-imagenet-200"
    wnids = ["n001", "n002"]
    (base / "val" / "images").mkdir(parents=True)
    with open(base / "wnids.txt", "w") as f:
        f.write("\n".join(wnids) + "\n")
    rng = np.random.default_rng(0)
    for w in wnids:
        d = base / "train" / w / "images"
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{w}_{i}.JPEG")
        # one grayscale image that must be skipped
        gray = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        Image.fromarray(gray, mode="L").save(d / f"{w}_gray.JPEG")
    with open(base / "val" / "val_annotations.txt", "w") as f:
        for i, w in enumerate(wnids):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(base / "val" / "images" / f"val_{i}.JPEG")
            f.write(f"val_{i}.JPEG\t{w}\t0\t0\t0\t0\n")
    return str(root)


def test_train_split(tiny_root):
    x, y = load_tiny_imagenet(tiny_root, train=True)
    assert x.shape == (6, 3, 64, 64)  # grayscale images skipped
    assert sorted(set(y.tolist())) == [0, 1]
    assert x.dtype == np.float32
    # normalized: roughly zero-mean-ish, definitely not raw [0,255]
    assert abs(float(x.mean())) < 3.0 and float(np.abs(x).max()) < 5.0


def test_val_split_and_dispatch(tiny_root):
    x, y = load_torchvision("tiny_imagenet", tiny_root, train=False)
    assert x.shape == (2, 3, 64, 64)
    np.testing.assert_array_equal(np.sort(y), [0, 1])
