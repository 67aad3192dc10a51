"""Data sources for the theory-verification experiments.

Re-designs `theory_verification/data.py`. The reference pulls
MNIST/CIFAR10/CIFAR100/tiny-imagenet via torchvision (data.py:17-148) and
generates synthetic Gaussian patterns (data.py:150-164). This environment
has no network egress, so:

  * `load_synthetic` / `synthetic_patterns` — always available, NumPy-seeded;
  * `synthetic_image_classification` — a labeled Gaussian-blob image set that
    exercises the full ViH train/eval loop (class-conditional means, so a
    working retrieval layer separates classes);
  * `load_torchvision` — real datasets when the files are already on disk
    (download=False), raising a clear error otherwise.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

Batch = Tuple[np.ndarray, np.ndarray]

# Per-dataset normalization constants (data.py:37-41, plotting.py:55-90).
NORMALIZE = {
    "cifar10": ([0.4914, 0.4822, 0.4465], [0.2470, 0.2435, 0.2616]),
    "cifar100": ([0.4914, 0.4822, 0.4465], [0.2470, 0.2435, 0.2616]),
    "mnist": ([0.1307], [0.3081]),
    "tiny_imagenet": ([0.4802, 0.4481, 0.3975], [0.2302, 0.2265, 0.2262]),
}


def load_synthetic(n_imgs: int, dim: int = 100, seed: int = 0) -> np.ndarray:
    """(n_imgs, dim) standard-normal patterns (data.py:150-164)."""
    return np.random.RandomState(seed).normal(size=(n_imgs, dim)).astype(np.float32)


def synthetic_patterns(
    n_patterns: int, dim: int, seed: int = 0, scale: float = 1.0
) -> np.ndarray:
    """(dim, n_patterns) memory matrix Ξ for retrieval experiments."""
    return (
        np.random.RandomState(seed).normal(size=(dim, n_patterns)).astype(np.float32) * scale
    )


def synthetic_image_classification(
    n_train: int = 512,
    n_test: int = 128,
    n_class: int = 10,
    img_size: int = 32,
    channels: int = 3,
    seed: int = 0,
):
    """Class-conditional Gaussian images: each class has a fixed random mean
    image; samples are mean + noise. Learnable by ViH, cheap to generate."""
    rs = np.random.RandomState(seed)
    means = rs.normal(0, 1.0, size=(n_class, channels, img_size, img_size)).astype(np.float32)

    def make(n, s):
        r = np.random.RandomState(s)
        y = r.randint(0, n_class, size=n)
        x = means[y] + r.normal(0, 0.5, size=(n, channels, img_size, img_size)).astype(
            np.float32
        )
        return x.astype(np.float32), y.astype(np.int32)

    return make(n_train, seed + 1), make(n_test, seed + 2)


def iterate_batches(
    x: np.ndarray, y: np.ndarray, batch_size: int, seed: int = 0, shuffle: bool = True
) -> Iterator[Batch]:
    idx = np.arange(len(x))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        sel = idx[i : i + batch_size]
        yield x[sel], y[sel]


def load_torchvision(name: str, root: str, train: bool = True):
    """Load a real dataset already present on disk (no download). Returns
    (images NCHW float32 normalized, labels int32)."""
    if name == "tiny_imagenet":
        return load_tiny_imagenet(root, train=train)
    import torch  # noqa: F401  (torchvision pulls torch)
    from torchvision import datasets, transforms  # type: ignore

    mean, std = NORMALIZE[name]
    tf = transforms.Compose([transforms.ToTensor(), transforms.Normalize(mean=mean, std=std)])
    cls = {
        "cifar10": datasets.CIFAR10,
        "cifar100": datasets.CIFAR100,
        "mnist": datasets.MNIST,
    }[name]
    ds = cls(root=root, train=train, download=False, transform=tf)
    xs, ys = [], []
    for img, label in ds:
        xs.append(np.asarray(img))
        ys.append(label)
    return np.stack(xs).astype(np.float32), np.asarray(ys, np.int32)


def load_tiny_imagenet(root: str, train: bool = True):
    """tiny-imagenet-200 from the standard on-disk layout
    (`theory_verification/data.py:101-147`: wnids.txt id table, train/<wnid>/
    *.JPEG, val/val_annotations.txt mapping). Grayscale JPEGs are skipped as
    upstream does (`data.py:112-114,119-121`). Returns (NCHW float32
    normalized, int32 labels)."""
    import os

    from PIL import Image  # bundled with torchvision

    mean = np.asarray(NORMALIZE["tiny_imagenet"][0], np.float32).reshape(3, 1, 1)
    std = np.asarray(NORMALIZE["tiny_imagenet"][1], np.float32).reshape(3, 1, 1)
    path = os.path.join(root, "tiny-imagenet-200")
    with open(os.path.join(path, "wnids.txt")) as f:
        id_dict = {line.strip(): i for i, line in enumerate(f) if line.strip()}

    xs, ys = [], []
    if train:
        for wnid, label in id_dict.items():
            img_dir = os.path.join(path, "train", wnid, "images")
            if not os.path.isdir(img_dir):
                img_dir = os.path.join(path, "train", wnid)
            for fname in sorted(os.listdir(img_dir)):
                if not fname.endswith(".JPEG"):
                    continue
                arr = np.asarray(Image.open(os.path.join(img_dir, fname)))
                if arr.ndim != 3:  # skip grayscale, as upstream does
                    continue
                xs.append(arr)
                ys.append(label)
    else:
        val_dir = os.path.join(path, "val")
        img_dir = os.path.join(val_dir, "images")
        if not os.path.isdir(img_dir):
            img_dir = val_dir
        with open(os.path.join(val_dir, "val_annotations.txt")) as f:
            for line in f:
                img_name, class_id = line.split("\t")[:2]
                arr = np.asarray(Image.open(os.path.join(img_dir, img_name)))
                if arr.ndim != 3:
                    continue
                xs.append(arr)
                ys.append(id_dict[class_id])
    x = np.stack(xs).astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    x = (x - mean) / std
    return x, np.asarray(ys, np.int32)
