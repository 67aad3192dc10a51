"""Static-shape, jit-compatible image augmentation: RandAugment + RandomErasing.

Reference capability: `run_vit.py` builds timm loaders with
`rand_augment_transform(auto_augment='rand-m9-mstd0.5-inc1', ...)` and
`RandomErasing(reprob, mode='pixel')` (`/root/reference/OutEffHop/run_vit.py:812-955`,
timm `data/auto_augment.py` / `data/random_erasing.py`). timm's versions are
PIL/CPU per-image Python; this module is the TPU-native redesign: every op is
pure jnp with STATIC shapes (traced magnitudes, masks instead of dynamic
crops), the per-image op choice is a `lax.switch`, and the batch dimension is
`vmap`ped — the whole augmentation pipeline runs inside the jitted train step
on device, not on the host input thread.

Conventions: images are (H, W, C) float in [0, 1] (timm applies augs before
dataset normalization; do the same). Geometric ops bilinear-resample via
`jax.scipy.ndimage.map_coordinates` with the gray fill 0.5.

Op set = timm's rand-augment default minus none: identity, auto_contrast,
equalize (sort-rank CDF instead of 256-bin histogram — identical on images
without ties up to interpolation), invert, rotate, posterize, solarize,
solarize_add, color, contrast, brightness, sharpness, shear_x, shear_y,
translate_x, translate_y. Magnitudes follow timm's 0-10 scale with the same
max ranges (rotate 30deg, shear 0.3, translate_rel 0.45, enhance 0.9).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_MAX_MAG = 10.0
_FILL = 0.5


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _affine(img: Array, mat: Array) -> Array:
    """Inverse-warp (H,W,C) by the 2x3 affine `mat` mapping output→input
    coords (centered), bilinear, constant gray fill."""
    h, w, c = img.shape
    yy = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xx = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    src_y = mat[0, 0] * gy + mat[0, 1] * gx + mat[0, 2] + (h - 1) / 2.0
    src_x = mat[1, 0] * gy + mat[1, 1] * gx + mat[1, 2] + (w - 1) / 2.0

    def chan(ic):
        return jax.scipy.ndimage.map_coordinates(
            ic, [src_y, src_x], order=1, mode="constant", cval=_FILL
        )

    return jnp.stack([chan(img[:, :, i]) for i in range(c)], axis=-1)


def _rotate(img, mag):
    theta = mag / _MAX_MAG * jnp.deg2rad(30.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) * 0.0
    mat = jnp.stack(
        [jnp.stack([cos, -sin, 0.0 * cos]), jnp.stack([sin, cos, 0.0 * cos])]
    )
    return _affine(img, mat)


def _shear_x(img, mag):
    s = mag / _MAX_MAG * 0.3
    mat = jnp.stack(
        [jnp.stack([jnp.float32(1.0), 0.0 * s, 0.0 * s]),
         jnp.stack([0.0 * s + 0.0, jnp.float32(1.0) + 0.0 * s, 0.0 * s])]
    )
    mat = mat.at[1, 0].set(0.0).at[0, 1].set(s)
    return _affine(img, mat)


def _shear_y(img, mag):
    s = mag / _MAX_MAG * 0.3
    mat = jnp.eye(2, 3, dtype=jnp.float32) + jnp.zeros((2, 3)) * s
    mat = mat.at[1, 0].set(s)
    return _affine(img, mat)


def _translate_x(img, mag):
    t = mag / _MAX_MAG * 0.45 * img.shape[1]
    mat = jnp.eye(2, 3, dtype=jnp.float32).at[1, 2].set(t)
    return _affine(img, mat)


def _translate_y(img, mag):
    t = mag / _MAX_MAG * 0.45 * img.shape[0]
    mat = jnp.eye(2, 3, dtype=jnp.float32).at[0, 2].set(t)
    return _affine(img, mat)


# ---------------------------------------------------------------------------
# color / intensity
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
    return jnp.clip(a + (b - a) * factor, 0.0, 1.0)


def _identity(img, mag):
    return img


def _auto_contrast(img, mag):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    return jnp.where(hi > lo, (img - lo) / jnp.maximum(hi - lo, 1e-6), img)


def _equalize(img, mag):
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    order = jnp.argsort(flat, axis=0)
    ranks = jnp.argsort(order, axis=0).astype(jnp.float32)
    return (ranks / (h * w - 1)).reshape(h, w, c)


def _invert(img, mag):
    return 1.0 - img


def _posterize(img, mag):
    # timm posterize 'inc1': bits 4 → 0 as magnitude grows
    bits = 4.0 - mag / _MAX_MAG * 4.0
    levels = jnp.maximum(2.0 ** (bits + 4.0 - 4.0 + 4.0 - 4.0 + 4.0), 2.0)
    # keep `4 + bits` integer bits of the 8-bit image
    keep = jnp.floor(4.0 + bits)
    scale = 2.0 ** (8.0 - keep)
    x255 = img * 255.0
    return jnp.clip(jnp.floor(x255 / scale) * scale / 255.0, 0.0, 1.0)


def _solarize(img, mag):
    thr = 1.0 - mag / _MAX_MAG
    return jnp.where(img >= thr, 1.0 - img, img)


def _solarize_add(img, mag):
    add = mag / _MAX_MAG * (110.0 / 255.0)
    return jnp.where(img < 0.5, jnp.clip(img + add, 0.0, 1.0), img)


def _color(img, mag):
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return _blend(gray, img, 1.0 + mag / _MAX_MAG * 0.9)


def _contrast(img, mag):
    mean = jnp.mean(img, keepdims=True)
    return _blend(mean, img, 1.0 + mag / _MAX_MAG * 0.9)


def _brightness(img, mag):
    return _blend(jnp.zeros_like(img), img, 1.0 + mag / _MAX_MAG * 0.9)


def _sharpness(img, mag):
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    img4 = img.transpose(2, 0, 1)[:, None]  # (C,1,H,W)
    blurred = jax.lax.conv_general_dilated(
        img4, k[None, None], (1, 1), "SAME"
    )[:, 0].transpose(1, 2, 0)
    return _blend(blurred, img, 1.0 + mag / _MAX_MAG * 0.9)


# signed ops get a random direction (timm flips sign with p=0.5)
_OPS = [
    (_identity, False),
    (_auto_contrast, False),
    (_equalize, False),
    (_invert, False),
    (_rotate, True),
    (_posterize, False),
    (_solarize, False),
    (_solarize_add, False),
    (_color, True),
    (_contrast, True),
    (_brightness, True),
    (_sharpness, True),
    (_shear_x, True),
    (_shear_y, True),
    (_translate_x, True),
    (_translate_y, True),
]
NUM_OPS = len(_OPS)


def _apply_one(img: Array, key: Array, magnitude: float, mstd: float) -> Array:
    k_op, k_mag, k_sign = jax.random.split(key, 3)
    op_idx = jax.random.randint(k_op, (), 0, NUM_OPS)
    mag = jnp.float32(magnitude)
    if mstd > 0:
        mag = jnp.clip(mag + mstd * jax.random.normal(k_mag), 0.0, _MAX_MAG)
    sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)

    branches = []
    for fn, signed in _OPS:
        m = mag * sign if signed else mag
        branches.append(functools.partial(lambda f, mm, im: f(im, mm), fn, m))
    return jax.lax.switch(op_idx, branches, img)


def rand_augment(
    images: Array,
    key: Array,
    num_layers: int = 2,
    magnitude: float = 9.0,
    mstd: float = 0.5,
) -> Array:
    """Batched RandAugment over (B, H, W, C) float images in [0, 1].

    Equivalent of timm's 'rand-m{magnitude}-n{num_layers}-mstd{mstd}' config
    string consumed by `run_vit.py --aa` (reference run_vit.py:883-895)."""
    orig_dtype = images.dtype
    imgs = images.astype(jnp.float32)

    def per_image(img, k):
        for i in range(num_layers):
            img = _apply_one(img, jax.random.fold_in(k, i), magnitude, mstd)
        return img

    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(per_image)(imgs, keys).astype(orig_dtype)


def random_erasing(
    images: Array,
    key: Array,
    prob: float = 0.25,
    area_range: Tuple[float, float] = (0.02, 1.0 / 3.0),
    aspect_range: Tuple[float, float] = (0.3, 10.0 / 3.0),
) -> Array:
    """Batched RandomErasing, 'pixel' mode (per-pixel normal noise fill) —
    timm `RandomErasing(probability=reprob, mode='pixel')`. Static shapes: the
    erase rectangle is an iota mask, never a dynamic slice."""
    b, h, w, c = images.shape
    orig_dtype = images.dtype
    imgs = images.astype(jnp.float32)

    def per_image(img, k):
        k_do, k_area, k_aspect, k_top, k_left, k_noise = jax.random.split(k, 6)
        do = jax.random.bernoulli(k_do, prob)
        area = h * w * jax.random.uniform(
            k_area, (), minval=area_range[0], maxval=area_range[1]
        )
        log_ar = jax.random.uniform(
            k_aspect, (),
            minval=jnp.log(aspect_range[0]), maxval=jnp.log(aspect_range[1]),
        )
        aspect = jnp.exp(log_ar)
        eh = jnp.clip(jnp.sqrt(area * aspect), 1.0, h).astype(jnp.int32)
        ew = jnp.clip(jnp.sqrt(area / aspect), 1.0, w).astype(jnp.int32)
        top = jax.random.randint(k_top, (), 0, jnp.maximum(h - eh, 1))
        left = jax.random.randint(k_left, (), 0, jnp.maximum(w - ew, 1))
        rows = jnp.arange(h)[:, None, None]
        cols = jnp.arange(w)[None, :, None]
        mask = (rows >= top) & (rows < top + eh) & (cols >= left) & (cols < left + ew)
        noise = jax.random.normal(k_noise, img.shape)
        return jnp.where(mask & do, noise, img)

    keys = jax.random.split(key, b)
    return jax.vmap(per_image)(imgs, keys).astype(orig_dtype)


def parse_rand_augment_config(aa: str):
    """Parse a timm-style 'rand-m9-n2-mstd0.5' config string
    (`timm/data/auto_augment.py` syntax; the 'inc1' suffix — increasing
    severity — is this module's fixed behavior)."""
    if not aa or not aa.startswith("rand"):
        raise ValueError(f"unsupported auto-augment config {aa!r}")
    cfg = dict(magnitude=9.0, num_layers=2, mstd=0.5)
    for tok in aa.split("-")[1:]:
        if tok.startswith("mstd"):
            cfg["mstd"] = float(tok[4:])
        elif tok.startswith("m"):
            cfg["magnitude"] = float(tok[1:])
        elif tok.startswith("n"):
            cfg["num_layers"] = int(tok[1:])
        elif tok.startswith("inc"):
            pass  # increasing-severity is the only mode implemented
        elif tok.startswith("w"):
            pass  # weighted choice not implemented (timm default is uniform)
        else:
            raise ValueError(f"unknown rand-augment token {tok!r} in {aa!r}")
    return cfg
