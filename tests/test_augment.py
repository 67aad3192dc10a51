"""Static-shape RandAugment / RandomErasing (timm-parity augmentation for
run_vit — reference `/root/reference/OutEffHop/run_vit.py:812-955`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.data import augment as aug


def imgs(b=2, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (b, h, w, c)).astype(np.float32))


def test_rand_augment_shapes_dtype_finite():
    x = imgs()
    y = aug.rand_augment(x, jax.random.PRNGKey(0))
    assert y.shape == x.shape and y.dtype == x.dtype
    assert np.isfinite(np.asarray(y)).all()
    # bf16 in → bf16 out
    yb = aug.rand_augment(x.astype(jnp.bfloat16), jax.random.PRNGKey(1))
    assert yb.dtype == jnp.bfloat16


def test_rand_augment_jits_and_changes_images():
    x = imgs(b=4)
    f = jax.jit(lambda im, k: aug.rand_augment(im, k, magnitude=9.0))
    y = f(x, jax.random.PRNGKey(2))
    assert float(jnp.max(jnp.abs(y - x))) > 1e-3


def test_invert_solarize_posterize_semantics():
    x = imgs(b=1)[0]
    assert np.allclose(np.asarray(aug._invert(x, 5.0)), 1.0 - np.asarray(x))
    sol = np.asarray(aug._solarize(x, 10.0))  # threshold 0 → everything inverts
    assert np.allclose(sol, 1.0 - np.asarray(x), atol=1e-6)
    post = np.asarray(aug._posterize(x, 10.0))  # 4 bits kept
    assert len(np.unique(np.round(post * 255))) <= 16 * 3 + 1


def test_equalize_is_rank_cdf():
    x = imgs(b=1, h=8, w=8, c=1)[0]
    y = np.asarray(aug._equalize(x, 0.0)).ravel()
    assert y.min() == 0.0 and y.max() == pytest.approx(1.0)
    # rank transform preserves ordering
    xr = np.asarray(x).ravel()
    assert (np.argsort(xr) == np.argsort(y)).all()


def test_translate_moves_content():
    x = jnp.zeros((8, 8, 1)).at[0, 0, 0].set(1.0)
    # negative magnitude → src_y = y - 3.6: content moves DOWN ~3.6 rows
    y = np.asarray(aug._translate_y(x, -10.0))
    assert y[0, 0, 0] < 0.6  # original corner now mostly fill
    assert y[3:5, 0, 0].max() > 0.35  # mass lands at rows 3/4
    # magnitude sign flips the direction (the random sign in _apply_one)
    y2 = np.asarray(aug._translate_y(x, 10.0))
    assert y2[3:5, 0, 0].max() < 0.35


def test_random_erasing_prob_bounds():
    x = imgs(b=8)
    y0 = aug.random_erasing(x, jax.random.PRNGKey(3), prob=0.0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))
    y1 = aug.random_erasing(x, jax.random.PRNGKey(4), prob=1.0)
    diff = np.asarray(jnp.any(jnp.abs(y1 - x) > 1e-6, axis=(1, 2, 3)))
    assert diff.all()  # every image has an erased rectangle
    # erased values are noise, not clipped to [0,1]
    assert float(jnp.min(y1)) < -0.5 or float(jnp.max(y1)) > 1.5


def test_parse_rand_augment_config():
    cfg = aug.parse_rand_augment_config("rand-m7-n3-mstd0.4-inc1")
    assert cfg == dict(magnitude=7.0, num_layers=3, mstd=0.4)
    assert aug.parse_rand_augment_config("rand-m9-mstd0.5")["num_layers"] == 2
    with pytest.raises(ValueError):
        aug.parse_rand_augment_config("original-mstd0.5")
    with pytest.raises(ValueError):
        aug.parse_rand_augment_config("rand-q5")


def test_run_vit_with_augmentation(tmp_path):
    from outeffhop_tpu.drivers.run_vit import main

    res = main([
        "--num_hidden_layers", "1", "--img_size", "16", "--patch_size", "8",
        "--train_samples", "32", "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8", "--max_train_steps", "2",
        "--aa", "rand-m9-mstd0.5", "--reprob", "0.25", "--mixup", "0.2",
    ])
    assert np.isfinite(res["train_loss"])
