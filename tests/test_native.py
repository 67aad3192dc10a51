"""Native C++ dataio layer: bit-equality with the NumPy fallback, pipeline
integration (text/timeseries loaders route through it)."""

import os
import tempfile

import numpy as np
import pytest

from outeffhop_tpu import native
from outeffhop_tpu.native import fallback


def test_native_library_built():
    """The toolchain is present in this image; the C++ path must be active
    (set OUTEFFHOP_NO_NATIVE=1 to test the fallback deliberately)."""
    if os.environ.get("OUTEFFHOP_NO_NATIVE") == "1":
        pytest.skip("native disabled by env")
    assert native.HAS_NATIVE


def test_mlm_mask_native_equals_fallback():
    tok = np.random.RandomState(0).randint(0, 30522, (8, 128)).astype(np.int32)
    for seed in (0, 1, 123456789):
        a = native.mlm_mask(tok, 0.15, seed, 103, 30522, special_ids=(0, 101, 102))
        b = fallback.mlm_mask(tok, 0.15, seed, 103, 30522, special_ids=(0, 101, 102))
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_mlm_mask_semantics():
    tok = np.random.RandomState(1).randint(5, 1000, 200_000).astype(np.int32)
    out = native.mlm_mask(tok, 0.15, 7, 4, 1000)
    masked = out["labels"] != -100
    frac = masked.mean()
    assert 0.13 < frac < 0.17  # ≈ mlm_probability
    # labels hold the original token at masked positions
    np.testing.assert_array_equal(out["labels"][masked], tok[masked])
    # unmasked positions pass through unchanged
    np.testing.assert_array_equal(out["input_ids"][~masked], tok[~masked])
    # of masked: ~80% [MASK], ~10% random, ~10% unchanged
    mask_frac = (out["input_ids"][masked] == 4).mean()
    keep_frac = (out["input_ids"][masked] == tok[masked]).mean()
    assert 0.77 < mask_frac < 0.83
    assert 0.07 < keep_frac < 0.13


def test_mlm_mask_respects_special_ids():
    tok = np.zeros(10_000, np.int32)  # all special
    out = native.mlm_mask(tok, 0.99, 3, 4, 10, special_ids=(0,))
    assert (out["labels"] == -100).all()
    assert (out["input_ids"] == 0).all()


def test_mlm_mask_deterministic_in_seed():
    tok = np.random.RandomState(2).randint(0, 100, 1000).astype(np.int32)
    a = native.mlm_mask(tok, 0.15, 42, 1, 100)
    b = native.mlm_mask(tok, 0.15, 42, 1, 100)
    c = native.mlm_mask(tok, 0.15, 43, 1, 100)
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    assert not np.array_equal(a["input_ids"], c["input_ids"])


def test_csv_parse_matches_fallback():
    content = "date,HUFL,HULL,MUFL\n"
    rs = np.random.RandomState(3)
    vals = rs.normal(size=(50, 3))
    for i in range(50):
        content += f"2020-01-{i+1:02d}," + ",".join(f"{v:.6f}" for v in vals[i]) + "\n"
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write(content)
        path = f.name
    try:
        a = native.csv_parse(path)
        b = fallback.csv_parse(path)
        assert a.shape == (50, 3)
        np.testing.assert_allclose(a, b, rtol=1e-6)
        np.testing.assert_allclose(a, vals.astype(np.float32), atol=1e-6)
    finally:
        os.unlink(path)


def test_csv_parse_no_trailing_newline():
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write("date,a\nx,1.0\ny,2.0")  # no trailing \n
        path = f.name
    try:
        a = native.csv_parse(path)
        np.testing.assert_allclose(a, [[1.0], [2.0]])
    finally:
        os.unlink(path)


def test_gather_windows_matches_fallback():
    data = np.random.RandomState(4).rand(200, 7).astype(np.float32)
    idx = np.asarray([0, 3, 99, 164], np.int64)
    xa, ya = native.gather_windows(data, idx, 24, 12)
    xb, yb = fallback.gather_windows(data, idx, 24, 12)
    np.testing.assert_array_equal(xa, xb)
    np.testing.assert_array_equal(ya, yb)
    assert xa.shape == (4, 24, 7) and ya.shape == (4, 12, 7)


def test_gather_windows_bounds_check():
    if not native.HAS_NATIVE:
        pytest.skip("bounds check is the native path's")
    data = np.zeros((10, 2), np.float32)
    with pytest.raises(RuntimeError):
        native.gather_windows(data, np.asarray([5], np.int64), 8, 8)


def test_pipeline_integration():
    """text/timeseries loaders route through the native layer."""
    from outeffhop_tpu.data.text import group_texts, mlm_batches, synthetic_token_stream
    from outeffhop_tpu.data.timeseries import MTSWindows, synthetic_mts

    blocks = group_texts(synthetic_token_stream(20_000, 1000, seed=0), 128)
    batch = next(iter(mlm_batches(blocks, 8, 1000, mask_token_id=4, seed=0)))
    assert batch["input_ids"].shape == (8, 128)
    assert ((batch["labels"] == -100) | (batch["labels"] >= 0)).all()

    mts = MTSWindows(synthetic_mts(500), "train", in_len=24, out_len=12)
    x, y = next(mts.batches(16))
    assert x.shape == (16, 24, 7) and y.shape == (16, 12, 7)
