"""Quantized-checkpoint round trip: save a calibrated run-mode quant state,
reload it, and eval WITHOUT recalibration — the capability the reference gets
from `QuantizedModel.load_state_dict`'s dummy-forward re-materialization
(`base_quantized_model.py:34-82`) + `validate_clm.py:501-512`."""

import numpy as np
import pytest


def _mlm_args(tmp_path, extra):
    return [
        "--quantize", "--est_num_batches", "2", "--per_device_eval_batch_size", "4",
        "--synthetic_tokens", "6000", "--attn_softmax", "softmax1",
        "--num_hidden_layers", "2",
    ] + extra


def test_save_load_eval_equality(tmp_path):
    """save → load → eval must reproduce the calibrated eval bit-for-bit
    (same frozen qparams ⇒ same fake-quant grids ⇒ same loss)."""
    from outeffhop_tpu.drivers.validate_mlm import main

    ckpt = str(tmp_path / "qckpt")
    res1 = main(_mlm_args(tmp_path, ["--save_quantized_dir", ckpt]))
    res2 = main(_mlm_args(tmp_path, ["--load_quantized_dir", ckpt]))
    assert res2["int8_perplexity"] == pytest.approx(res1["int8_perplexity"], rel=1e-6)
    # FP eval unaffected by the load path
    assert res2["perplexity"] == pytest.approx(res1["perplexity"], rel=1e-6)


def test_save_load_int8_execution(tmp_path):
    """With --execute_int8 the checkpoint carries the integer weights; the
    reloaded ctx must run the real int8 path without rebuilding it."""
    from outeffhop_tpu.drivers.validate_mlm import main
    from outeffhop_tpu.quant.checkpoint import load_quantized_ckpt

    ckpt = str(tmp_path / "qckpt")
    res1 = main(_mlm_args(tmp_path, ["--execute_int8", "--save_quantized_dir", ckpt]))
    cfg, wq, aq, int8 = load_quantized_ckpt(ckpt)
    assert int8, "int8 weights missing from the checkpoint"
    import jax.numpy as jnp

    some = next(iter(int8.values()))
    assert some.w_int.dtype == jnp.int8
    res2 = main(_mlm_args(tmp_path, ["--execute_int8", "--load_quantized_dir", ckpt]))
    assert res2["int8exec_perplexity"] == pytest.approx(
        res1["int8exec_perplexity"], rel=1e-6
    )


def test_ctx_round_trip_unit(tmp_path):
    """Unit-level: QuantCtx.run state survives save/load structurally."""
    import jax.numpy as jnp

    from outeffhop_tpu.quant import (
        QuantCtx,
        ScopedQuantCtx,
        default_quant_config,
        qparams_from_range_asymmetric,
        qparams_from_range_symmetric,
    )
    from outeffhop_tpu.quant.checkpoint import quant_ctx_from_ckpt, save_quantized_ckpt

    cfg = default_quant_config()
    wq = {"enc.q|w": qparams_from_range_symmetric(
        jnp.float32(-1.5), jnp.float32(1.5), n_bits=8)}
    aq = {"enc.q|a": qparams_from_range_asymmetric(
        jnp.float32(-0.2), jnp.float32(3.0), n_bits=8), "skip|a": None}
    ctx = ScopedQuantCtx(QuantCtx.run(cfg, wq, aq), "")
    save_quantized_ckpt(str(tmp_path), ctx)
    back = quant_ctx_from_ckpt(str(tmp_path))
    b = back._ctx
    assert set(b.weight_qparams) == {"enc.q|w"}
    np.testing.assert_allclose(
        np.asarray(b.weight_qparams["enc.q|w"].delta),
        np.asarray(wq["enc.q|w"].delta),
    )
    assert b.act_qparams["skip|a"] is None
    qp = b.act_qparams["enc.q|a"]
    assert qp.n_bits == 8 and not qp.symmetric
    np.testing.assert_allclose(
        np.asarray(qp.zero_float), np.asarray(aq["enc.q|a"].zero_float)
    )
    assert b.config.quant_setup == cfg.quant_setup


def test_save_requires_run_mode(tmp_path):
    from outeffhop_tpu.quant import QuantCtx, ScopedQuantCtx, default_quant_config
    from outeffhop_tpu.quant.checkpoint import save_quantized_ckpt

    ctx = ScopedQuantCtx(QuantCtx.discover(default_quant_config()), "")
    with pytest.raises(ValueError, match="run-mode"):
        save_quantized_ckpt(str(tmp_path), ctx)


def test_format_is_non_executable(tmp_path):
    """v2 checkpoints are npz + json — no pickle on the load path."""
    import json
    import os

    import jax.numpy as jnp

    from outeffhop_tpu.quant import (
        QuantCtx, ScopedQuantCtx, default_quant_config,
        qparams_from_range_symmetric,
    )
    from outeffhop_tpu.quant.checkpoint import save_quantized_ckpt

    cfg = default_quant_config()
    wq = {"enc.q|w": qparams_from_range_symmetric(
        jnp.float32(-1.0), jnp.float32(1.0), n_bits=8)}
    ctx = ScopedQuantCtx(QuantCtx.run(cfg, wq, {}), "")
    save_quantized_ckpt(str(tmp_path), ctx)
    files = sorted(os.listdir(tmp_path))
    assert files == ["quantized_ckpt.json", "quantized_ckpt.npz"]
    meta = json.loads((tmp_path / "quantized_ckpt.json").read_text())
    assert meta["version"] == 2 and "enc.q|w" in meta["weight_qparams"]


def test_legacy_pickle_requires_explicit_path(tmp_path):
    """A directory holding only a v1 pickle is refused (pickle executes code
    on load); passing the .pkl path explicitly loads it with a warning."""
    import pickle
    import warnings

    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from outeffhop_tpu.quant import default_quant_config, qparams_from_range_symmetric
    from outeffhop_tpu.quant.checkpoint import load_quantized_ckpt

    import dataclasses
    cfg = default_quant_config()
    wq = {"enc.q|w": qparams_from_range_symmetric(
        jnp.float32(-1.0), jnp.float32(1.0), n_bits=8)}
    payload = {
        "version": 1,
        "config": dataclasses.asdict(cfg),
        "weight_qparams": jax.device_get(wq),
        "act_qparams": {},
        "int8_dense": None,
    }
    pkl = tmp_path / "quantized_ckpt.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(payload, f)
    with _pytest.raises(ValueError, match="legacy v1 pickle"):
        load_quantized_ckpt(str(tmp_path))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg2, wq2, aq2, int8 = load_quantized_ckpt(str(pkl))
    assert any("pickle" in str(x.message) for x in w)
    np.testing.assert_allclose(
        np.asarray(wq2["enc.q|w"].delta), np.asarray(wq["enc.q|w"].delta)
    )
