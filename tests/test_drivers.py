"""End-to-end driver tests (tiny synthetic configs, in-process main() calls)."""

import json
import os

import numpy as np
import pytest


def test_validate_mlm_fp_and_int8(tmp_path):
    from outeffhop_tpu.drivers.validate_mlm import main

    res = main([
        "--quantize", "--est_num_batches", "2", "--per_device_eval_batch_size", "4",
        "--synthetic_tokens", "8000", "--attn_softmax", "softmax1",
        "--num_hidden_layers", "2", "--output_dir", str(tmp_path),
    ])
    assert np.isfinite(res["perplexity"]) and np.isfinite(res["int8_perplexity"])
    # INT8 must stay close to FP on this scale (outlier-efficient PTQ claim)
    assert abs(res["delta_perplexity"]) / res["perplexity"] < 0.05
    assert "fp_max_inf_norm" in res and "fp_avg_kurtosis" in res
    saved = json.load(open(tmp_path / "all_results.json"))
    assert saved["perplexity"] == res["perplexity"]


def test_validate_clm_quant_setup(tmp_path):
    from outeffhop_tpu.drivers.validate_clm import main

    res = main([
        "--quantize", "--quant_setup", "fp32_head", "--percentile", "99.999",
        "--est_num_batches", "2", "--per_device_eval_batch_size", "2",
        "--synthetic_tokens", "8000", "--block_size", "64",
        "--num_hidden_layers", "2", "--attn_softmax", "softmax1",
        "--output_dir", str(tmp_path),
    ])
    assert np.isfinite(res["int8_perplexity"])
    assert abs(res["delta_perplexity"]) / res["perplexity"] < 0.05


def test_validate_vit_int8(tmp_path):
    from outeffhop_tpu.drivers.validate_vit import main

    res = main([
        "--quantize", "--est_num_batches", "2", "--per_device_eval_batch_size", "8",
        "--attn_softmax", "softmax1", "--num_hidden_layers", "2",
        "--weights_fp8", "--output_dir", str(tmp_path),
    ])
    assert 0.0 <= res["top1"] <= 100.0
    assert "int8_top1" in res
    # fp8(e4m3) weight round-trip (the quanto-qfloat8 capability) must not
    # collapse accuracy — e4m3 has more precision than int8 per-channel here
    assert abs(res["fp8_delta_top1"]) <= max(5.0, abs(res["delta_top1"]) + 5.0)


def test_run_mlm_train_ckpt_resume(tmp_path):
    from outeffhop_tpu.drivers.run_mlm import main

    out = str(tmp_path / "run")
    res = main([
        "--synthetic_tokens", "6000", "--per_device_train_batch_size", "4",
        "--max_train_steps", "3", "--num_hidden_layers", "2",
        "--checkpointing_steps", "2", "--output_dir", out, "--mesh_model", "2",
    ])
    assert res["completed_steps"] == 3
    assert os.path.isdir(os.path.join(out, "step_2"))
    res2 = main([
        "--synthetic_tokens", "6000", "--per_device_train_batch_size", "4",
        "--max_train_steps", "5", "--num_hidden_layers", "2",
        "--resume_from_checkpoint", out, "--output_dir", out, "--mesh_model", "2",
    ])
    assert res2["completed_steps"] == 5


def test_run_clm_lr_stretch(tmp_path):
    from outeffhop_tpu.drivers.run_clm import main

    res = main([
        "--synthetic_tokens", "6000", "--block_size", "64",
        "--per_device_train_batch_size", "2", "--max_train_steps", "3",
        "--num_hidden_layers", "2", "--final_lr_fraction", "0.1",
        "--num_warmup_steps", "1",
    ])
    assert res["completed_steps"] == 3
    assert np.isfinite(res["perplexity"])


def test_main_stanhop_train_test_eval(tmp_path, monkeypatch):
    from outeffhop_tpu.drivers.main_stanhop import main

    monkeypatch.chdir(tmp_path)
    args = [
        "--in_len", "24", "--out_len", "12", "--seg_len", "6",
        "--d_model", "16", "--d_ff", "32", "--n_heads", "2", "--e_layers", "2",
        "--train_epochs", "1", "--batch_size", "16", "--synthetic_len", "400",
        "--mode", "softmax1", "--dropout", "0.0",
        "--checkpoints", str(tmp_path / "ck"),
    ]
    res = main(args)
    assert np.isfinite(res[0]["mse"])
    # eval-from-checkpoint path (eval_crossformer.py equivalent)
    run_dirs = os.listdir(tmp_path / "ck")
    assert len(run_dirs) == 1
    from outeffhop_tpu.drivers.main_stanhop import main as main2

    res2 = main2(["--eval_dir", str(tmp_path / "ck" / run_dirs[0])])
    assert abs(res2["mse"] - res[0]["mse"]) < 1e-4


def test_parsers_have_reference_flags():
    from outeffhop_tpu.drivers.validate_mlm import build_parser as p1
    from outeffhop_tpu.drivers.validate_clm import build_parser as p2
    from outeffhop_tpu.drivers.run_mlm import build_parser as p3

    for bp in (p1, p2, p3):
        opts = {a.dest for a in bp()._actions}
        for flag in ["attn_softmax", "alpha", "attn_gate_type", "quantize",
                     "n_bits", "qmethod_acts", "ranges_acts", "percentile",
                     "quant_setup", "est_num_batches", "learning_rate",
                     "gradient_accumulation_steps"]:
            assert flag in opts, f"{bp.__module__} missing --{flag}"


def test_run_vit_train_mixup_ema(tmp_path):
    """ViT training driver: mixup+cutmix+smoothing+EMA, best-ckpt save
    (run_vit.py parity)."""
    from outeffhop_tpu.drivers.run_vit import main

    out = str(tmp_path / "vit")
    res = main([
        "--num_train_epochs", "2", "--train_samples", "64",
        "--per_device_train_batch_size", "16", "--per_device_eval_batch_size", "16",
        "--img_size", "16", "--patch_size", "8", "--num_classes", "4",
        "--hidden_size", "32", "--num_hidden_layers", "2",
        "--num_attention_heads", "2", "--attn_softmax", "softmax1",
        "--mixup", "0.2", "--cutmix", "0.2", "--smoothing", "0.1",
        "--model_ema", "--learning_rate", "3e-3", "--output_dir", out,
    ])
    assert res["completed_steps"] == 8
    assert 0.0 <= res["top1"] <= 100.0
    assert "ema_top1" in res
    assert os.path.isdir(os.path.join(out, "best"))
    assert os.path.isdir(os.path.join(out, "epoch_1"))


def test_run_vit_resume(tmp_path):
    from outeffhop_tpu.drivers.run_vit import main

    out = str(tmp_path / "vit")
    common = [
        "--train_samples", "32", "--per_device_train_batch_size", "16",
        "--per_device_eval_batch_size", "16", "--img_size", "16",
        "--patch_size", "8", "--num_classes", "2", "--hidden_size", "32",
        "--num_hidden_layers", "1", "--num_attention_heads", "2",
        "--output_dir", out,
    ]
    main(["--num_train_epochs", "1"] + common)
    res = main(["--num_train_epochs", "2", "--resume_from_checkpoint", out] + common)
    # resumed at epoch 1 → only one more epoch of 2 steps
    assert res["completed_steps"] == 2


def test_validate_mlm_execute_int8(tmp_path):
    """Real int8 MXU execution tracks the fake-quant simulation perplexity."""
    from outeffhop_tpu.drivers.validate_mlm import main

    res = main([
        "--quantize", "--execute_int8", "--est_num_batches", "2",
        "--synthetic_tokens", "20000", "--per_device_eval_batch_size", "8",
        "--num_hidden_layers", "2", "--attn_softmax", "softmax1",
        "--output_dir", str(tmp_path),
    ])
    assert "int8exec_perplexity" in res
    rel = abs(res["int8exec_perplexity"] - res["int8_perplexity"]) / res["int8_perplexity"]
    assert rel < 0.02, res


def test_tracking_jsonl_and_tensorboard(tmp_path):
    """--with_tracking writes metrics.jsonl (and a TB event dir when asked)."""
    import json as _json
    from outeffhop_tpu.drivers.run_vit import main

    out = str(tmp_path / "tracked")
    main([
        "--num_train_epochs", "1", "--train_samples", "32",
        "--per_device_train_batch_size", "16", "--per_device_eval_batch_size", "16",
        "--img_size", "16", "--patch_size", "8", "--num_classes", "2",
        "--hidden_size", "32", "--num_hidden_layers", "1",
        "--num_attention_heads", "2", "--output_dir", out,
        "--with_tracking", "--report_to", "jsonl,tensorboard", "--run_name", "t1",
    ])
    lines = [
        _json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))
    ]
    assert any("eval/top1" in l for l in lines)
    assert os.path.isdir(os.path.join(out, "tb", "t1"))


def test_validate_mlm_real_state_dict(tmp_path):
    """The parity-runbook load path (scripts/parity_runbook.md): a REAL
    `pytorch_model.bin` on disk → `--model_name_or_path` → converted pytree →
    FP + INT8 eval. Fabricates the checkpoint with HF torch BERT, exactly what
    `save_pretrained` produces outside the sandbox."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForMaskedLM

    hf_cfg = HFBertConfig(
        vocab_size=1000, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save(BertForMaskedLM(hf_cfg).eval().state_dict(),
               ckpt / "pytorch_model.bin")

    from outeffhop_tpu.drivers.validate_mlm import main

    res = main([
        "--model_name_or_path", str(ckpt), "--num_hidden_layers", "2",
        "--quantize", "--est_num_batches", "2",
        "--per_device_eval_batch_size", "4", "--synthetic_tokens", "8000",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert np.isfinite(res["perplexity"]) and np.isfinite(res["int8_perplexity"])
    # untrained random torch weights: ppl near uniform over 1000 tokens
    assert 200 < res["perplexity"] < 5000
    assert abs(res["delta_perplexity"]) / res["perplexity"] < 0.2


def test_run_mlm_pipeline_mode(tmp_path):
    """--pipeline_stages switches run_mlm onto the GPipe ('pipe','data')
    mesh; training completes, eval runs on the unstacked params."""
    from outeffhop_tpu.drivers.run_mlm import main

    out = str(tmp_path / "pp")
    res = main([
        "--synthetic_tokens", "6000", "--per_device_train_batch_size", "4",
        "--max_train_steps", "3", "--num_hidden_layers", "2",
        "--pipeline_stages", "2", "--pipeline_microbatches", "2",
        "--pipeline_data", "2", "--output_dir", out,
    ])
    assert res["completed_steps"] == 3
    assert res["perplexity"] > 0


def test_run_clm_pipeline_mode():
    from outeffhop_tpu.drivers.run_clm import main

    res = main([
        "--synthetic_tokens", "4000", "--per_device_train_batch_size", "4",
        "--max_train_steps", "2", "--num_hidden_layers", "2",
        "--block_size", "16", "--pipeline_stages", "2",
        "--pipeline_microbatches", "2", "--pipeline_data", "1",
    ])
    assert res["completed_steps"] == 2
    assert res["perplexity"] > 0


def test_run_vit_pipeline_mode():
    from outeffhop_tpu.drivers.run_vit import main

    res = main([
        "--max_train_steps", "2", "--per_device_train_batch_size", "4",
        "--num_hidden_layers", "2", "--train_samples", "16",
        "--pipeline_stages", "2", "--pipeline_microbatches", "2",
        "--pipeline_data", "2",
    ])
    assert res["completed_steps"] == 2
    assert 0.0 <= res["top1"] <= 100.0


def test_run_mlm_profile_dir(tmp_path):
    """--profile_dir captures a jax.profiler trace of the step window
    (SURVEY.md par.5: the reference has no profiler subsystem; ours does)."""
    from outeffhop_tpu.drivers.run_mlm import main

    prof = str(tmp_path / "trace")
    res = main([
        "--synthetic_tokens", "6000", "--per_device_train_batch_size", "4",
        "--max_train_steps", "4", "--num_hidden_layers", "2",
        "--profile_dir", prof, "--profile_start_step", "1",
        "--profile_steps", "2",
    ])
    assert res["completed_steps"] == 4
    # jax writes plugins/profile/<ts>/*.xplane.pb under the logdir
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(prof)
        for f in fs
        if f.endswith(".xplane.pb") or f.endswith(".trace.json.gz")
    ]
    assert found, f"no trace artifacts under {prof}"


def test_main_stanhop_execute_int8(tmp_path, monkeypatch):
    """--quantize --execute_int8: the forecaster's calibrated dense sites run
    as real W8A8 int8 matmuls; metrics must track the fake-quant simulation
    (same agreement contract as validate_mlm/clm --execute_int8)."""
    from outeffhop_tpu.drivers.main_stanhop import main

    monkeypatch.chdir(tmp_path)
    common = [
        "--in_len", "24", "--out_len", "12", "--seg_len", "6",
        "--d_model", "16", "--d_ff", "32", "--n_heads", "2", "--e_layers", "2",
        "--train_epochs", "1", "--batch_size", "16", "--synthetic_len", "400",
        "--mode", "softmax1", "--dropout", "0.0", "--est_num_batches", "2",
        "--seed", "3",
    ]
    sim = main(common + ["--quantize", "--checkpoints", str(tmp_path / "a")])
    ex = main(common + ["--quantize", "--execute_int8",
                        "--checkpoints", str(tmp_path / "b")])
    assert np.isfinite(ex[0]["int8_mse"])
    # identical training seed -> identical FP params; int8 execution vs
    # fake-quant simulation agree to simulation tolerance
    assert abs(ex[0]["mse"] - sim[0]["mse"]) < 1e-6
    assert abs(ex[0]["int8_mse"] - sim[0]["int8_mse"]) < 5e-3 * max(
        1.0, abs(sim[0]["int8_mse"])
    )


def test_main_stanhop_quantized_ckpt_roundtrip(tmp_path, monkeypatch):
    """--save_quantized_dir / --load_quantized_dir: the calibrated forecaster
    quant state round-trips (recalibration-free reload gives identical int8
    metrics) — the quantized-STanHop checkpoint capability the reference
    README advertises with no code behind it (STanHop_outlier/ empty)."""
    from outeffhop_tpu.drivers.main_stanhop import main

    monkeypatch.chdir(tmp_path)
    common = [
        "--in_len", "24", "--out_len", "12", "--seg_len", "6",
        "--d_model", "16", "--d_ff", "32", "--n_heads", "2", "--e_layers", "2",
        "--train_epochs", "1", "--batch_size", "16", "--synthetic_len", "400",
        "--mode", "softmax1", "--dropout", "0.0", "--est_num_batches", "2",
        "--seed", "11", "--quantize",
    ]
    qdir = str(tmp_path / "qstate")
    a = main(common + ["--save_quantized_dir", qdir,
                       "--checkpoints", str(tmp_path / "a")])
    b = main(common + ["--load_quantized_dir", qdir,
                       "--checkpoints", str(tmp_path / "b")])
    assert abs(a[0]["int8_mse"] - b[0]["int8_mse"]) < 1e-6


def test_console_scripts_resolve():
    """Every [project.scripts] target in pyproject.toml imports and exposes a
    callable. Guards against the dangling-module-path class of bug (round-4
    VERDICT: oeh-stanhop pointed at a nonexistent drivers.stanhop_experiment).
    Reference surface: /root/reference/OutEffHop/setup.py:4-17."""
    import importlib
    import pathlib
    import tomllib

    pyproject = pathlib.Path(__file__).resolve().parents[1] / "pyproject.toml"
    scripts = tomllib.loads(pyproject.read_text())["project"]["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, _, attr = target.partition(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_resolve_train_use_flash_policy():
    """Auto train-flash policy (BASELINE probe45/45b/21 regimes): explicit
    flags win; CPU is always off; bidirectional auto-on (gated per-shape in
    the models); causal crosses at the measured memory threshold."""
    from outeffhop_tpu.drivers.common import resolve_train_use_flash

    kw = dict(n_layers=12, batch=2, seq=2048, n_heads=12)
    # explicit always wins, any backend
    assert resolve_train_use_flash(True, causal=True, **kw) is True
    assert resolve_train_use_flash(False, causal=False, **kw) is False
    # auto on CPU: off (this test process is pinned to the CPU platform)
    assert resolve_train_use_flash(None, causal=False, **kw) is False
    assert resolve_train_use_flash(None, causal=True, **kw) is False
    # the causal threshold math (backend-independent part):
    resid = lambda b, t: 12 * b * 12 * t * t * 2
    assert resid(2, 2048) < 3.5 * 1024**3 < resid(1, 4096)


def test_main_stanhop_etth1_schema_csv(tmp_path, monkeypatch):
    """The ETTh1 data path end-to-end: the pinned-schema CSV generator
    (results/acc_etth1_schema.py), the native CSV parser, the reference's
    ETTh1 border arithmetic (12*30*24/4*30*24/4*30*24), train->test->eval
    restore — at a tiny model config so it fits the suite budget. The
    realistic-scale row lives in BASELINE.md (MSE 0.17462)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "acc_etth1_schema",
        pathlib.Path(__file__).resolve().parents[1]
        / "results" / "acc_etth1_schema.py",
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    gen.OUT_DIR = str(tmp_path / "etth1")
    csv_path = gen.make_pinned_csv()
    assert csv_path.endswith("ETTh1.csv")

    from outeffhop_tpu.drivers.main_stanhop import main

    monkeypatch.chdir(tmp_path)
    args = [
        "--data", "ETTh1", "--root_path", str(tmp_path / "etth1"),
        "--in_len", "24", "--out_len", "12", "--seg_len", "6",
        "--d_model", "16", "--d_ff", "32", "--n_heads", "2", "--e_layers", "2",
        "--train_epochs", "1", "--batch_size", "64", "--mode", "softmax1",
        "--dropout", "0.0", "--seed", "5",
        "--checkpoints", str(tmp_path / "ck"),
    ]
    res = main(args)
    assert np.isfinite(res[0]["mse"]) and res[0]["mse"] > 0
    # eval restore reproduces the test metrics (eval_crossformer path)
    setting = [d for d in os.listdir(tmp_path / "ck")][0]
    res_eval = main(["--eval_dir", str(tmp_path / "ck" / setting)])
    assert abs(res_eval["mse"] - res[0]["mse"]) < 1e-9
