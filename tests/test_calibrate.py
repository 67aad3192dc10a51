"""End-to-end calibrate → freeze → run pipeline tests on a toy model."""

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.quant import (
    QuantCtx,
    QuantizedModelConfig,
    ScopedQuantCtx,
    compute_weight_qparams,
    freeze_act_qparams,
    run_calibration,
)
from outeffhop_tpu.quant.fake_quant import fake_quant


def toy_forward(params, x, q):
    """linear → gelu → linear with weight + act quant sites."""
    w1 = q.weight("fc1", params["w1"])
    h = x @ w1.T + params["b1"]
    h = q.act("fc1_out", jax.nn.gelu(h))
    w2 = q.weight("head.proj", params["w2"], kind="w")
    y = h @ w2.T + params["b2"]
    y = q.act("head.out", y)
    return y


def make_toy():
    rng = np.random.default_rng(0)
    params = {
        "w1": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32) * 0.5),
        "b1": jnp.zeros(16),
        "w2": jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32) * 0.5),
        "b2": jnp.zeros(4),
    }
    batches = [jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32)) for _ in range(6)]
    return params, batches


def run_pipeline(config):
    params, batches = make_toy()
    ctx = QuantCtx.discover(config)
    toy_forward(params, batches[0], ScopedQuantCtx(ctx, ""))
    wq = compute_weight_qparams(ctx.discovered_weights, config)
    est = run_calibration(
        lambda b, q: toy_forward(params, b, q), config, wq, batches
    )
    aq = freeze_act_qparams(est, config)
    return params, batches, wq, aq, ctx


def test_discover_finds_all_sites():
    config = QuantizedModelConfig()
    params, batches = make_toy()
    ctx = QuantCtx.discover(config)
    toy_forward(params, batches[0], ScopedQuantCtx(ctx, ""))
    assert set(ctx.discovered_weights) == {"fc1|w", "head.proj|w"}
    assert set(ctx.discovered_acts) == {"fc1_out|a", "head.out|a"}


def test_full_pipeline_quantizes():
    config = QuantizedModelConfig(est_num_batches=4)
    params, batches, wq, aq, _ = run_pipeline(config)
    qctx = ScopedQuantCtx(QuantCtx.run(config, wq, aq), "")
    y_q = toy_forward(params, batches[-1], qctx)
    y_fp = toy_forward(params, batches[-1], ScopedQuantCtx(None, ""))
    err = float(jnp.max(jnp.abs(y_q - y_fp)))
    assert 0 < err < 0.5  # quantized but close


def test_run_mode_is_jittable_and_deterministic():
    config = QuantizedModelConfig(est_num_batches=4)
    params, batches, wq, aq, _ = run_pipeline(config)

    @jax.jit
    def f(p, x):
        return toy_forward(p, x, ScopedQuantCtx(QuantCtx.run(config, wq, aq), ""))

    a = np.asarray(f(params, batches[0]))
    b = np.asarray(f(params, batches[0]))
    np.testing.assert_array_equal(a, b)


def test_fp32_head_policy_skips_head_sites():
    config = QuantizedModelConfig(quant_setup="fp32_head", est_num_batches=4)
    params, batches, wq, aq, _ = run_pipeline(config)
    assert wq["head.proj|w"] is None
    assert aq.get("head.out|a") is None  # disabled sites never enter the state
    assert wq["fc1|w"] is not None
    assert aq["fc1_out|a"] is not None


def test_calibration_running_minmax_order_dependent_ema():
    """EMA state must reproduce the exact reference fold (momentum 0.9,
    first batch initializes) over the calibration batches."""
    config = QuantizedModelConfig(est_num_batches=6)
    params, batches, wq, aq, _ = run_pipeline(config)

    # replay manually: the site sees gelu output with fc1 weights fake-quanted
    lo = hi = None
    for b in batches[: config.est_num_batches]:
        w1q = fake_quant(params["w1"], wq["fc1|w"])
        h = np.asarray(jax.nn.gelu(b @ w1q.T + params["b1"]))
        blo, bhi = h.min(), h.max()
        if lo is None:
            lo, hi = blo, bhi
        else:
            lo = 0.1 * blo + 0.9 * lo
            hi = 0.1 * bhi + 0.9 * hi
    qp = aq["fc1_out|a"]
    from outeffhop_tpu.quant.fake_quant import qparams_from_range_asymmetric

    want = qparams_from_range_asymmetric(lo, hi, n_bits=8)
    np.testing.assert_allclose(float(qp.delta), float(want.delta), rtol=1e-4)
    np.testing.assert_allclose(float(qp.zero_float), float(want.zero_float), rtol=1e-4)


def test_percentile_act_calibration():
    config = QuantizedModelConfig(percentile=99.0, est_num_batches=4)
    params, batches, wq, aq, _ = run_pipeline(config)
    # percentile range must be tighter than absolute minmax
    config2 = QuantizedModelConfig(est_num_batches=4)
    _, _, _, aq2, _ = run_pipeline(config2)
    assert float(aq["fc1_out|a"].x_max) <= float(aq2["fc1_out|a"].x_max) + 1e-6


def test_int16_ln_policy_bits():
    config = QuantizedModelConfig(quant_setup="fp32_head+int16_all_LN")
    site = config.act_site("layer0.ln|ln_unary")
    assert site.n_bits == 16
    site8 = QuantizedModelConfig().act_site("layer0.ln|ln_unary")
    assert site8.n_bits == 8


def test_per_channel_weight_qparams():
    config = QuantizedModelConfig(per_channel_weights=True)
    params, batches, wq, aq, _ = run_pipeline(config)
    assert wq["fc1|w"].delta.shape == (16, 1)


def test_histogram_percentile_matches_exact_within_tolerance():
    """The O(n) histogram quantile (--percentile_impl histogram) must agree
    with the exact full-sort percentile to within one bin width of the
    dynamic range (SURVEY §7 percentile tolerance story)."""
    import jax.numpy as jnp
    import numpy as np

    from outeffhop_tpu.quant.calibrate import _batch_lo_hi
    from outeffhop_tpu.quant.config import SiteCfg

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([
        rng.normal(size=100_000), rng.normal(size=50) * 30.0  # outlier tail
    ]).astype(np.float32))
    for pct, est in [(99.999, "running_minmax"), (0.01, "current_minmax")]:
        exact_cfg = SiteCfg(enabled=True, estimator=est,
                            estimator_kw={"percentile": pct})
        hist_cfg = SiteCfg(enabled=True, estimator=est,
                           estimator_kw={"percentile": pct,
                                         "percentile_impl": "histogram"})
        lo_e, hi_e = _batch_lo_hi(exact_cfg, x)
        lo_h, hi_h = _batch_lo_hi(hist_cfg, x)
        span = float(jnp.max(x) - jnp.min(x))
        tol = span / 8192 * 1.5
        assert abs(float(lo_e) - float(lo_h)) < tol, (pct, est)
        assert abs(float(hi_e) - float(hi_h)) < tol, (pct, est)


def test_histogram_percentile_in_driver(tmp_path):
    from outeffhop_tpu.drivers.validate_clm import main

    res = main([
        "--quantize", "--quant_setup", "fp32_head", "--percentile", "99.999",
        "--percentile_impl", "histogram",
        "--est_num_batches", "2", "--per_device_eval_batch_size", "2",
        "--synthetic_tokens", "6000", "--block_size", "64",
        "--num_hidden_layers", "2", "--attn_softmax", "softmax1",
    ])
    import numpy as np
    assert np.isfinite(res["int8_perplexity"])
    assert abs(res["delta_perplexity"]) / res["perplexity"] < 0.05


def test_trace_discovery_matches_eager_and_runs_nothing():
    """QuantCtx.trace_discovery must record exactly the sites an eager
    discovery forward records — with CONCRETE weight leaves (closed-over
    params survive jax.eval_shape untouched) and zero device execution."""
    config = QuantizedModelConfig()
    params, batches = make_toy()

    eager = QuantCtx.discover(config)
    toy_forward(params, batches[0], ScopedQuantCtx(eager, ""))

    calls = {"n": 0}

    def counting_forward(b, q):
        calls["n"] += 1
        return toy_forward(params, b, q)

    traced = QuantCtx.trace_discovery(config, counting_forward, batches[0])
    assert calls["n"] == 1
    assert set(traced.discovered_weights) == set(eager.discovered_weights)
    assert set(traced.discovered_acts) == set(eager.discovered_acts)
    for name, (w, ax) in traced.discovered_weights.items():
        assert isinstance(w, jax.Array), f"{name} recorded a tracer, not a value"
        ew, eax = eager.discovered_weights[name]
        assert ax == eax
        assert jnp.array_equal(w, ew)
    # downstream qparams must be identical
    wq_t = compute_weight_qparams(traced.discovered_weights, config)
    wq_e = compute_weight_qparams(eager.discovered_weights, config)
    for k in wq_e:
        assert jnp.array_equal(wq_t[k].delta, wq_e[k].delta)
