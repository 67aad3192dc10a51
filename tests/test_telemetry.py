import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.telemetry import ProbeTape, inf_norm, kurtosis


def test_kurtosis_gaussian_close_to_3():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 20000)).astype(np.float32))
    k = np.asarray(kurtosis(x))
    np.testing.assert_allclose(k, 3.0, atol=0.15)


def test_kurtosis_unbiased_std_matches_manual():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 50)).astype(np.float32)
    k = np.asarray(kurtosis(jnp.asarray(x)))
    mu = x.mean(1, keepdims=True)
    s = x.std(1, ddof=1)  # torch Tensor.std default is unbiased
    want = ((x - mu) ** 4).mean(1) / (s**4 + 1e-6)
    np.testing.assert_allclose(k, want, rtol=1e-4)


def test_inf_norm():
    x = jnp.array([[1.0, -7.5], [3.0, 2.0]])
    assert float(inf_norm(x)) == 7.5


def test_probe_tape_stats_and_scoping():
    tape = ProbeTape(enabled=True, mode="stats")
    layer = tape.scoped("layer0").scoped("attention")
    x = jnp.ones((2, 3, 4))
    layer.record("attn_scores", x)
    assert "layer0.attention.attn_scores|inf_norm" in tape.values
    assert float(tape.values["layer0.attention.attn_scores|inf_norm"]) == 1.0


def test_probe_tape_disabled_is_noop():
    tape = ProbeTape(enabled=False)
    out = tape.record("x", jnp.ones(3))
    assert out.shape == (3,)
    assert tape.values == {}


def test_roofline_report_math():
    from outeffhop_tpu.utils.profiling import Cost, roofline_report

    peaks = {"bf16_tflops": 100.0, "int8_tops": 200.0, "hbm_gbps": 1000.0}
    cost = Cost(flops=1e12, bytes_hbm=1e9)
    rep = roofline_report(cost, seconds=0.02, dtype="bf16", peaks=peaks)
    assert abs(rep["achieved_tflops"] - 50.0) < 1e-6
    assert abs(rep["compute_fraction"] - 0.5) < 1e-6
    assert abs(rep["bandwidth_fraction"] - 0.05) < 1e-6
    assert rep["sol_fraction"] == rep["compute_fraction"]
    assert abs(rep["arithmetic_intensity"] - 1000.0) < 1e-6


def test_attention_cost_counts():
    from outeffhop_tpu.utils.profiling import attention_cost

    c = attention_cost(batch=2, heads=4, seq_q=128, seq_k=128, head_dim=64)
    assert c.flops == 4.0 * 2 * 4 * 128 * 128 * 64
    assert c.bytes_hbm == 2 * 4 * (2 * 128 + 2 * 128) * 64 * 2


def test_benchmark_runs_on_cpu():
    import jax.numpy as jnp
    from outeffhop_tpu.utils.profiling import benchmark

    import jax
    f = jax.jit(lambda x: x * 2 + 1)
    t = benchmark(f, jnp.ones((64, 64)), iters=3, warmup=1)
    assert t > 0


def test_eval_loop_batched_host_transfer():
    """eval_loop accumulates on device and crosses the host boundary once
    (VERDICT r3 #8): mean loss + per-probe means must match a hand-rolled
    eager reduction; empty batch lists must not divide by zero."""
    import jax.numpy as jnp
    from outeffhop_tpu.drivers.common import eval_loop

    def loss_and_count(batch, qctx, tape):
        x = jnp.asarray(batch, jnp.float32)
        if tape.enabled:
            tape.record("probe_x", x)
        return jnp.sum(x), jnp.asarray(x.size)

    batches = [np.arange(4) + i for i in range(3)]
    mean, telem = eval_loop(loss_and_count, batches)
    want = sum(float(np.sum(b)) for b in batches) / 12.0
    assert abs(mean - want) < 1e-6
    # probes recorded and aggregated (|inf_norm / |kurtosis suffixed keys)
    assert telem  # non-empty aggregation

    mean0, telem0 = eval_loop(loss_and_count, [])
    assert mean0 == 0.0 and telem0 == {}


def test_scaling_report_projection():
    """Analytic dp x tp projection (utils/profiling.scaling_report): 1-chip
    grounds to the measured MFU; collectives monotonically reduce
    efficiency; dp all-reduce overlaps when compute-bound."""
    from outeffhop_tpu.utils.profiling import scaling_report

    kw = dict(n_layers=12, hidden=768, ffn=3072, seq=128, per_chip_batch=32,
              vocab=30522, measured_mfu=0.52)
    r1 = scaling_report(dp=1, tp=1, **kw)
    assert r1["scaling_efficiency"] == 1.0
    # 1-chip projection must land near the measured 150.5k tok/s (probe31)
    assert 130_000 < r1["tokens_per_s_per_chip"] < 175_000

    r8 = scaling_report(dp=8, tp=1, **kw)
    # single-host dp: grad all-reduce rides ICI and fully overlaps
    assert r8["scaling_efficiency"] == 1.0
    assert r8["dp_allreduce_s"] > 0

    r84 = scaling_report(dp=8, tp=4, **kw)
    assert 0 < r84["scaling_efficiency"] < 1.0
    assert r84["tp_allreduce_s"] > 0
    # efficiency degrades monotonically with cross-host dp
    r644 = scaling_report(dp=64, tp=4, **kw)
    assert r644["scaling_efficiency"] <= r84["scaling_efficiency"]


def test_pipeline_scaling_report_projection():
    """GPipe projection (utils/profiling.pipeline_scaling_report): bubble
    bound M/(M+S-1) dominates; more microbatches -> closer to ideal."""
    from outeffhop_tpu.utils.profiling import pipeline_scaling_report

    kw = dict(n_layers=12, hidden=768, ffn=3072, seq=128, per_chip_batch=32,
              vocab=30522, measured_mfu=0.52)
    r = pipeline_scaling_report(n_stages=4, n_micro=4, **kw)
    assert abs(r["bubble_efficiency"] - 4 / 7) < 1e-9
    assert r["pipeline_efficiency"] <= r["bubble_efficiency"] + 1e-9
    r16 = pipeline_scaling_report(n_stages=4, n_micro=16, **kw)
    assert r16["pipeline_efficiency"] > r["pipeline_efficiency"]
    r1 = pipeline_scaling_report(n_stages=1, n_micro=1, **kw)
    assert r1["pipeline_efficiency"] > 0.99
