"""Range-estimator tests (SURVEY.md §4 item 3): EMA momentum math, percentile
conventions, MSE-grid convergence."""

import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.quant import CurrentMinMax, MSEEstimator, RunningMinMax, make_estimator
from outeffhop_tpu.quant.fake_quant import fake_quant, qparams_from_range


def test_current_minmax_last_batch_wins():
    est = CurrentMinMax()
    lo, hi = est.estimate([jnp.array([-5.0, 5.0]), jnp.array([-1.0, 2.0])])
    assert float(lo) == -1.0 and float(hi) == 2.0


def test_current_minmax_percentile_convention():
    # CurrentMinMax takes (p, 100-p): p is a small number like 1.0
    x = jnp.asarray(np.linspace(0, 100, 10001).astype(np.float32))
    est = CurrentMinMax(percentile=1.0)
    lo, hi = est.estimate([x])
    np.testing.assert_allclose(float(lo), 1.0, atol=0.05)
    np.testing.assert_allclose(float(hi), 99.0, atol=0.05)


def test_running_minmax_ema_first_batch_initializes():
    # EMA: new = 0.1*batch + 0.9*old; first batch initializes (:99-104)
    est = RunningMinMax(momentum=0.9)
    b1 = jnp.array([-1.0, 1.0])
    b2 = jnp.array([-3.0, 5.0])
    lo, hi = est.estimate([b1, b2])
    np.testing.assert_allclose(float(lo), 0.1 * -3.0 + 0.9 * -1.0, rtol=1e-6)
    np.testing.assert_allclose(float(hi), 0.1 * 5.0 + 0.9 * 1.0, rtol=1e-6)


def test_running_minmax_percentile_convention():
    # RunningMinMax takes (100-p, p): p is a large number like 99.0
    x = jnp.asarray(np.linspace(0, 100, 10001).astype(np.float32))
    est = RunningMinMax(percentile=99.0)
    lo, hi = est.estimate([x])
    np.testing.assert_allclose(float(lo), 1.0, atol=0.05)
    np.testing.assert_allclose(float(hi), 99.0, atol=0.05)


def test_running_minmax_matches_reference_fold():
    rng = np.random.default_rng(0)
    batches = [rng.normal(size=(100,)).astype(np.float32) for _ in range(5)]
    est = RunningMinMax()
    lo, hi = est.estimate([jnp.asarray(b) for b in batches])
    ref_lo, ref_hi = None, None
    for b in batches:
        blo, bhi = b.min(), b.max()
        if ref_lo is None:
            ref_lo, ref_hi = blo, bhi
        else:
            ref_lo = 0.1 * blo + 0.9 * ref_lo
            ref_hi = 0.1 * bhi + 0.9 * ref_hi
    np.testing.assert_allclose(float(lo), ref_lo, rtol=1e-5)
    np.testing.assert_allclose(float(hi), ref_hi, rtol=1e-5)


def test_per_channel_minmax():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(4, 6))
    est = CurrentMinMax(per_channel=True)
    lo, hi = est.estimate([x])
    np.testing.assert_allclose(np.asarray(lo), [0, 6, 12, 18])
    np.testing.assert_allclose(np.asarray(hi), [5, 11, 17, 23])


def test_mse_grid_beats_minmax_with_outlier():
    """MSE-chosen range must give lower quant MSE than plain minmax when the
    tensor has a single huge outlier."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4096)).astype(np.float32)
    x[0, 0] = 60.0  # outlier
    xj = jnp.asarray(x)

    est = MSEEstimator(n_bits=4, symmetric=True, num_candidates=100)
    lo, hi = est.estimate([xj])
    qp_mse = qparams_from_range(lo, hi, n_bits=4, symmetric=True)
    qp_mm = qparams_from_range(x.min(), x.max(), n_bits=4, symmetric=True)

    mse_mse = float(jnp.mean(jnp.square(fake_quant(xj, qp_mse) - xj)))
    mse_mm = float(jnp.mean(jnp.square(fake_quant(xj, qp_mm) - xj)))
    assert mse_mse < mse_mm
    assert float(hi) < 30.0  # clipped the outlier


def test_mse_2d_asymmetric_search():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(1, 2048)) * 0.5 + 1.0).astype(np.float32)  # two-sided, skewed
    est = MSEEstimator(n_bits=4, symmetric=False, num_candidates=20)
    lo, hi = est.estimate([jnp.asarray(x)])
    qp = qparams_from_range(lo, hi, n_bits=4, symmetric=False)
    qp_mm = qparams_from_range(x.min(), x.max(), n_bits=4, symmetric=False)
    xj = jnp.asarray(x)
    assert float(jnp.mean(jnp.square(fake_quant(xj, qp) - xj))) <= float(
        jnp.mean(jnp.square(fake_quant(xj, qp_mm) - xj))
    ) * 1.05


def test_mse_loss_accumulates_across_batches():
    rng = np.random.default_rng(3)
    b1 = jnp.asarray(rng.normal(size=(1, 512)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(1, 512)).astype(np.float32) * 2)
    est = MSEEstimator(n_bits=8, symmetric=True, num_candidates=50)
    lo12, hi12 = est.estimate([b1, b2])
    lo1, hi1 = MSEEstimator(n_bits=8, symmetric=True, num_candidates=50).estimate([b1])
    # accumulated result reflects both batches: range grows vs b1-only
    assert float(hi12) >= float(hi1)


def test_make_estimator_registry():
    assert isinstance(make_estimator("running_minmax"), RunningMinMax)
    assert isinstance(make_estimator("current_minmax"), CurrentMinMax)
    assert isinstance(make_estimator("mse", symmetric=True), MSEEstimator)


def test_mse_golden_section_1d_symmetric():
    """golden_section finds (or beats) the grid optimum for symmetric ranges
    (OptMethod.golden_section, range_estimators.py:109-111)."""
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.fake_quant import fake_quant, qparams_from_range_symmetric
    from outeffhop_tpu.quant.ranges import MSEEstimator

    rs = np.random.RandomState(0)
    x = jnp.asarray(np.concatenate([rs.normal(0, 1, 4000), rs.uniform(-6, 6, 200)]),
                    jnp.float32).reshape(1, -1)

    def mse_at(thr):
        qp = qparams_from_range_symmetric(-thr, thr, n_bits=8, signed=True)
        return float(jnp.mean((fake_quant(x, qp) - x) ** 2))

    grid = MSEEstimator(n_bits=8, symmetric=True, opt_method="grid")
    sg = grid.update(grid.init_state(), x)
    gmin, gmax = grid.finalize(sg)

    gold = MSEEstimator(n_bits=8, symmetric=True, opt_method="golden_section")
    st = gold.update(gold.init_state(), x)
    lo, hi = gold.finalize(st)
    assert float(lo) == -float(hi)
    # golden must be at least as good as the 100-candidate grid...
    assert mse_at(float(hi)) <= mse_at(float(gmax)) * 1.02
    # ...and never worse than naive minmax
    assert mse_at(float(hi)) <= mse_at(float(jnp.max(jnp.abs(x)))) * 1.001


def test_mse_golden_section_2d_asymmetric():
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.ranges import MSEEstimator

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.normal(2.0, 1.0, 4000), jnp.float32).reshape(1, -1)
    est = MSEEstimator(n_bits=8, symmetric=False, opt_method="golden_section")
    lo, hi = est.finalize(est.update(est.init_state(), x))
    assert float(lo) < float(hi)
    # the skew search should shift the range toward the positive mass
    assert abs(float(hi)) > abs(float(lo))


def test_log_scale_domain_qparams():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.fake_quant import QParams, fake_quant

    x = jnp.linspace(-1.0, 1.0, 101)
    lin = QParams(delta=jnp.asarray(0.01), zero_float=jnp.asarray(100.0),
                  n_bits=8, symmetric=False)
    log = QParams(delta=jnp.log(jnp.asarray(0.01)), zero_float=jnp.asarray(100.0),
                  n_bits=8, symmetric=False, scale_domain="log")
    np.testing.assert_allclose(
        np.asarray(fake_quant(x, lin)), np.asarray(fake_quant(x, log)), rtol=1e-6
    )
    # learned-log-scale gradient is finite and nonzero
    g = jax.grad(
        lambda d: jnp.sum(fake_quant(x, QParams(
            delta=d, zero_float=jnp.asarray(100.0), n_bits=8,
            symmetric=False, scale_domain="log")) ** 2)
    )(jnp.log(jnp.asarray(0.01)))
    assert bool(jnp.isfinite(g)) and float(jnp.abs(g)) > 0


def test_mse_golden_section_per_channel():
    """Regression (ADVICE r1): per_channel + golden_section must return
    per-channel (C,) thresholds tracking the per-channel grid search, not a
    silent per-tensor collapse."""
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.ranges import MSEEstimator

    rs = np.random.RandomState(0)
    # channels with very different scales force distinct optima
    x = jnp.asarray(
        np.stack([rs.normal(0, 0.1, 512), rs.normal(0, 1.0, 512), rs.normal(0, 5.0, 512)]),
        jnp.float32,
    )
    gold = MSEEstimator(n_bits=8, symmetric=True, per_channel=True,
                        opt_method="golden_section")
    lo, hi = gold.finalize(gold.update(gold.init_state(), x))
    assert lo.shape == (3,) and hi.shape == (3,)
    grid = MSEEstimator(n_bits=8, symmetric=True, per_channel=True, opt_method="grid")
    glo, ghi = grid.finalize(grid.update(grid.init_state(), x))
    # channel optima must scale with the channel std and track the grid search
    np.testing.assert_allclose(np.asarray(hi), np.asarray(ghi), rtol=0.15)
    assert float(hi[0]) < float(hi[1]) < float(hi[2])


def test_mse_golden_section_per_channel_asymmetric():
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.quant.ranges import MSEEstimator

    rs = np.random.RandomState(1)
    x = jnp.asarray(
        np.stack([rs.normal(2.0, 1.0, 512), rs.normal(-1.0, 0.5, 512)]), jnp.float32
    )
    est = MSEEstimator(n_bits=8, symmetric=False, per_channel=True,
                       opt_method="golden_section")
    lo, hi = est.finalize(est.update(est.init_state(), x))
    assert lo.shape == (2,) and hi.shape == (2,)
    # skew follows each channel's mass
    assert abs(float(hi[0])) > abs(float(lo[0]))   # positive-mean channel
    assert abs(float(lo[1])) > abs(float(hi[1]))   # negative-mean channel
