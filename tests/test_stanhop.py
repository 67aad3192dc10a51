"""STanHop stack tests: Hopfield parity vs a torch implementation of the
reference semantics (value = value_proj(key_proj(·)), mix=True head merge),
full-model shapes for every softmax mode, window/border arithmetic, and the
quantized-STanHop pipeline (capability the reference advertises but ships no
code for)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from outeffhop_tpu.data.timeseries import MTSWindows, StandardScaler, synthetic_mts
from outeffhop_tpu.models.stanhop import (
    STanHopConfig,
    hopfield,
    hopfield_params,
    init_stanhop_params,
    stanhop_forward,
)
from outeffhop_tpu.utils.metrics import metric

CFG = STanHopConfig(
    data_dim=3, in_len=24, out_len=12, seg_len=6, win_size=2,
    factor=4, d_model=16, d_ff=32, n_heads=2, e_layers=2,
    dropout=0.0, mode="softmax",
)


class TorchHopfield(nn.Module):
    """Reference Hopfield (hopfield.py:53-90) verbatim semantics."""

    def __init__(self, d_model, n_heads):
        super().__init__()
        dk = d_model // n_heads
        self.query_projection = nn.Linear(d_model, dk * n_heads)
        self.key_projection = nn.Linear(d_model, dk * n_heads)
        self.value_projection = nn.Linear(dk * n_heads, dk * n_heads)
        self.out_projection = nn.Linear(dk * n_heads, d_model)
        self.n_heads = n_heads

    def forward(self, queries, keys, values):
        B, L, _ = queries.shape
        _, S, _ = keys.shape
        H = self.n_heads
        q = self.query_projection(queries).view(B, L, H, -1)
        k = self.key_projection(keys)
        v = self.value_projection(self.key_projection(values)).view(B, S, H, -1)
        k = k.view(B, S, H, -1)
        scale = 1.0 / math.sqrt(q.shape[-1])
        scores = torch.einsum("blhe,bshe->bhls", q, k)
        A = torch.softmax(scale * scores, dim=-1)
        out = torch.einsum("bhls,bshd->blhd", A, v)
        out = out.transpose(2, 1).contiguous().view(B, L, -1)  # mix=True
        return self.out_projection(out)


def test_hopfield_parity_with_torch():
    torch.manual_seed(0)
    tm = TorchHopfield(16, 2).eval()
    params = {
        name: {
            "weight": jnp.asarray(getattr(tm, name).weight.detach().numpy()),
            "bias": jnp.asarray(getattr(tm, name).bias.detach().numpy()),
        }
        for name in ["query_projection", "key_projection", "value_projection", "out_projection"]
    }
    rs = np.random.RandomState(0)
    qx = rs.randn(2, 5, 16).astype(np.float32)
    kx = rs.randn(2, 7, 16).astype(np.float32)
    ours = hopfield(params, CFG, jnp.asarray(qx), jnp.asarray(kx), jnp.asarray(kx))
    with torch.no_grad():
        ref = tm(torch.tensor(qx), torch.tensor(kx), torch.tensor(kx)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["entmax", "softmax1", "softmax", "sparsemax", "clip", "clip_softmax1"])
def test_forward_all_modes(mode):
    cfg = STanHopConfig(**{**CFG.__dict__, "mode": mode})
    params = init_stanhop_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, cfg.in_len, cfg.data_dim), jnp.float32)
    out = stanhop_forward(params, cfg, x)
    assert out.shape == (2, cfg.out_len, cfg.data_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_unaligned_in_len_padding_and_baseline():
    cfg = STanHopConfig(
        data_dim=2, in_len=20, out_len=10, seg_len=6, win_size=2,
        factor=3, d_model=16, d_ff=32, n_heads=2, e_layers=2, baseline=True,
        mode="softmax1",
    )
    assert cfg.pad_in_len == 24 and cfg.in_seg_num == 4
    assert cfg.pad_out_len == 12 and cfg.out_seg_num == 2
    params = init_stanhop_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 20, 2), jnp.float32)
    out = stanhop_forward(params, cfg, x)
    assert out.shape == (2, 10, 2)


def test_jit_and_grad():
    params = init_stanhop_params(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(np.random.RandomState(0).randn(2, CFG.in_len, CFG.data_dim), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(2, CFG.out_len, CFG.data_dim), jnp.float32)

    @jax.jit
    def loss(p):
        return jnp.mean((stanhop_forward(p, CFG, x) - y) ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0
    # learnable entmax alpha gets a gradient in entmax mode
    cfg2 = STanHopConfig(**{**CFG.__dict__, "mode": "entmax"})
    p2 = init_stanhop_params(jax.random.PRNGKey(0), cfg2)

    def loss2(p):
        return jnp.mean((stanhop_forward(p, cfg2, x) - y) ** 2)

    g2 = jax.grad(loss2)(p2)
    pa = g2["encoder"][0]["sthm"]["cross_time"]["pre_alpha"]
    assert float(jnp.abs(pa).sum()) >= 0  # present and finite
    assert np.isfinite(float(pa[0]))


def test_quantized_stanhop_pipeline():
    from outeffhop_tpu.quant import (
        QuantCtx, QuantizedModelConfig, ScopedQuantCtx,
        compute_weight_qparams, freeze_act_qparams, run_calibration,
    )

    cfg = STanHopConfig(**{**CFG.__dict__, "mode": "softmax1"})
    params = init_stanhop_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    batches = [jnp.asarray(rs.randn(2, cfg.in_len, cfg.data_dim), jnp.float32) for _ in range(3)]

    def fwd(x, q):
        return stanhop_forward(params, cfg, x, q=q)

    config = QuantizedModelConfig(est_num_batches=3)
    ctx = QuantCtx.discover(config)
    fwd(batches[0], ScopedQuantCtx(ctx, ""))
    assert any("cross_time" in k for k in ctx.discovered_weights)
    wq = compute_weight_qparams(ctx.discovered_weights, config)
    est = run_calibration(fwd, config, wq, batches)
    aq = freeze_act_qparams(est, config)
    fp = fwd(batches[0], ScopedQuantCtx(None, ""))
    q8 = fwd(batches[0], ScopedQuantCtx(QuantCtx.run(config, wq, aq), ""))
    rel = float(jnp.linalg.norm(q8 - fp) / jnp.linalg.norm(fp))
    assert 0 < rel < 0.25


def test_telemetry_probes():
    from outeffhop_tpu.ops.telemetry import ProbeTape, ScopedTape

    params = init_stanhop_params(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(np.random.RandomState(0).randn(2, CFG.in_len, CFG.data_dim), jnp.float32)
    tape = ProbeTape()
    stanhop_forward(params, CFG, x, tape=ScopedTape(tape, ""))
    keys = list(tape.values)
    assert any("dec0" in k and "dec_out" in k for k in keys)
    assert any("attn_scores" in k for k in keys)


def test_mts_windows_border_arithmetic():
    data = synthetic_mts(n=1000, dim=3)
    in_len, out_len = 24, 12
    tr = MTSWindows(data, "train", in_len, out_len)
    va = MTSWindows(data, "val", in_len, out_len)
    te = MTSWindows(data, "test", in_len, out_len)
    # reference formulas (data_loader.py:37-47)
    train_num, test_num = int(1000 * 0.7), int(1000 * 0.2)
    val_num = 1000 - train_num - test_num
    assert len(tr.data) == train_num
    assert len(va.data) == val_num + in_len
    assert len(te.data) == test_num + in_len
    assert len(tr) == train_num - in_len - out_len + 1
    # scaler stats come from the train slice only
    np.testing.assert_allclose(tr.scaler.mean, data[:train_num].mean(0), rtol=1e-5)
    # scale_statistic round-trip (exp_stanhop.py:203-207 / eval_crossformer.py)
    te2 = MTSWindows(data, "test", in_len, out_len, scale_statistic=tr.scaler.statistic())
    np.testing.assert_allclose(te2.data, te.data, rtol=1e-5)
    # batching shapes
    xs, ys = next(tr.batches(16))
    assert xs.shape == (16, 24, 3) and ys.shape == (16, 12, 3)


def test_metrics_and_tools():
    from outeffhop_tpu.utils.train_tools import EarlyStopping, adjust_learning_rate

    pred = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    true = np.asarray([[1.5, 2.0], [2.0, 4.0]])
    m = metric(pred, true)
    np.testing.assert_allclose(m[0], np.mean(np.abs(pred - true)))
    np.testing.assert_allclose(m[2], np.sqrt(m[1]))

    es = EarlyStopping(patience=2)
    assert es.update(1.0) == (True, False)
    assert es.update(1.1) == (False, False)
    assert es.update(1.2) == (False, True)
    assert es.early_stop

    assert adjust_learning_rate(1.0, 1, "type1") == 1.0
    assert adjust_learning_rate(1.0, 2, "type1") == 0.5
    assert adjust_learning_rate(1.0, 3, "type1") == 0.5
    assert adjust_learning_rate(1.0, 10, "type1") == 0.5**5
    assert adjust_learning_rate(1.0, 5, "type2") == 0.5
    assert adjust_learning_rate(1.0, 7, "none") == 1.0


def test_hopfield_fused_self_attention_path_matches_unfused():
    """The `queries is keys` fast path (fused q+k matmul, kv = kh reuse) must
    match the generic path bit-for-bit-close; a COPY of the input defeats the
    identity checks and exercises the unfused path on identical numbers."""
    import jax
    import jax.numpy as jnp

    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, hopfield, hopfield_params,
    )

    import outeffhop_tpu.models.stanhop as sh

    cfg = STanHopConfig(data_dim=3, in_len=24, out_len=12, seg_len=6,
                        d_model=32, d_ff=64, n_heads=2, e_layers=1,
                        dropout=0.0, mode="softmax1")
    params = hopfield_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 32), jnp.float32)
    # flags default OFF (probe41 measured the trims slower e2e); force them
    # on here so the alternate paths stay numerically verified
    old = sh._FUSE_SELF_QK, sh._REUSE_KV
    try:
        sh._FUSE_SELF_QK = sh._REUSE_KV = True
        fused = hopfield(params, cfg, x, x, x)       # same object: fast path
    finally:
        sh._FUSE_SELF_QK, sh._REUSE_KV = old
    x2 = jnp.array(x, copy=True)
    x3 = jnp.array(x, copy=True)
    assert x2 is not x and x3 is not x2
    unfused = hopfield(params, cfg, x, x2, x3)       # distinct: generic path
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=2e-5, atol=2e-6)


def test_hopfield_pooling_shared_keys_path_matches_broadcast():
    """_POOL_SHARED_KEYS (default ON since the probe43 adjudication: +29%
    train / +18% infer on chip) projects the (1, factor, dm) prototype bank
    once and contracts 'blhe,she->bhls' against the shared bank; must match
    the reference broadcast-then-project formulation to fp tolerance — for
    the forward, the full model forward, AND the gradients (training runs
    through this path)."""
    import jax
    import jax.numpy as jnp

    import outeffhop_tpu.models.stanhop as sh
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, hopfield_params, hopfield_pooling,
        init_stanhop_params, stanhop_forward,
    )

    cfg = STanHopConfig(data_dim=3, in_len=24, out_len=12, seg_len=6,
                        d_model=32, d_ff=64, n_heads=2, e_layers=2,
                        factor=5, dropout=0.0, mode="softmax1")
    params = hopfield_params(jax.random.PRNGKey(1), cfg, pooling=True)
    x = jnp.asarray(np.random.RandomState(1).randn(6, 8, 32), jnp.float32)
    full_p = init_stanhop_params(jax.random.PRNGKey(2), cfg)
    seq = jnp.asarray(
        np.random.RandomState(2).randn(4, cfg.in_len, cfg.data_dim),
        jnp.float32,
    )
    tgt = jnp.asarray(
        np.random.RandomState(3).randn(4, cfg.out_len, cfg.data_dim),
        jnp.float32,
    )

    def pool_loss(p):
        return jnp.sum(hopfield_pooling(p, cfg, x) ** 2)

    def fwd_loss(p):
        return sh.mse_loss(stanhop_forward(p, cfg, seq), tgt)

    def run_all():
        return (
            hopfield_pooling(params, cfg, x),
            stanhop_forward(full_p, cfg, seq),
            jax.grad(pool_loss)(params),
            jax.grad(fwd_loss)(full_p),
        )

    old = sh._POOL_SHARED_KEYS
    try:
        sh._POOL_SHARED_KEYS = False
        base, base_fwd, base_g, base_gf = run_all()
        sh._POOL_SHARED_KEYS = True
        shared, shared_fwd, shared_g, shared_gf = run_all()
    finally:
        sh._POOL_SHARED_KEYS = old
    np.testing.assert_allclose(np.asarray(base), np.asarray(shared),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(base_fwd), np.asarray(shared_fwd),
                               rtol=1e-4, atol=1e-4)
    def assert_grads_close(a, b, rtol, what):
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves_with_path(b)
        assert len(la) == len(lb)
        for (pa, ga), (pb, gb) in zip(la, lb):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), rtol=rtol, atol=2e-5,
                err_msg=f"{what} grad mismatch at {jax.tree_util.keystr(pa)}")

    assert_grads_close(base_g, shared_g, 2e-4, "pool")
    assert_grads_close(base_gf, shared_gf, 5e-3, "full-model")


def test_pool_shared_keys_run_mode_quant_equivalence():
    """A frozen RUN-mode quant ctx (fake-quant and real-int8) takes the
    shared-bank pooling path; its outputs must match the broadcast
    formulation (row-wise elementwise quant ops are batch-independent).
    Calibration itself still uses the broadcast path for estimator parity."""
    import outeffhop_tpu.models.stanhop as sh
    from outeffhop_tpu.quant import (
        QuantCtx, QuantizedModelConfig, ScopedQuantCtx,
        compute_weight_qparams, freeze_act_qparams, run_calibration,
    )
    from outeffhop_tpu.quant.int8_exec import build_int8_dense_map

    cfg = STanHopConfig(**{**CFG.__dict__, "mode": "softmax1"})
    params = init_stanhop_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    batches = [jnp.asarray(rs.randn(2, cfg.in_len, cfg.data_dim), jnp.float32)
               for _ in range(2)]

    def fwd(x, q):
        return stanhop_forward(params, cfg, x, q=q)

    config = QuantizedModelConfig(est_num_batches=2)
    ctx = QuantCtx.discover(config)
    fwd(batches[0], ScopedQuantCtx(ctx, ""))
    wq = compute_weight_qparams(ctx.discovered_weights, config)
    est = run_calibration(fwd, config, wq, batches)
    aq = freeze_act_qparams(est, config)
    int8 = build_int8_dense_map(ctx.discovered_weights, wq)

    def run(shared, **kw):
        old = sh._POOL_SHARED_KEYS
        try:
            sh._POOL_SHARED_KEYS = shared
            q = ScopedQuantCtx(QuantCtx.run(config, wq, aq, **kw), "")
            return np.asarray(fwd(batches[0], q))
        finally:
            sh._POOL_SHARED_KEYS = old

    np.testing.assert_allclose(run(True), run(False), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        run(True, int8_dense=int8), run(False, int8_dense=int8),
        rtol=1e-4, atol=1e-5,
    )


def test_dec0_shared_sthm_equivalence():
    """_DEC0_SHARED_STHM computes decoder layer 0's STHM on one row of the
    batch-constant dec_pos input and broadcasts; the deterministic forward
    and its gradients must match the replicated formulation."""
    import outeffhop_tpu.models.stanhop as sh

    cfg = STanHopConfig(**{**CFG.__dict__, "mode": "softmax1"})
    params = init_stanhop_params(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(
        np.random.RandomState(4).randn(6, cfg.in_len, cfg.data_dim), jnp.float32
    )
    y = jnp.asarray(
        np.random.RandomState(5).randn(6, cfg.out_len, cfg.data_dim), jnp.float32
    )

    def loss(p):
        return sh.mse_loss(stanhop_forward(p, cfg, x), y)

    def run():
        return stanhop_forward(params, cfg, x), jax.grad(loss)(params)

    old = sh._DEC0_SHARED_STHM
    try:
        sh._DEC0_SHARED_STHM = False
        out_base, g_base = run()
        sh._DEC0_SHARED_STHM = True
        out_shared, g_shared = run()
    finally:
        sh._DEC0_SHARED_STHM = old
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_shared),
                               rtol=1e-4, atol=1e-5)
    la = jax.tree_util.tree_leaves_with_path(g_base)
    lb = jax.tree_util.tree_leaves_with_path(g_shared)
    assert len(la) == len(lb)
    for (pa, ga), (pb, gb) in zip(la, lb):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(pa))
    # non-deterministic forward must NOT take the shared path (rows diverge):
    # with dropout live and distinct rngs, outputs still differ across rows
    cfg_d = STanHopConfig(**{**cfg.__dict__, "dropout": 0.3})
    out_d = stanhop_forward(params, cfg_d, x,
                            dropout_rng=jax.random.PRNGKey(0),
                            deterministic=False)
    assert np.isfinite(np.asarray(out_d)).all()


def test_blockdiag_assoc_equivalence():
    """_BLOCKDIAG_ASSOC reformulates both association einsums as
    block-diagonal full-depth matmuls; forward and gradients must match the
    per-head einsum formulation (flag default off pending the probe48 chip
    measurement)."""
    import outeffhop_tpu.models.stanhop as sh

    cfg = STanHopConfig(**{**CFG.__dict__, "mode": "softmax1"})
    params = init_stanhop_params(jax.random.PRNGKey(6), cfg)
    x = jnp.asarray(
        np.random.RandomState(6).randn(4, cfg.in_len, cfg.data_dim), jnp.float32
    )
    y = jnp.asarray(
        np.random.RandomState(7).randn(4, cfg.out_len, cfg.data_dim), jnp.float32
    )

    def loss(p):
        return sh.mse_loss(stanhop_forward(p, cfg, x), y)

    old = sh._BLOCKDIAG_ASSOC
    try:
        sh._BLOCKDIAG_ASSOC = False
        out_base, g_base = stanhop_forward(params, cfg, x), jax.grad(loss)(params)
        sh._BLOCKDIAG_ASSOC = True
        out_bd, g_bd = stanhop_forward(params, cfg, x), jax.grad(loss)(params)
    finally:
        sh._BLOCKDIAG_ASSOC = old
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_bd),
                               rtol=1e-4, atol=1e-5)
    la = jax.tree_util.tree_leaves_with_path(g_base)
    lb = jax.tree_util.tree_leaves_with_path(g_bd)
    for (pa, ga), (pb, gb) in zip(la, lb):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(pa))
