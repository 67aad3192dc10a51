"""Theory-verification suite tests: MHN energies, update rules, layers,
ViH models, and the experiment harness (reference theory_verification/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops.entmax import sparsemax
from outeffhop_tpu.theory import functions as F
from outeffhop_tpu.theory import layers as L
from outeffhop_tpu.theory import models as M
from outeffhop_tpu.theory import data as D


# ---------------------------------------------------------------------------
# functions.py parity
# ---------------------------------------------------------------------------


def _memory(dim=64, m=8, scale=2.0, seed=0):
    return jnp.asarray(D.synthetic_patterns(m, dim, seed=seed, scale=scale))


def test_mhn_energy_matches_formula():
    Xi = _memory(16, 4, 1.0)
    x = jnp.asarray(np.random.RandomState(1).normal(size=16), jnp.float32)
    beta = 2.0
    got = F.MHN_energy(Xi, x, beta=beta)
    # −logsumexp(β·Ξᵀx) + ½‖x‖² + log M + ½  (functions.py:102-105)
    expect = (
        -jax.nn.logsumexp(beta * Xi.T @ x) + 0.5 * x @ x + jnp.log(4.0) + 0.5
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_lmhn_energy_identity_kernel_equals_mhn():
    Xi = _memory(16, 4, 1.0)
    x = jnp.asarray(np.random.RandomState(2).normal(size=16), jnp.float32)
    np.testing.assert_allclose(
        F.LMHN_energy(Xi, x, jnp.eye(16)), F.MHN_energy(Xi, x), rtol=1e-6
    )


def test_energy_decreases_along_update_rule():
    """CCCP guarantee: one retrieval step never raises the MHN energy."""
    Xi = _memory(64, 8, 2.0)
    x0 = Xi[:, 0] + 0.3 * jnp.asarray(
        np.random.RandomState(3).normal(size=64), jnp.float32
    )
    e_prev = F.MHN_energy(Xi, x0)
    x = x0
    for _ in range(4):
        x = F.MHN_update_rule(Xi, x, beta=1.0, steps=1)
        e = F.MHN_energy(Xi, x)
        assert float(e) <= float(e_prev) + 1e-5
        e_prev = e


def test_update_rule_retrieves_stored_pattern():
    Xi = _memory(64, 8, 2.0)
    noisy = Xi[:, 0] + 0.05 * jnp.asarray(
        np.random.RandomState(4).normal(size=64), jnp.float32
    )
    out = F.MHN_update_rule(Xi, noisy, beta=1.0, steps=3)
    err = jnp.linalg.norm(out - Xi[:, 0]) / jnp.linalg.norm(Xi[:, 0])
    assert float(err) < 1e-3


def test_update_rule_scan_matches_python_loop():
    Xi = _memory(32, 6, 1.0)
    x = jnp.asarray(np.random.RandomState(5).normal(size=32), jnp.float32)
    loop = x
    for _ in range(3):
        loop = Xi @ (1.0 * jax.nn.softmax(Xi.T @ loop))
    np.testing.assert_allclose(
        F.MHN_update_rule(Xi, x, 1.0, 3), loop, rtol=1e-5, atol=1e-5
    )


def test_sparsemax_update_rule_retrieves_exactly():
    """Sparsemax retrieval reaches the pattern exactly (sparse one-hot)."""
    Xi = _memory(64, 8, 2.0)
    noisy = Xi[:, 2] + 0.05 * jnp.asarray(
        np.random.RandomState(6).normal(size=64), jnp.float32
    )
    out = F.MHN_update_rule(Xi, noisy, beta=1.0, steps=2, activation=sparsemax)
    np.testing.assert_allclose(out, Xi[:, 2], atol=1e-5)


def test_lmhn_update_identity_kernel_matches_mhn():
    Xi = _memory(32, 4, 1.0)
    x = jnp.asarray(np.random.RandomState(7).normal(size=32), jnp.float32)
    np.testing.assert_allclose(
        F.LMHN_update_rule(Xi, x, jnp.eye(32), 1.0, 2),
        F.MHN_update_rule(Xi, x, 1.0, 2),
        rtol=1e-5,
        atol=1e-5,
    )


def test_topk_softmax_zeroes_bottom_and_normalizes():
    x = jnp.arange(10.0)
    p = F.topk_softmax(x, 0.5)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    # bottom-5 logits were zeroed (not −inf): they still carry e^0 mass
    # relative to the kept top-5, matching functions.py:62-67 semantics.
    ref = jax.nn.softmax(jnp.concatenate([jnp.zeros(5), x[5:]]))
    np.testing.assert_allclose(p, ref, rtol=1e-6)


def test_random_mask_softmax_normalizes():
    x = jnp.asarray(np.random.RandomState(8).normal(size=(4, 16)), jnp.float32)
    p = F.random_mask_softmax(x, 0.5, jax.random.PRNGKey(0))
    np.testing.assert_allclose(p.sum(-1), np.ones(4), rtol=1e-6)


def test_distances():
    u = jnp.asarray(np.random.RandomState(9).normal(size=(8, 5)), jnp.float32)
    v = jnp.asarray(np.random.RandomState(10).normal(size=8), jnp.float32)
    np.testing.assert_allclose(
        F.manhattan_distance(u, v), np.abs(np.asarray(u) - np.asarray(v)[:, None]).sum(0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        F.l2_distance(u, v),
        np.sqrt(((np.asarray(u) - np.asarray(v)[:, None]) ** 2).sum(0)),
        rtol=1e-5,
    )


def test_uniform_loss_prefers_spread_points():
    clustered = jnp.ones((16, 8)) / jnp.sqrt(8.0)
    spread = jnp.asarray(np.random.RandomState(11).normal(size=(16, 8)), jnp.float32)
    spread = spread / jnp.linalg.norm(spread, axis=-1, keepdims=True)
    assert float(F.uniform_loss(spread)) < float(F.uniform_loss(clustered))


# ---------------------------------------------------------------------------
# layers.py
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hop_cfg():
    return L.HopfieldConfig(d_model=32, n_heads=4, update_steps=1, mode="softmax")


def test_hopfield_shapes_and_grads(hop_cfg):
    params = L.hopfield_params(jax.random.PRNGKey(0), hop_cfg)
    R = jnp.asarray(np.random.RandomState(0).normal(size=(2, 5, 32)), jnp.float32)
    Y = jnp.asarray(np.random.RandomState(1).normal(size=(2, 7, 32)), jnp.float32)
    out = L.hopfield(params, hop_cfg, R, Y)
    assert out.shape == (2, 5, 32)
    g = jax.grad(lambda p: L.hopfield(p, hop_cfg, R, Y).sum())(params)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(g)
    )


def test_hopfield_multi_step_runs(hop_cfg):
    import dataclasses

    cfg2 = dataclasses.replace(hop_cfg, update_steps=3)
    params = L.hopfield_params(jax.random.PRNGKey(0), cfg2)
    R = jnp.zeros((1, 4, 32))
    Y = jnp.asarray(np.random.RandomState(2).normal(size=(1, 6, 32)), jnp.float32)
    assert L.hopfield(params, cfg2, R, Y).shape == (1, 4, 32)


def test_hopfield_pooling_prototype_bank(hop_cfg):
    import dataclasses

    cfg = dataclasses.replace(hop_cfg, num_pattern=3)
    params = L.hopfield_pooling_params(jax.random.PRNGKey(0), cfg)
    assert params["query"].shape == (1, 3, 32)
    Y = jnp.asarray(np.random.RandomState(3).normal(size=(2, 9, 32)), jnp.float32)
    assert L.hopfield_pooling(params, cfg, Y).shape == (2, 3, 32)


def test_hopfield_layer_projection_free():
    cfg = L.HopfieldConfig(d_model=16, n_heads=1, mode="softmax1")
    R = jnp.asarray(np.random.RandomState(4).normal(size=(2, 3, 16)), jnp.float32)
    Y = jnp.asarray(np.random.RandomState(5).normal(size=(2, 6, 16)), jnp.float32)
    out = L.hopfield_layer(cfg, R, Y)
    assert out.shape == (2, 3, 16)
    # retrieval output is a convex-ish combination of memory rows (softmax1
    # leaks ≤1 mass to the phantom zero key, so norms are bounded by memory)
    assert float(jnp.abs(out).max()) <= float(jnp.abs(Y).max()) + 1e-5


def test_learnable_hopfield_and_uniform_forward(hop_cfg):
    params = L.learnable_hopfield_params(jax.random.PRNGKey(0), hop_cfg)
    R = jnp.asarray(np.random.RandomState(6).normal(size=(2, 4, 32)), jnp.float32)
    Y = jnp.asarray(np.random.RandomState(7).normal(size=(2, 8, 32)), jnp.float32)
    assert L.learnable_hopfield(params, hop_cfg, R, Y).shape == (2, 4, 32)
    phi = L.learnable_hopfield_uniform_forward(params, Y)
    assert phi.shape == Y.shape


def test_association_mask(hop_cfg):
    q = jnp.asarray(np.random.RandomState(8).normal(size=(1, 2, 4, 8)), jnp.float32)
    k = jnp.asarray(np.random.RandomState(9).normal(size=(1, 5, 4, 8)), jnp.float32)
    v = jnp.ones((1, 5, 4, 8))
    mask = jnp.asarray([[False, False, False, True, True]])
    out = L.association(hop_cfg, q, k, v, mask=mask)
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# models.py + experiment
# ---------------------------------------------------------------------------


def _vih_cfg(mode="MHN", activation="softmax1"):
    return M.ViHConfig(
        in_channels=3, patch_size=8, d_model=64, img_size=16, n_heads=4,
        n_class=5, mode=mode, activation=activation, n_layers=2,
    )


def test_three_layer_vih_forward_and_grads():
    cfg = _vih_cfg()
    params = M.three_layer_vih_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 3, 16, 16)), jnp.float32)
    logits = M.three_layer_vih_forward(params, cfg, x)
    assert logits.shape == (2, 5)
    g = jax.grad(
        lambda p: M.three_layer_vih_forward(p, cfg, x).sum()
    )(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_vih_umhn_kernel_forward():
    cfg = _vih_cfg(mode="UMHN")
    params = M.three_layer_vih_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).normal(size=(2, 3, 16, 16)), jnp.float32)
    outs = M.three_layer_vih_kernel_forward(params, cfg, x)
    assert len(outs) == cfg.n_layers
    assert outs[0].shape == (2, 1 + cfg.num_patches, cfg.d_model)


def test_vih_mhn_rejects_kernel_forward():
    cfg = _vih_cfg(mode="MHN")
    params = M.three_layer_vih_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        M.three_layer_vih_kernel_forward(params, cfg, jnp.zeros((1, 3, 16, 16)))


def test_single_layer_vih():
    cfg = _vih_cfg()
    params = M.vih_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(2).normal(size=(2, 3, 16, 16)), jnp.float32)
    assert M.vih_forward(params, cfg, x).shape == (2, 5)


def test_patch_embedding_layout():
    cfg = _vih_cfg()
    params = M.patch_embedding_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(3).normal(size=(2, 3, 16, 16)), jnp.float32)
    emb = M.patch_embedding(params, cfg, x)
    assert emb.shape == (2, 1 + 4, 64)  # 16/8=2 → 4 patches + cls


def test_experiment_learns_synthetic(tmp_path):
    """End-to-end: ViH + softmax1 retrieval beats chance on class-conditional
    Gaussian images within a few epochs (the plotting.py sweep in miniature)."""
    from outeffhop_tpu.theory.experiment import Exp, ExpArgs, save_logs_csv

    args = ExpArgs(
        batch_size=32, datasize=128, epoch=6, n_class=4, img_size=16,
        patch_size=8, d_model=32, n_heads=2, activation="softmax1",
        mode="MHN", out_dir=str(tmp_path),
    )
    log = Exp(args).run()
    assert max(log["test acc"]) > 0.3  # chance = 0.25
    save_logs_csv(str(tmp_path / "r.csv"), [log])
    assert (tmp_path / "r.csv").exists()
