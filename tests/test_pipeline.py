"""GPipe pipeline parallelism (parallel/pipeline.py) on the virtual CPU
mesh — forward parity with the sequential encoder, differentiability, and
train-step parity (reference has no PP; SURVEY.md §2.8 optional item)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.models.bert import (
    BertConfig,
    bert_mlm_forward,
    init_bert_params,
    mlm_loss,
)
from outeffhop_tpu.parallel.pipeline import (
    bert_pipeline_mlm_forward,
    from_bert_pipeline_params,
    make_pipe_mesh,
    make_pipeline_mlm_train_step,
    stack_layer_params,
    to_bert_pipeline_params,
    unstack_layer_params,
)


def _cfg(n_layers=4):
    return BertConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=n_layers,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, attn_softmax="softmax1",
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    )


def _batch(cfg, b=8, t=16, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, t)), jnp.int32),
        "attention_mask": jnp.asarray(
            (rs.rand(b, t) > 0.1).astype(np.int32), jnp.int32
        ),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, t)), jnp.int32),
    }


def test_stack_unstack_roundtrip():
    cfg = _cfg()
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    stacked = stack_layer_params(params["layers"])
    back = unstack_layer_params(stacked, cfg.num_hidden_layers)
    for a, b in zip(params["layers"], back):
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(x, y), a, b)


@pytest.mark.parametrize("n_stages,n_micro", [(1, 2), (2, 2), (4, 4), (2, 1)])
def test_pipeline_forward_matches_sequential(n_stages, n_micro):
    cfg = _cfg(4)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    ref = bert_mlm_forward(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        deterministic=True,
    )
    mesh = make_pipe_mesh(n_stages, devices=jax.devices()[:n_stages])
    pparams = to_bert_pipeline_params(params, mesh)
    out = bert_pipeline_mlm_forward(
        pparams, cfg, batch["input_ids"], batch["attention_mask"],
        mesh, n_micro, deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_grad_matches_sequential():
    cfg = _cfg(4)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    mesh = make_pipe_mesh(2, devices=jax.devices()[:2])
    pparams = to_bert_pipeline_params(params, mesh)

    def loss_pipe(pp):
        logits = bert_pipeline_mlm_forward(
            pp, cfg, batch["input_ids"], batch["attention_mask"],
            mesh, 2, deterministic=True,
        )
        return mlm_loss(logits, batch["labels"])

    def loss_seq(p):
        logits = bert_mlm_forward(
            p, cfg, batch["input_ids"], batch["attention_mask"],
            deterministic=True,
        )
        return mlm_loss(logits, batch["labels"])

    g_pipe = jax.grad(loss_pipe)(pparams)
    g_seq = jax.grad(loss_seq)(params)
    g_pipe_unstacked = from_bert_pipeline_params(g_pipe, cfg.num_hidden_layers)

    def chk(a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)

    jax.tree.map(chk, g_pipe_unstacked["embeddings"], g_seq["embeddings"])
    jax.tree.map(chk, g_pipe_unstacked["head"], g_seq["head"])
    for lp, ls in zip(g_pipe_unstacked["layers"], g_seq["layers"]):
        jax.tree.map(chk, lp, ls)


def test_pipeline_train_step_matches_plain():
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    cfg = BertConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, attn_softmax="softmax1",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    mesh = make_pipe_mesh(2, devices=jax.devices()[:2])
    pparams = to_bert_pipeline_params(params, mesh)

    # NOTE: optimizer built over the STACKED tree (decay-mask paths still
    # resolve: bias/ln names are preserved under stacked_layers)
    tx_p = make_adamw(pparams, lr=1e-3, warmup_steps=1, total_steps=10)
    step_p = make_pipeline_mlm_train_step(cfg, tx_p, mesh, n_micro=2)
    state_p = init_train_state(pparams, tx_p)

    tx_s = make_adamw(params, lr=1e-3, warmup_steps=1, total_steps=10)

    def loss_fn(p, bt, r):
        logits = bert_mlm_forward(
            p, cfg, bt["input_ids"], bt["attention_mask"], deterministic=True
        )
        return mlm_loss(logits, bt["labels"])

    step_s = _make_train_step(loss_fn, tx_s)
    state_s = init_train_state(params, tx_s)

    rng = jax.random.PRNGKey(1)
    for _ in range(2):
        state_p, loss_p = step_p(state_p, batch, rng)
        state_s, loss_s = step_s(state_s, batch, rng)
    np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-5)
    got = from_bert_pipeline_params(state_p.params, cfg.num_hidden_layers)
    for lp, ls in zip(got["layers"], state_s.params["layers"]):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            lp, ls,
        )


@pytest.mark.parametrize("n_stages,n_data,n_micro", [(2, 2, 2), (2, 4, 2), (4, 2, 1)])
def test_pipeline_dp_pp_forward_matches_sequential(n_stages, n_data, n_micro):
    """dp×pp 2-D mesh: microbatches shard over 'data', stages over 'pipe'."""
    cfg = _cfg(4)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    ref = bert_mlm_forward(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        deterministic=True,
    )
    mesh = make_pipe_mesh(n_stages, n_data,
                          devices=jax.devices()[: n_stages * n_data])
    pparams = to_bert_pipeline_params(params, mesh)
    out = bert_pipeline_mlm_forward(
        pparams, cfg, batch["input_ids"], batch["attention_mask"],
        mesh, n_micro, deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_dp_pp_grads_match_sequential():
    cfg = _cfg(4)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    mesh = make_pipe_mesh(2, 2, devices=jax.devices()[:4])
    pparams = to_bert_pipeline_params(params, mesh)

    def loss_pipe(pp):
        logits = bert_pipeline_mlm_forward(
            pp, cfg, batch["input_ids"], batch["attention_mask"],
            mesh, 2, deterministic=True,
        )
        return mlm_loss(logits, batch["labels"])

    def loss_seq(p):
        logits = bert_mlm_forward(
            p, cfg, batch["input_ids"], batch["attention_mask"],
            deterministic=True,
        )
        return mlm_loss(logits, batch["labels"])

    g_pipe = from_bert_pipeline_params(
        jax.grad(loss_pipe)(pparams), cfg.num_hidden_layers
    )
    g_seq = jax.grad(loss_seq)(params)

    def chk(a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)

    jax.tree.map(chk, g_pipe["embeddings"], g_seq["embeddings"])
    # the head is the riskiest dp x pp transpose path: its cotangent is
    # psum'd over BOTH mesh axes (replicated in_spec under shard_map)
    jax.tree.map(chk, g_pipe["head"], g_seq["head"])
    for lp, ls in zip(g_pipe["layers"], g_seq["layers"]):
        jax.tree.map(chk, lp, ls)


def test_opt_pipeline_forward_matches_sequential():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward
    from outeffhop_tpu.parallel.pipeline import (
        opt_pipeline_forward, to_opt_pipeline_params,
    )

    cfg = OPTConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, ffn_dim=64, max_position_embeddings=64,
        attn_softmax="softmax1", dropout=0.0,
    )
    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, 96, (8, 16)), jnp.int32)
    amask = jnp.asarray(
        np.concatenate([np.ones((8, 12)), np.zeros((8, 4))], axis=1), jnp.int32
    )
    ref, _ = opt_forward(params, cfg, ids, amask, deterministic=True)
    mesh = make_pipe_mesh(2, devices=jax.devices()[:2])
    pparams = to_opt_pipeline_params(params, mesh)
    out = opt_pipeline_forward(pparams, cfg, ids, amask, mesh, 2,
                               deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_opt_pipeline_train_step_runs():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.parallel.pipeline import (
        make_pipeline_clm_train_step, to_opt_pipeline_params,
    )
    from outeffhop_tpu.parallel.train import init_train_state, make_adamw

    cfg = OPTConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, ffn_dim=64, max_position_embeddings=64,
        attn_softmax="softmax1", dropout=0.1,
    )
    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    mesh = make_pipe_mesh(2, devices=jax.devices()[:2])
    pparams = to_opt_pipeline_params(params, mesh)
    tx = make_adamw(pparams, lr=1e-3, warmup_steps=1, total_steps=10,
                    betas=(0.9, 0.95))
    step = make_pipeline_clm_train_step(cfg, tx, mesh, n_micro=2)
    state = init_train_state(pparams, tx)
    rs = np.random.RandomState(1)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, 96, (4, 16)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 96, (4, 16)), jnp.int32),
    }
    for _ in range(2):
        state, loss = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(state.step) == 2


def test_pipeline_dropout_runs_and_is_finite():
    cfg = _cfg(4)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    mesh = make_pipe_mesh(2, devices=jax.devices()[:2])
    pparams = to_bert_pipeline_params(params, mesh)
    out = bert_pipeline_mlm_forward(
        pparams, cfg, batch["input_ids"], batch["attention_mask"],
        mesh, 2, dropout_rng=jax.random.PRNGKey(5), deterministic=False,
    )
    assert bool(jnp.isfinite(out).all())


def test_vit_pipeline_forward_matches_sequential_and_grads():
    from outeffhop_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from outeffhop_tpu.parallel.pipeline import (
        to_vit_pipeline_params, vit_pipeline_forward,
    )

    cfg = ViTConfig(
        img_size=16, patch_size=4, embed_dim=32, depth=4, num_heads=2,
        mlp_ratio=2.0, num_classes=10, attn_softmax="softmax1", dropout=0.0,
        attn_dropout=0.0,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(8, 16, 16, 3), jnp.float32)
    ref = vit_forward(params, cfg, imgs, deterministic=True)
    mesh = make_pipe_mesh(2, 2, devices=jax.devices()[:4])
    pparams = to_vit_pipeline_params(params, mesh)
    out = vit_pipeline_forward(pparams, cfg, imgs, mesh, 2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss(pp):
        o = vit_pipeline_forward(pp, cfg, imgs, mesh, 2, deterministic=True)
        return jnp.mean(o ** 2)

    g = jax.grad(loss)(pparams)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_pipeline_remat_grads_match_no_remat():
    """remat=True (per-tick jax.checkpoint) must not change gradients."""
    cfg = _cfg(4)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    mesh = make_pipe_mesh(2, devices=jax.devices()[:2])
    pparams = to_bert_pipeline_params(params, mesh)

    def loss(pp, remat):
        logits = bert_pipeline_mlm_forward(
            pp, cfg, batch["input_ids"], batch["attention_mask"],
            mesh, 2, deterministic=True, remat=remat,
        )
        return mlm_loss(logits, batch["labels"])

    g0 = jax.grad(lambda pp: loss(pp, False))(pparams)
    g1 = jax.grad(lambda pp: loss(pp, True))(pparams)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7
        ),
        g0, g1,
    )
