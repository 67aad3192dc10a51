"""Mesh/sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 5).

Validates: (a) the tensor-parallel layout rules map onto BERT/OPT param trees;
(b) a full sharded MLM train step compiles + executes and matches the
single-device step numerically; (c) TP actually partitions weights (shard
shapes shrink along `model`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from outeffhop_tpu.models.bert import BertConfig, init_bert_params
from outeffhop_tpu.parallel import (
    make_mesh,
    make_adamw,
    make_mlm_train_step,
    param_pspecs,
    shard_params,
)
from outeffhop_tpu.parallel.mesh import batch_pspec
from outeffhop_tpu.parallel.train import init_train_state

CFG = BertConfig(
    vocab_size=512,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    attn_softmax="softmax1",
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _batch(bs=8, seq=32, vocab=512):
    rs = np.random.RandomState(0)
    return {
        "input_ids": jnp.asarray(rs.randint(0, vocab, (bs, seq)), jnp.int32),
        "attention_mask": jnp.ones((bs, seq), jnp.int32),
        "labels": jnp.asarray(
            np.where(rs.rand(bs, seq) < 0.15, rs.randint(0, vocab, (bs, seq)), -100),
            jnp.int32,
        ),
    }


def test_pspec_rules():
    params = init_bert_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(n_model=2)
    specs = param_pspecs(params, mesh)
    l0 = specs["layers"][0]
    assert l0["attention"]["query"]["weight"] == P("model", None)
    assert l0["attention_output"]["dense"]["weight"] == P(None, "model")
    assert l0["intermediate"]["weight"] == P("model", None)
    assert l0["output"]["dense"]["weight"] == P(None, "model")
    assert specs["embeddings"]["word"]["weight"] == P("model", None)
    assert specs["embeddings"]["ln"]["weight"] == P()


def test_tp_actually_partitions():
    mesh = make_mesh(n_model=2)
    params = init_bert_params(jax.random.PRNGKey(0), CFG)
    sharded = shard_params(params, mesh)
    w = sharded["layers"][0]["attention"]["query"]["weight"]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(CFG.hidden_size // 2, CFG.hidden_size)}


@pytest.mark.parametrize("n_model", [1, 2, 4])
def test_sharded_train_step_matches_single_device(n_model):
    params = init_bert_params(jax.random.PRNGKey(0), CFG)
    batch = _batch()

    # single-device reference
    tx = make_adamw(params, lr=1e-3, warmup_steps=2, total_steps=10)
    state0 = init_train_state(params, tx)
    step0 = make_mlm_train_step(CFG, tx)
    s_ref, loss_ref = step0(state0, batch, jax.random.PRNGKey(1))

    # sharded (fresh arrays: step0 donated its inputs)
    params = init_bert_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(n_model=n_model)
    sp = shard_params(params, mesh)
    tx2 = make_adamw(sp, lr=1e-3, warmup_steps=2, total_steps=10)
    state1 = init_train_state(sp, tx2)
    sharded_batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_pspec())), batch
    )
    step1 = make_mlm_train_step(CFG, tx2, mesh=mesh)
    s_new, loss = step1(state1, sharded_batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    w_ref = s_ref.params["layers"][0]["attention"]["query"]["weight"]
    w_new = s_new.params["layers"][0]["attention"]["query"]["weight"]
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_ref), atol=2e-5)


def test_clm_train_step_runs_sharded():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.parallel import make_clm_train_step

    cfg = OPTConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        ffn_dim=128,
        max_position_embeddings=64,
        dropout=0.0,
        attn_softmax="softmax1",
    )
    mesh = make_mesh(n_model=2)
    params = shard_params(init_opt_params(jax.random.PRNGKey(0), cfg), mesh)
    tx = make_adamw(params, lr=1e-3, betas=(0.9, 0.95), warmup_steps=2, total_steps=10,
                    final_lr_fraction=0.1, weight_decay=0.1)
    state = init_train_state(params, tx)
    batch = _batch()
    batch["labels"] = batch["input_ids"]
    batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_pspec())), batch
    )
    step = make_clm_train_step(cfg, tx, mesh=mesh)
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_dryrun_multichip_entry():
    import importlib
    import __graft_entry__ as ge

    importlib.reload(ge)
    ge.dryrun_multichip(8)


def test_schedule_stretch():
    from outeffhop_tpu.parallel.train import linear_schedule_with_stretch

    # eps=0: plain linear warmup/decay
    s = linear_schedule_with_stretch(1.0, 10, 100)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-7)
    # eps>0: hits lr*eps at total_steps (run_clm.py:470-480)
    s2 = linear_schedule_with_stretch(1.0, 10, 100, final_lr_fraction=0.1)
    np.testing.assert_allclose(float(s2(100)), 0.1, rtol=0.02)


def test_put_batch_shards_on_data_axis():
    import numpy as np
    from outeffhop_tpu.parallel.mesh import make_mesh, put_batch

    mesh = make_mesh(n_model=2)
    batch = {"input_ids": np.arange(32).reshape(8, 4), "labels": np.ones((8, 4))}
    out = put_batch(mesh, batch)
    assert out["input_ids"].shape == (8, 4)
    spec = out["input_ids"].sharding.spec
    assert spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(out["input_ids"]), batch["input_ids"])


def test_initialize_multihost_single_process_noop():
    from outeffhop_tpu.parallel.mesh import initialize_multihost

    # single-process environment: must not raise, must report False
    assert initialize_multihost() is False


def test_host_batch_slice_single_process():
    from outeffhop_tpu.parallel.mesh import host_batch_slice

    assert host_batch_slice(100) == slice(0, 100)


def test_make_adamw_scheduler_variants_and_inf_clip():
    """--lr_scheduler_type {linear,cosine,constant} and --grad_norm_type inf
    (reference args.py / torch clip_grad_norm_ norm_type parity)."""
    import jax
    import jax.numpy as jnp
    import optax
    import pytest

    from outeffhop_tpu.parallel.train import make_adamw

    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 100.0), "bias": jnp.full((4,), 100.0)}
    for sched in ("linear", "cosine", "constant"):
        tx = make_adamw(params, lr=1e-3, warmup_steps=2, total_steps=10,
                        scheduler=sched)
        st = tx.init(params)
        updates, _ = tx.update(grads, st, params)
        assert jnp.all(jnp.isfinite(updates["w"]))
    with pytest.raises(ValueError, match="scheduler"):
        make_adamw(params, scheduler="bogus")

    # inf-norm clip: max-abs of the clipped grads (before adam) == clip_norm
    from outeffhop_tpu.parallel.train import _clip_by_global_inf_norm
    clip = _clip_by_global_inf_norm(1.0)
    clipped, _ = clip.update(grads, clip.init(params))
    gmax = max(float(jnp.max(jnp.abs(v))) for v in jax.tree.leaves(clipped))
    assert abs(gmax - 1.0) < 1e-6
    with pytest.raises(ValueError, match="grad_norm_type"):
        make_adamw(params, grad_norm_type=3.0)


def test_prune_checkpoints(tmp_path):
    import os

    from outeffhop_tpu.utils.checkpoint import prune_checkpoints

    for i in (1, 5, 9, 13):
        os.makedirs(tmp_path / f"step_{i}")
    removed = prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(os.listdir(tmp_path))
    assert left == ["step_13", "step_9"], left
    assert len(removed) == 2


def test_remat_grads_match():
    """Per-layer jax.checkpoint (`--remat`) must not change the train-step
    math — grads with remat == grads without, for BERT and OPT (incl. the
    dropout-rng threading through checkpointed layer calls)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outeffhop_tpu.models.bert import (
        BertConfig, bert_mlm_forward, init_bert_params, mlm_loss,
    )
    from outeffhop_tpu.models.opt import (
        OPTConfig, clm_loss, init_opt_params, opt_forward,
    )

    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(3)

    bcfg = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      attn_softmax="softmax1")
    bp = init_bert_params(jax.random.PRNGKey(0), bcfg)
    ids = jnp.asarray(rs.randint(0, 128, (2, 16)), jnp.int32)
    labels = jnp.asarray(rs.randint(0, 128, (2, 16)), jnp.int32)

    def bloss(p, remat):
        logits = bert_mlm_forward(p, bcfg, ids, jnp.ones_like(ids),
                                  dropout_rng=rng, deterministic=False,
                                  remat=remat)
        return mlm_loss(logits, labels)

    g0 = jax.grad(lambda p: bloss(p, False))(bp)
    g1 = jax.grad(lambda p: bloss(p, True))(bp)
    g2 = jax.grad(lambda p: bloss(p, "dots"))(bp)
    def check(a, b):
        if a is None or b is None:
            assert a is None and b is None
        else:
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    jax.tree.map(check, g0, g1, is_leaf=lambda x: x is None)
    jax.tree.map(check, g0, g2, is_leaf=lambda x: x is None)

    ocfg = OPTConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, ffn_dim=64, attn_softmax="softmax1")
    op = init_opt_params(jax.random.PRNGKey(1), ocfg)

    def oloss(p, remat):
        logits, past = opt_forward(p, ocfg, ids, dropout_rng=rng,
                                   deterministic=False, remat=remat)
        if remat:
            assert all(x is None for x in past)  # no KV capture under remat
        return clm_loss(logits, labels)

    g0 = jax.grad(lambda p: oloss(p, False))(op)
    g1 = jax.grad(lambda p: oloss(p, "dots"))(op)
    def check(a, b):
        if a is None or b is None:
            assert a is None and b is None
        else:
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    jax.tree.map(check, g0, g1, is_leaf=lambda x: x is None)


def test_flat_adamw_matches_optax_chain():
    """flat_adamw (one-buffer clip+adamw, probe37) must reproduce
    optax.chain(clip_by_global_norm, adamw(mask=decay_mask)) step for step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params, mlm_loss
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    cfg = BertConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     attn_softmax="softmax1", hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, 96, (2, 8)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 96, (2, 8)), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    def run(mode, steps=3, norm_type=2.0, clip_norm=1.0):
        tx = make_adamw(params, lr=1e-3, warmup_steps=1, total_steps=10,
                        clip_norm=clip_norm, grad_norm_type=norm_type,
                        flat=(mode == "flat"), fused=(mode == "fused"))

        def loss_fn(p, bt, r):
            logits = bert_mlm_forward(p, cfg, bt["input_ids"],
                                      deterministic=True)
            return mlm_loss(logits, bt["labels"])

        step = _make_train_step(loss_fn, tx)
        state = init_train_state(params, tx)
        for _ in range(steps):
            state, loss = step(state, batch, rng)
        return state.params, loss

    for norm_type in (2.0, float("inf")):
        p_chain, l_chain = run("chain", norm_type=norm_type)
        for mode in ("flat", "fused"):
            p_alt, l_alt = run(mode, norm_type=norm_type)
            np.testing.assert_allclose(float(l_chain), float(l_alt), rtol=1e-6)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-7),
                p_chain, p_alt,
            )

    # unclipped path (fused's scale=None branch)
    p_chain, _ = run("chain", clip_norm=None)
    p_fused, _ = run("fused", clip_norm=None)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-7),
        p_chain, p_fused,
    )


def test_flat_adamw_weight_decay_mask():
    """Bias/LN leaves must not be weight-decayed by the flat optimizer:
    with zero grads, decayed leaves shrink and masked leaves stay exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from outeffhop_tpu.parallel.train import flat_adamw

    params = {
        "dense": {"weight": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "ln": {"weight": jnp.ones((4,)), "bias": jnp.zeros((4,))},
    }
    tx = flat_adamw(params, lambda c: 0.1, weight_decay=0.5)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    upd, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, upd)
    assert float(new["dense"]["weight"][0, 0]) < 1.0  # decayed
    np.testing.assert_allclose(new["dense"]["bias"], 1.0)  # masked
    np.testing.assert_allclose(new["ln"]["weight"], 1.0)  # masked
