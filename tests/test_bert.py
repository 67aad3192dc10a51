"""BERT model tests: HF parity on a tiny random model, attention extras,
end-to-end PTQ, and telemetry probes."""

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
from outeffhop_tpu.ops.telemetry import ProbeTape, ScopedTape
from outeffhop_tpu.quant import (
    QuantCtx,
    QuantizedModelConfig,
    ScopedQuantCtx,
    compute_weight_qparams,
    freeze_act_qparams,
    run_calibration,
)
from outeffhop_tpu.utils.hf_convert import bert_params_from_state_dict, state_dict_to_numpy

TINY = BertConfig(
    vocab_size=128,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def make_batch(rng, cfg, b=2, t=16):
    ids = rng.integers(0, cfg.vocab_size, size=(b, t))
    mask = np.ones((b, t), np.int32)
    mask[:, -3:] = 0  # padding
    return jnp.asarray(ids, jnp.int32), jnp.asarray(mask)


@pytest.fixture(scope="module")
def hf_tiny():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForMaskedLM

    hf_cfg = HFBertConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        max_position_embeddings=TINY.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertForMaskedLM(hf_cfg).eval()
    return model


def test_hf_parity_vanilla_softmax(hf_tiny):
    """Our functional BERT must reproduce HF BertForMaskedLM logits exactly
    (same weights, vanilla softmax)."""
    import torch

    params = bert_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    rng = np.random.default_rng(0)
    ids, mask = make_batch(rng, TINY)
    with torch.no_grad():
        hf_out = hf_tiny(
            input_ids=torch.tensor(np.asarray(ids)),
            attention_mask=torch.tensor(np.asarray(mask)),
        ).logits.numpy()
    ours = np.asarray(bert_mlm_forward(params, TINY, ids, mask))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_softmax1_changes_outputs_sanely(hf_tiny):
    params = bert_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    cfg1 = TINY
    cfg2 = __import__("dataclasses").replace(TINY, attn_softmax="softmax1")
    rng = np.random.default_rng(1)
    ids, mask = make_batch(rng, TINY)
    a = np.asarray(bert_mlm_forward(params, cfg1, ids, mask))
    b = np.asarray(bert_mlm_forward(params, cfg2, ids, mask))
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-4  # actually different
    assert np.abs(a - b).max() < 50  # but not blown up


@pytest.mark.parametrize(
    "gate_type,kw",
    [
        ("unconditional_per_head", {}),
        ("conditional_per_head", {}),
        ("conditional_per_token", {}),
        ("conditional_per_token", {"attn_gate_mlp": True}),
        ("conditional_per_token", {"attn_gate_linear_all_features": True}),
    ],
)
def test_gated_attention_variants(gate_type, kw):
    import dataclasses

    cfg = dataclasses.replace(TINY, attn_gate_type=gate_type, attn_gate_init=0.25, **kw)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    ids, mask = make_batch(rng, cfg)
    out = np.asarray(bert_mlm_forward(params, cfg, ids, mask))
    assert np.isfinite(out).all()


def test_gate_init_bias_logit():
    """attn_gate_init=0.25 must set per-head gate bias to logit(0.25) so the
    initial gate prob is ~0.25 (bert_attention.py:150-153)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, attn_gate_type="conditional_per_head", attn_gate_init=0.25)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    b = np.asarray(params["layers"][0]["attention"]["gate"]["b"])
    np.testing.assert_allclose(1 / (1 + np.exp(-b)), 0.25, rtol=1e-5)


def test_skip_attn_returns_zero_context():
    import dataclasses

    cfg = dataclasses.replace(TINY, skip_attn=True)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids, mask = make_batch(np.random.default_rng(3), cfg)
    out = np.asarray(bert_mlm_forward(params, cfg, ids, mask))
    assert np.isfinite(out).all()


def test_probe_tape_collects_reference_probe_points():
    params = init_bert_params(jax.random.PRNGKey(0), TINY)
    ids, mask = make_batch(np.random.default_rng(4), TINY)
    tape = ProbeTape(enabled=True, mode="stats")
    bert_mlm_forward(params, TINY, ids, mask, tape=ScopedTape(tape, ""))
    keys = set(tape.values)
    # the reference's telemetry probe points (validate_mlm_config.py:501-540)
    assert "layer0.attention.attn_scores|inf_norm" in keys
    assert "layer0.attention.attn_probs_before_dropout|kurtosis" in keys
    assert "layer0.output.dense|inf_norm" in keys  # FFN output
    assert "layer1.output.ln_output|inf_norm" in keys


def test_mlm_loss_ignores_minus_100():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[1, -100, 2, -100]])
    loss = float(mlm_loss(logits, labels))
    np.testing.assert_allclose(loss, np.log(8), rtol=1e-5)


def test_bert_w8a8_ptq_end_to_end(hf_tiny):
    """Full PTQ: discover → calibrate (running_minmax EMA) → freeze → run.
    INT8 perplexity must stay close to FP (tiny random model, synthetic data)."""
    params = bert_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    rng = np.random.default_rng(5)
    batches = [make_batch(rng, TINY, b=2, t=16) for _ in range(4)]
    config = QuantizedModelConfig(est_num_batches=4)

    def fwd(batch, q):
        ids, mask = batch
        return bert_mlm_forward(params, TINY, ids, mask, q=q)

    ctx = QuantCtx.discover(config)
    fwd(batches[0], ScopedQuantCtx(ctx, ""))
    # site sanity: embeddings, qkv, scores/probs/context, res, ln sites exist
    wnames = set(ctx.discovered_weights)
    anames = set(ctx.discovered_acts)
    assert "embeddings.word|w" in wnames
    assert "layer0.attention.query|w" in wnames
    assert "layer0.attention.attn_scores|a" in anames
    assert "layer0.attention.attn_probs|a" in anames
    assert "layer0.attention.context|a" in anames
    assert "layer0.attention_output.res|a" in anames
    assert "layer0.output.ln|a" in anames
    assert "embeddings.sum_pos|a" in anames
    # head must NOT have sites (always-FP32 cls head)
    assert not any("head" in n for n in wnames | anames)

    wq = compute_weight_qparams(ctx.discovered_weights, config)
    est = run_calibration(fwd, config, wq, batches)
    aq = freeze_act_qparams(est, config)

    ids, mask = batches[0]
    labels = jnp.where(jnp.asarray(np.random.default_rng(6).random((2, 16)) < 0.15), ids, -100)
    logits_fp = bert_mlm_forward(params, TINY, ids, mask)
    run_ctx = ScopedQuantCtx(QuantCtx.run(config, wq, aq), "")
    logits_q = bert_mlm_forward(params, TINY, ids, mask, q=run_ctx)
    ppl_fp = float(jnp.exp(mlm_loss(logits_fp, labels)))
    ppl_q = float(jnp.exp(mlm_loss(logits_q, labels)))
    assert np.isfinite(ppl_q)
    # random tiny model: ppl ≈ vocab_size; INT8 should be within a few percent
    assert abs(ppl_q - ppl_fp) / ppl_fp < 0.10, (ppl_fp, ppl_q)


def test_decomposed_ln_flags():
    import dataclasses

    cfg = dataclasses.replace(
        TINY, layer_norm_embd=True, layer_norm_res_self_output=True, layer_norm_res_output=True
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    batches = [make_batch(np.random.default_rng(7), cfg) for _ in range(2)]
    config = QuantizedModelConfig(est_num_batches=2)

    def fwd(batch, q):
        ids, mask = batch
        return bert_mlm_forward(params, cfg, ids, mask, q=q)

    ctx = QuantCtx.discover(config)
    fwd(batches[0], ScopedQuantCtx(ctx, ""))
    assert any(n.endswith("|ln_unary") for n in ctx.discovered_acts)
    wq = compute_weight_qparams(ctx.discovered_weights, config)
    est = run_calibration(fwd, config, wq, batches)
    aq = freeze_act_qparams(est, config)
    ids, mask = batches[0]
    out = bert_mlm_forward(
        params, cfg, ids, mask, q=ScopedQuantCtx(QuantCtx.run(config, wq, aq), "")
    )
    assert np.isfinite(np.asarray(out)).all()


def test_relative_position_attention_modes():
    """relative_key / relative_key_query score terms
    (bert_attention.py:224-263): run, differ from absolute, grads finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from outeffhop_tpu.ops.attention import (
        AttentionExtrasConfig,
        attention_extras_params,
        attention_with_extras,
    )

    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 10, 32)), jnp.float32)
    outs = {}
    for mode in ("absolute", "relative_key", "relative_key_query"):
        cfg = AttentionExtrasConfig(
            hidden_size=32, num_heads=4, softmax="softmax1",
            position_embedding_type=mode, max_position_embeddings=16,
        )
        params = attention_extras_params(jax.random.PRNGKey(0), cfg)
        if mode != "absolute":
            assert "distance_embedding" in params
        out, _, _ = attention_with_extras(params, cfg, x, None)
        outs[mode] = out
        g = jax.grad(lambda p: attention_with_extras(p, cfg, x, None)[0].sum())(params)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
    assert not np.allclose(np.asarray(outs["absolute"]), np.asarray(outs["relative_key"]))
    assert not np.allclose(
        np.asarray(outs["relative_key"]), np.asarray(outs["relative_key_query"])
    )


def test_bert_pooler_and_model_forward():
    """bert_model_forward returns (sequence_output, pooled); the pooler is
    dense+tanh on [CLS] (quantized_bert.py:684-703) with a foldable quant site."""
    import jax, jax.numpy as jnp, numpy as np
    from outeffhop_tpu.models.bert import (
        BertConfig, bert_model_forward, init_bert_params, init_bert_pooler_params,
    )
    from outeffhop_tpu.quant import QuantizedModelConfig, QuantCtx, ScopedQuantCtx

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    params["pooler"] = init_bert_pooler_params(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 8)), jnp.int32)
    seq, pooled = bert_model_forward(params, cfg, ids)
    assert seq.shape == (2, 8, 32) and pooled.shape == (2, 32)
    assert float(jnp.max(jnp.abs(pooled))) <= 1.0  # tanh range

    # without pooler params → pooled is None
    del params["pooler"]
    _, pooled_none = bert_model_forward(params, cfg, ids)
    assert pooled_none is None

    # the pooler dense is a discoverable quant site
    params["pooler"] = init_bert_pooler_params(jax.random.PRNGKey(1), cfg)
    ctx = QuantCtx.discover(QuantizedModelConfig())
    bert_model_forward(params, cfg, ids, q=ScopedQuantCtx(ctx, ""))
    assert any("pooler" in n for n in ctx.discovered_weights)


def test_embedding_matmul_backward_matches_scatter():
    """The one-hot-matmul embedding backward (models/common.py:_embed_lookup)
    must produce the same table gradient as jnp.take's scatter-add backward,
    including repeated ids."""
    import outeffhop_tpu.models.common as common

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(17, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 17, size=(3, 5)), jnp.int32)
    # repeated ids in one batch exercise the accumulate path
    ids = ids.at[0, :3].set(4)

    def loss_new(w):
        return jnp.sum(common._embed_lookup(w, ids) ** 2)

    def loss_ref(w):
        return jnp.sum(jnp.take(w, ids, axis=0) ** 2)

    g_new = jax.grad(loss_new)(w)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_embedding_backward_through_quant_ste():
    """The custom_vjp composes with the weight fake-quant STE: grads reach the
    original fp table."""
    from outeffhop_tpu.models import common

    w = jnp.linspace(-1.0, 1.0, 24, dtype=jnp.float32).reshape(12, 2)
    ids = jnp.asarray([[0, 3, 3, 7]], jnp.int32)

    def loss(w):
        return jnp.sum(common._embed_lookup(w, ids) * 2.0)

    g = jax.grad(loss)(w)
    assert np.asarray(g).shape == (12, 2)
    # row 3 appears twice -> gradient 2x of single-occurrence rows
    np.testing.assert_allclose(np.asarray(g)[3], [4.0, 4.0])
    np.testing.assert_allclose(np.asarray(g)[0], [2.0, 2.0])
    np.testing.assert_allclose(np.asarray(g)[1], [0.0, 0.0])
