"""OPT model tests: HF parity, KV-cache decode, PTQ with fp32_head +
percentile calibration (the reference's north-star CLM config)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.models.opt import (
    OPTConfig,
    clm_loss,
    greedy_generate,
    init_opt_params,
    opt_forward,
)
from outeffhop_tpu.quant import (
    QuantCtx,
    QuantizedModelConfig,
    ScopedQuantCtx,
    compute_weight_qparams,
    freeze_act_qparams,
    run_calibration,
)
from outeffhop_tpu.utils.hf_convert import opt_params_from_state_dict, state_dict_to_numpy

TINY = OPTConfig(
    vocab_size=128,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    ffn_dim=64,
    max_position_embeddings=64,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def hf_tiny():
    torch = pytest.importorskip("torch")
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    hf_cfg = HFOPTConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        ffn_dim=TINY.ffn_dim,
        max_position_embeddings=TINY.max_position_embeddings,
        dropout=0.0,
        attention_dropout=0.0,
        activation_function="relu",
        do_layer_norm_before=True,
        word_embed_proj_dim=TINY.hidden_size,
    )
    torch.manual_seed(0)
    return OPTForCausalLM(hf_cfg).eval()


def make_batch(rng, b=2, t=16, pad=3):
    ids = rng.integers(4, TINY.vocab_size, size=(b, t))
    mask = np.ones((b, t), np.int32)
    if pad:
        mask[0, -pad:] = 0
    return jnp.asarray(ids, jnp.int32), jnp.asarray(mask)


def test_hf_parity(hf_tiny):
    import torch

    params = opt_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    ids, mask = make_batch(np.random.default_rng(0))
    with torch.no_grad():
        hf_logits = hf_tiny(
            input_ids=torch.tensor(np.asarray(ids)),
            attention_mask=torch.tensor(np.asarray(mask)),
        ).logits.numpy()
    ours, _ = opt_forward(params, TINY, ids, mask)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(hf_tiny):
    """Incremental decode with the KV cache must equal the full forward."""
    params = opt_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    ids, _ = make_batch(np.random.default_rng(1), b=1, t=8, pad=0)
    full_logits, _ = opt_forward(params, TINY, ids)

    # prefill on first 5 tokens, then decode 3 one at a time
    logits, past = opt_forward(params, TINY, ids[:, :5])
    outs = [logits]
    for i in range(5, 8):
        step_logits, past = opt_forward(
            params, TINY, ids[:, i : i + 1],
            jnp.ones((1, i + 1), jnp.int32), past_key_values=past,
        )
        outs.append(step_logits)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_greedy_generate(hf_tiny):
    import torch

    params = opt_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    ids = jnp.asarray(np.random.default_rng(2).integers(4, 128, size=(2, 6)), jnp.int32)
    ours = np.asarray(greedy_generate(params, TINY, ids, max_new_tokens=5))
    with torch.no_grad():
        hf = hf_tiny.generate(
            torch.tensor(np.asarray(ids)), max_new_tokens=5, do_sample=False,
            pad_token_id=1,
        ).numpy()
    np.testing.assert_array_equal(ours, hf)


def test_softmax1_and_gating_finite():
    cfg = dataclasses.replace(
        TINY, attn_softmax="softmax1", attn_gate_type="conditional_per_token"
    )
    from outeffhop_tpu.models.opt import init_opt_params

    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    ids, mask = make_batch(np.random.default_rng(3))
    logits, _ = opt_forward(params, cfg, ids, mask)
    assert np.isfinite(np.asarray(logits)).all()


def test_opt_ptq_fp32_head_percentile(hf_tiny):
    """The reference CLM INT8 recipe: quant_setup fp32_head, running_minmax
    acts with percentile 99.999, asymmetric_uniform, 4 est batches
    (README.md:131-160)."""
    params = opt_params_from_state_dict(state_dict_to_numpy(hf_tiny.state_dict()), TINY)
    rng = np.random.default_rng(4)
    batches = [make_batch(rng, pad=0) for _ in range(4)]
    config = QuantizedModelConfig(
        quant_setup="fp32_head", percentile=99.999, est_num_batches=4
    )

    def fwd(batch, q):
        ids, mask = batch
        return opt_forward(params, TINY, ids, mask, q=q)[0]

    ctx = QuantCtx.discover(config)
    fwd(batches[0], ScopedQuantCtx(ctx, ""))
    assert "layer0.self_attn.q_proj|w" in ctx.discovered_weights
    assert "layer0.self_attn.attn_scores|a" in ctx.discovered_acts
    assert "layer0.self_attn_res|a" in ctx.discovered_acts
    assert "layer0.ffn_res|a" in ctx.discovered_acts
    assert "embed_sum|a" in ctx.discovered_acts
    assert "head.lm|w" in ctx.discovered_weights

    wq = compute_weight_qparams(ctx.discovered_weights, config)
    assert wq["head.lm|w"] is None  # fp32 head
    est = run_calibration(fwd, config, wq, batches)
    aq = freeze_act_qparams(est, config)

    ids, mask = batches[0]
    logits_fp, _ = opt_forward(params, TINY, ids, mask)
    logits_q = fwd(batches[0], ScopedQuantCtx(QuantCtx.run(config, wq, aq), ""))
    ppl_fp = float(jnp.exp(clm_loss(logits_fp, ids)))
    ppl_q = float(jnp.exp(clm_loss(logits_q, ids)))
    assert np.isfinite(ppl_q)
    assert abs(ppl_q - ppl_fp) / ppl_fp < 0.15, (ppl_fp, ppl_q)


def test_int16_final_ln_policy():
    config = QuantizedModelConfig(quant_setup="fp32_head+int16_final_LN")
    # the decoder's final LN act site gets 16 bits, a layer LN keeps 8
    assert config.act_site("final_ln|ln_unary").n_bits == 16
    assert config.act_site("layer0.final_ln|ln_unary").n_bits == 16  # name contains final_ln
    assert config.act_site("layer0.self_attn_ln|ln_unary").n_bits == 8


def test_alpha_mode_uses_clipped_softmax():
    """Reference behavior: alpha mode → clipped_softmax (the `is "softmax1"`
    comparison at opt_attention.py:73 never fires)."""
    cfg = dataclasses.replace(TINY, alpha=12.0, max_seq_length=64)
    fn = cfg.softmax_fn()
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 8)).astype(np.float32))
    from outeffhop_tpu.ops import clipped_softmax

    np.testing.assert_allclose(
        np.asarray(fn(x, axis=-1)),
        np.asarray(clipped_softmax(x, gamma=-12.0 / 64, eta=1.0)),
    )
    cfg2 = dataclasses.replace(cfg, alpha_softmax1=True)
    from outeffhop_tpu.ops import clipped_softmax1

    np.testing.assert_allclose(
        np.asarray(cfg2.softmax_fn()(x, axis=-1)),
        np.asarray(clipped_softmax1(x, gamma=-12.0 / 64, eta=1.0)),
    )


def test_flash_and_decode_fast_mutually_exclusive():
    """Regression (ADVICE r1, medium): use_flash=True + decode_fast=True with
    a KV cache must NOT take the flash path (which would ignore the cache) —
    logits must match the plain cached-decode path exactly."""
    cfg = OPTConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, ffn_dim=64, max_position_embeddings=128,
        attn_softmax="softmax1", dropout=0.0,
    )
    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 3, 60)
    _, past = opt_forward(params, cfg, ids[:, :5])
    mask = jnp.ones((1, 6), jnp.int32)
    ref, _ = opt_forward(params, cfg, ids[:, 5:], mask, past_key_values=past,
                         decode_fast=True)
    got, _ = opt_forward(params, cfg, ids[:, 5:], mask, past_key_values=past,
                         decode_fast=True, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
