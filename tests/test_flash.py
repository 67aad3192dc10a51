"""Pallas fused softmax_n flash attention vs the jnp reference, in interpreter
mode on CPU (SURVEY.md §4 item 6)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops.flash import attention_reference, flash_attention

flash = functools.partial(flash_attention, interpret=True)


def make_qkv(rng, b=2, h=2, t_q=32, t_k=32, d=16):
    q = jnp.asarray(rng.normal(size=(b, h, t_q, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t_k, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t_k, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("n", [0.0, 1.0, 4.0])
def test_flash_matches_reference_softmax_n(n):
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng)
    got = flash(q, k, v, softmax_n=n, block_q=16, block_k=16)
    want = attention_reference(q, k, v, softmax_n=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_softmax1_differs_from_vanilla():
    rng = np.random.default_rng(1)
    q, k, v = make_qkv(rng)
    a = np.asarray(flash(q, k, v, softmax_n=0.0))
    b = np.asarray(flash(q, k, v, softmax_n=1.0))
    assert np.abs(a - b).max() > 1e-3


def test_flash_with_padding_bias():
    rng = np.random.default_rng(2)
    q, k, v = make_qkv(rng, t_k=32)
    mask = np.ones((2, 1, 1, 32), np.float32)
    mask[:, :, :, -7:] = 0
    bias = jnp.asarray((1 - mask) * -1e9)
    got = flash(q, k, v, bias=bias, softmax_n=1.0, block_q=16, block_k=16)
    want = attention_reference(q, k, v, bias=bias, softmax_n=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_causal():
    rng = np.random.default_rng(3)
    q, k, v = make_qkv(rng, t_q=32, t_k=32)
    got = flash(q, k, v, causal=True, softmax_n=1.0, block_q=8, block_k=8)
    want = attention_reference(q, k, v, causal=True, softmax_n=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_unaligned_seq_len():
    """t not a multiple of the block size → wrapper pads and the padded keys
    must not contribute to the denominator."""
    rng = np.random.default_rng(4)
    q, k, v = make_qkv(rng, t_q=23, t_k=29)
    got = flash(q, k, v, softmax_n=1.0, block_q=16, block_k=16)
    want = attention_reference(q, k, v, softmax_n=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_large_logits_stable():
    """The +n zero-term must be shifted by the running max (softmax_1's
    signature stability property) even with huge logits."""
    rng = np.random.default_rng(5)
    q, k, v = make_qkv(rng, t_q=16, t_k=16, d=8)
    q = q * 40.0  # logits ~ hundreds
    got = np.asarray(flash(q, k, v, softmax_n=1.0, block_q=8, block_k=8))
    want = np.asarray(attention_reference(q, k, v, softmax_n=1.0))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_flash_all_masked_tail_row():
    """Rows whose keys are fully padded: softmax_1 sends all probability to the
    phantom key → output 0 (vanilla softmax would NaN)."""
    rng = np.random.default_rng(6)
    q, k, v = make_qkv(rng, t_q=8, t_k=16, d=8)
    bias = jnp.full((2, 1, 1, 16), -1e9, jnp.float32)  # everything masked
    got = np.asarray(flash(q, k, v, bias=bias, softmax_n=1.0, block_q=8, block_k=8))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_flash_bf16():
    rng = np.random.default_rng(7)
    q, k, v = make_qkv(rng)
    got = flash(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), softmax_n=1.0
    )
    want = attention_reference(q, k, v, softmax_n=1.0)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_flash_cross_attention_shapes():
    rng = np.random.default_rng(8)
    q, k, v = make_qkv(rng, t_q=16, t_k=48)
    got = flash(q, k, v, softmax_n=1.0, block_q=16, block_k=16)
    assert got.shape == (2, 2, 16, 16)
    want = attention_reference(q, k, v, softmax_n=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_bert_forward_with_flash_matches_xla_path():
    from tests.test_bert import TINY, make_batch
    from outeffhop_tpu.models.bert import bert_mlm_forward, init_bert_params
    import dataclasses

    cfg = dataclasses.replace(TINY, attn_softmax="softmax1")
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids, mask = make_batch(np.random.default_rng(9), cfg)
    from jax.experimental.pallas import tpu as pltpu

    a = np.asarray(bert_mlm_forward(params, cfg, ids, mask, use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        b = np.asarray(bert_mlm_forward(params, cfg, ids, mask, use_flash=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
