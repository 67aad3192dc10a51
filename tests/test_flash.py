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


def test_bert_forward_with_flash_matches_xla_path(monkeypatch):
    from tests.test_bert import TINY, make_batch
    from outeffhop_tpu.models.bert import bert_mlm_forward, init_bert_params
    from outeffhop_tpu.ops import flash as flash_mod
    import dataclasses

    # tiny shapes are below the measured XLA/Pallas crossover — force the
    # Pallas path so the kernel (not the XLA fallback) is what's compared
    monkeypatch.setattr(flash_mod, "PALLAS_MIN_SCORE_ELEMS", 0)

    cfg = dataclasses.replace(TINY, attn_softmax="softmax1")
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids, mask = make_batch(np.random.default_rng(9), cfg)
    from jax.experimental.pallas import tpu as pltpu

    a = np.asarray(bert_mlm_forward(params, cfg, ids, mask, use_flash=False))
    with pltpu.force_tpu_interpret_mode():
        b = np.asarray(bert_mlm_forward(params, cfg, ids, mask, use_flash=True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_short_shapes_auto_dispatch_to_xla():
    """Below the measured crossover the in-model path must NOT call a Pallas
    kernel (probe12: XLA wins B32xT128 by ~2x) — and above it, it must."""
    from outeffhop_tpu.ops.flash import pallas_attention_worthwhile

    assert not pallas_attention_worthwhile(32, 12, 128, 128)   # BERT headline
    assert not pallas_attention_worthwhile(32, 12, 192, 192)
    assert not pallas_attention_worthwhile(8, 12, 1, 512)      # decode step
    assert pallas_attention_worthwhile(32, 12, 256, 256)
    assert pallas_attention_worthwhile(64, 12, 200, 200)       # ViT-base B64
    assert pallas_attention_worthwhile(32, 12, 512, 512)


# ---------------------------------------------------------------------------
# Packed-layout kernel (flash_attention_packed): (B, T, H*D), no transposes
# ---------------------------------------------------------------------------


def _pack(x):  # (B,H,T,D) → (B,T,H*D)
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


@pytest.mark.parametrize("causal,with_bias,n", [
    (False, True, 1.0), (True, False, 1.0), (False, False, 0.0), (True, True, 0.0),
])
def test_packed_matches_reference(causal, with_bias, n):
    from outeffhop_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(10)
    q, k, v = make_qkv(rng, b=3, h=4, t_q=50, t_k=50, d=16)
    bias = None
    if with_bias:
        m = (rng.random((3, 50)) > 0.2).astype(np.float32)
        m[:, 0] = 1.0  # keep the causal diagonal's first key attendable
        bias = jnp.asarray((1 - m)[:, None, None, :] * -1e9, jnp.float32)
    got = flash_attention_packed(
        _pack(q), _pack(k), _pack(v), bias, heads=4, softmax_n=n, causal=causal,
        interpret=True,
    )
    want = _pack(attention_reference(q, k, v, bias, softmax_n=n, causal=causal))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_packed_rejects_long_sequences():
    from outeffhop_tpu.ops.flash import flash_attention_packed

    q = jnp.zeros((1, 2048, 64))
    with pytest.raises(ValueError, match="short-sequence"):
        flash_attention_packed(q, q, q, heads=4, interpret=True)


def test_bert_packed_flash_path_matches_xla(monkeypatch):
    """The in-model packed path (attention_with_extras dispatches to it for
    encoder self-attention) must match the unfused XLA path, including gating."""
    from tests.test_bert import TINY, make_batch
    from outeffhop_tpu.models.bert import bert_mlm_forward, init_bert_params
    from outeffhop_tpu.ops import flash as flash_mod
    from jax.experimental.pallas import tpu as pltpu
    import dataclasses

    monkeypatch.setattr(flash_mod, "PALLAS_MIN_SCORE_ELEMS", 0)

    for gate in ("none", "unconditional_per_head", "conditional_per_token"):
        cfg = dataclasses.replace(
            TINY, attn_softmax="softmax1", attn_gate_type=gate,
            attn_gate_init=0.25 if gate != "none" else None,
        )
        params = init_bert_params(jax.random.PRNGKey(0), cfg)
        ids, mask = make_batch(np.random.default_rng(11), cfg)
        a = np.asarray(bert_mlm_forward(params, cfg, ids, mask, use_flash=False))
        with pltpu.force_tpu_interpret_mode():
            b = np.asarray(bert_mlm_forward(params, cfg, ids, mask, use_flash=True))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=gate)


@pytest.mark.parametrize("n", [0.0, 1.0])
def test_softmax_n_heavily_masked_rows_finite(n):
    """Rows whose max logit is very negative (all keys masked) must not
    overflow exp(-m) to inf (NaN via 0*inf for n=0): the phantom zero logit
    participates in the max shift."""
    from outeffhop_tpu.ops.softmax_variants import softmax_n

    x = jnp.full((2, 8), -200.0)
    p = np.asarray(softmax_n(x, n, axis=-1))
    assert np.all(np.isfinite(p))
    if n == 0.0:
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
    else:
        assert np.all(p <= 1e-30)  # softmax1: everything goes to the phantom key


@pytest.mark.parametrize("n", [0.0, 1.0])
def test_flash_heavily_masked_rows_finite(n):
    from outeffhop_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(12)
    q, k, v = make_qkv(rng, b=1, h=2, t_q=16, t_k=16, d=8)
    bias = jnp.full((1, 1, 1, 16), -1e9, jnp.float32)  # every key masked
    got = np.asarray(flash(q, k, v, bias, softmax_n=n, block_q=8, block_k=8))
    assert np.all(np.isfinite(got))
    got_p = np.asarray(flash_attention_packed(
        _pack(q), _pack(k), _pack(v), bias, heads=2, softmax_n=n, interpret=True))
    assert np.all(np.isfinite(got_p))
