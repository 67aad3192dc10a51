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
    kernel (probe12: XLA wins B32xT128 by ~2x) — and above it, it must.
    Causal shapes gate separately: XLA's causal attention wins through T=512
    (probe19 r4: 89.4 us vs 225.6 us packed at OPT B8xT512); the recurrence
    kernel wins at long T (probe11: 5.04x at T=4096)."""
    from outeffhop_tpu.ops.flash import pallas_attention_worthwhile

    assert not pallas_attention_worthwhile(32, 12, 128, 128)   # BERT headline
    assert not pallas_attention_worthwhile(32, 12, 192, 192)
    assert not pallas_attention_worthwhile(8, 12, 1, 512)      # decode step
    assert pallas_attention_worthwhile(32, 12, 256, 256)
    assert pallas_attention_worthwhile(64, 12, 200, 200)       # ViT-base B64
    assert pallas_attention_worthwhile(32, 12, 512, 512)
    # causal: OPT prefill T<=512 → XLA; long-seq recurrence regime → Pallas
    assert not pallas_attention_worthwhile(8, 12, 512, 512, causal=True)
    assert not pallas_attention_worthwhile(64, 12, 512, 512, causal=True)
    assert pallas_attention_worthwhile(2, 12, 2048, 2048, causal=True)
    assert pallas_attention_worthwhile(1, 12, 4096, 4096, causal=True)


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


# ---------------------------------------------------------------------------
# Round 4: fused clipped-softmax(_n) epilogue, custom_vjp backward, packed
# model routing (ViT/OPT), and the Mosaic singleton-broadcast regression.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,clip,causal,with_bias", [
    (0.0, (-0.025, 1.1), False, True),
    (1.0, (-0.003, 1.0), True, False),
    (0.0, (0.0, 1.03), True, True),
    (1.0, (-0.1, 1.1), False, False),
])
def test_clip_epilogue_matches_reference(n, clip, causal, with_bias):
    """clip(p*(eta-gamma)+gamma, 0, 1) fused into both one-pass kernels must
    match the reference clipped-softmax semantics (softmax.py:10-19)."""
    from outeffhop_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(20)
    q, k, v = make_qkv(rng, b=2, h=4, t_q=40, t_k=40, d=16)
    bias = None
    if with_bias:
        m = (rng.random((2, 40)) > 0.2).astype(np.float32)
        m[:, 0] = 1.0
        bias = jnp.asarray((1 - m)[:, None, None, :] * -1e9, jnp.float32)
    want = attention_reference(q, k, v, bias, softmax_n=n, causal=causal, clip=clip)
    got = flash(q, k, v, bias, softmax_n=n, causal=causal, clip=clip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    got_p = flash_attention_packed(
        _pack(q), _pack(k), _pack(v), bias, heads=4, softmax_n=n, causal=causal,
        clip=clip, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(_pack(want)), rtol=2e-5, atol=2e-5
    )


def test_fused_spec_matches_registry_callables():
    """The (softmax_n, clip) decomposition must reproduce every registry
    preset bit-for-bit (incl. the two reference name/param quirks)."""
    from outeffhop_tpu.ops.softmax_variants import (
        SOFTMAX_FUSED_PARAMS,
        SOFTMAX_MAPPING,
        fused_softmax_spec,
        softmax_n,
    )

    x = jnp.asarray(np.random.default_rng(21).normal(size=(3, 17)) * 4, jnp.float32)
    checked = 0
    for name, fn in SOFTMAX_MAPPING.items():
        spec = fused_softmax_spec(name)
        if name == "entmax":
            assert spec is None
            continue
        nval, clip = spec
        p = softmax_n(x, nval, axis=-1)
        if clip is not None:
            gamma, eta = clip
            p = jnp.clip(p * (eta - gamma) + gamma, 0.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(fn(x, axis=-1)), rtol=1e-6, atol=1e-6,
            err_msg=name,
        )
        checked += 1
    assert checked == len(SOFTMAX_FUSED_PARAMS) >= 30
    # alpha mode: gamma=-alpha/L, eta=1; alpha_softmax1 selects the n=1 core
    assert fused_softmax_spec("vanilla", alpha=0.5, max_seq_length=128) == (
        0.0, (-0.5 / 128, 1.0))
    assert fused_softmax_spec("x", alpha=0.5, max_seq_length=128,
                              alpha_softmax1=True) == (1.0, (-0.5 / 128, 1.0))


@pytest.mark.parametrize("n,clip,causal", [
    (1.0, None, False), (0.0, None, True), (1.0, (-0.025, 1.1), True),
])
def test_flash_grad_matches_reference(n, clip, causal):
    """custom_vjp: jax.grad through both kernels == grad of the jnp reference
    (VERDICT r3 #3: training must be able to use the fused forward)."""
    from outeffhop_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(22)
    q, k, v = make_qkv(rng, b=2, h=2, t_q=24, t_k=24, d=8)
    bias = jnp.asarray(
        (rng.random((2, 24)) > 0.15).astype(np.float32)[:, None, None, :] * 0.0
        + np.where(rng.random((2, 1, 1, 24)) > 0.15, 0.0, -1e9),
        jnp.float32,
    )

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash(q, k, v, bias, softmax_n=n, causal=causal, clip=clip) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            attention_reference(q, k, v, bias, softmax_n=n, causal=causal, clip=clip)
            ** 2
        )

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, nm in zip(g_f, g_r, "qkvb"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=nm
        )

    def loss_packed(qp, kp, vp):
        return jnp.sum(
            flash_attention_packed(
                qp, kp, vp, bias, heads=2, softmax_n=n, causal=causal, clip=clip,
                interpret=True,
            ) ** 2
        )

    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(_pack(q), _pack(k), _pack(v))
    for a, b, nm in zip(g_p, jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, bias), "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(_pack(b)), rtol=1e-4, atol=1e-5, err_msg=nm
        )


def test_bert_train_grad_with_flash_matches_xla(monkeypatch):
    """jax.grad through the full BERT forward with use_flash=True must equal
    the XLA path's gradients — the round-3 repo raised here (no VJP)."""
    from tests.test_bert import TINY, make_batch
    from outeffhop_tpu.models.bert import bert_mlm_forward, init_bert_params
    from outeffhop_tpu.ops import flash as flash_mod
    from jax.experimental.pallas import tpu as pltpu
    import dataclasses

    monkeypatch.setattr(flash_mod, "PALLAS_MIN_SCORE_ELEMS", 0)
    cfg = dataclasses.replace(TINY, attn_softmax="softmax1")
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids, mask = make_batch(np.random.default_rng(23), cfg)

    def loss(p, uf):
        return jnp.sum(bert_mlm_forward(p, cfg, ids, mask, use_flash=uf) ** 2)

    g_xla = jax.grad(loss)(params, False)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss)(params, True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
        ),
        g_xla, g_flash,
    )


def test_vit_packed_flash_path_matches_xla(monkeypatch):
    """ViT now routes through the PACKED kernel (round-3 probe14: the unpacked
    kernel + transposes was 22% slower e2e than XLA at ViT-base B64)."""
    from tests.test_vit import CFG, _images
    from outeffhop_tpu.models.vit import init_vit_params, vit_forward
    from outeffhop_tpu.ops import flash as flash_mod
    from jax.experimental.pallas import tpu as pltpu
    import dataclasses

    monkeypatch.setattr(flash_mod, "PALLAS_MIN_SCORE_ELEMS", 0)
    for softmax in ("softmax1", "clipped(-.025:1)"):
        cfg = dataclasses.replace(CFG, attn_softmax=softmax)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        imgs = _images()
        a = np.asarray(vit_forward(params, cfg, imgs, use_flash=False))
        with pltpu.force_tpu_interpret_mode():
            b = np.asarray(vit_forward(params, cfg, imgs, use_flash=True))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=softmax)


def test_opt_packed_flash_path_matches_xla(monkeypatch):
    """OPT prefill routes through the packed kernel (causal + padding bias);
    round 3's unpacked composition SIGABRT'd Mosaic on-chip (probe14)."""
    from tests.test_opt import TINY
    from outeffhop_tpu.models.opt import init_opt_params, opt_forward
    from outeffhop_tpu.ops import flash as flash_mod
    from jax.experimental.pallas import tpu as pltpu
    import dataclasses

    monkeypatch.setattr(flash_mod, "PALLAS_MIN_SCORE_ELEMS", 0)
    monkeypatch.setattr(flash_mod, "PALLAS_MIN_CAUSAL_T", 0)
    rng = np.random.default_rng(24)
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 40)), jnp.int32)
    mask = np.ones((2, 40), np.int32)
    mask[1, 30:] = 0  # padded tail
    mask = jnp.asarray(mask)
    for kwargs in (
        dict(attn_softmax="softmax1"),
        dict(attn_softmax="clippedsoftmax1(-.025:1)"),
        dict(attn_softmax="vanilla", alpha=0.5, max_seq_length=64),
    ):
        cfg = dataclasses.replace(TINY, **kwargs)
        params = init_opt_params(jax.random.PRNGKey(0), cfg)
        a = np.asarray(opt_forward(params, cfg, ids, mask, use_flash=False)[0])
        with pltpu.force_tpu_interpret_mode():
            b = np.asarray(opt_forward(params, cfg, ids, mask, use_flash=True)[0])
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-4, err_msg=str(kwargs)
        )


def test_kernel_masks_are_full_shape():
    """Regression for the round-3 on-chip Mosaic crash (probe14: `Check
    failed: limits[i] <= dim(i) (64 vs. 1)`): causal masks inside kernel
    bodies must be materialized at the score tile's FULL shape — a
    (1, t_q, t_k) mask broadcast through jnp.where crashes
    ApplyVectorLayout. `_causal_keep` is the single shared constructor."""
    from outeffhop_tpu.ops.flash import _causal_keep

    m = _causal_keep((4, 16, 24), causal_offset=8)
    assert m.shape == (4, 16, 24)  # full leading dim, no singleton broadcast
    want = np.arange(16)[:, None] + 8 >= np.arange(24)[None, :]
    np.testing.assert_array_equal(np.asarray(m[0]), want)
    np.testing.assert_array_equal(np.asarray(m[3]), want)


def test_kernel_bias_causal_fold_is_full_shape():
    """Regression for the round-4 on-chip Mosaic crash (probe23: `limits[i]
    <= dim(i) (64 vs. 1)` at bias+causal B8xT512 with scale=1.0 — models
    fold 1/sqrt(d) into q, eliding the multiply between the dot and the
    bias add, and the singleton-sublane broadcast add directly on the
    matmul output SIGABRTs ApplyVectorLayout; probe26 showed the identical
    call compiling with a real scale multiply in between). The kernels must
    apply ONE full-shape additive tensor built by `_bias_causal_fold`
    (bias folded onto the iota causal mask), and the fold flag stays on."""
    import jax

    from outeffhop_tpu.ops import flash as fm

    assert fm._FOLD_BIAS_INTO_MASK is True
    bias = jnp.arange(24, dtype=jnp.float32).reshape(1, 1, 24)
    bias = jnp.broadcast_to(bias, (4, 1, 24))

    # causal: mask and bias combine into one full-shape tensor
    add = fm._bias_causal_fold((4, 16, 24), bias, True, 8)
    assert add.shape == (4, 16, 24)
    keep = np.arange(16)[:, None] + 8 >= np.arange(24)[None, :]
    want = np.where(keep, np.arange(24)[None, :], fm.NEG_INF + np.arange(24)[None, :])
    np.testing.assert_allclose(np.asarray(add[2]), want, rtol=1e-6)

    # non-causal: bias broadcast to full shape (no singleton dims survive)
    add = fm._bias_causal_fold((4, 16, 24), bias, False, 0)
    assert add.shape == (4, 16, 24)
    np.testing.assert_array_equal(np.asarray(add[1, 7]), np.arange(24))

    # neither: no additive tensor at all
    assert fm._bias_causal_fold((4, 16, 24), None, False, 0) is None


@pytest.mark.parametrize("clip", [None, (-0.025, 1.1)])
def test_packed_bwd_bias_grad_matches_reference(clip):
    """The Pallas packed backward emits per-head-group dbias partials summed
    outside — check against the reference's bias cotangent (incl. the
    broadcast-(1,1,1,T) reduction)."""
    from outeffhop_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(30)
    q, k, v = make_qkv(rng, b=2, h=4, t_q=24, t_k=24, d=8)
    for lead in (2, 1):
        bias = jnp.asarray(rng.normal(size=(lead, 1, 1, 24)), jnp.float32)

        def loss_p(bias):
            return jnp.sum(
                flash_attention_packed(
                    _pack(q), _pack(k), _pack(v), bias, heads=4, softmax_n=1.0,
                    causal=True, clip=clip, interpret=True,
                ) ** 2
            )

        def loss_r(bias):
            return jnp.sum(
                attention_reference(q, k, v, bias, softmax_n=1.0, causal=True,
                                    clip=clip) ** 2
            )

        gp = jax.grad(loss_p)(bias)
        gr = jax.grad(loss_r)(bias)
        assert gp.shape == bias.shape and gp.dtype == bias.dtype
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-5,
            err_msg=f"lead={lead} clip={clip}",
        )


def test_packed_bwd_padded_seq_no_bias():
    """ViT's case: T not a multiple of 8 and NO primal bias — prep adds a
    synthetic padding-mask bias with no dbias output (the round-4 on-chip
    probe21 crash: kernel arity mismatch). Grads must match the reference."""
    from outeffhop_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(31)
    q, k, v = make_qkv(rng, b=2, h=4, t_q=37, t_k=37, d=16)

    def loss_p(qp):
        return jnp.sum(
            flash_attention_packed(
                qp, _pack(k), _pack(v), heads=4, softmax_n=1.0, interpret=True
            ) ** 2
        )

    def loss_r(qq):
        return jnp.sum(attention_reference(qq, k, v, softmax_n=1.0) ** 2)

    gp = jax.grad(loss_p)(_pack(q))
    gr = jax.grad(loss_r)(q)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(_pack(gr)), rtol=1e-4, atol=1e-5
    )


def test_packed_bwd_multi_head_group_dbias():
    """Regression for probe26b new_scale1_grad: with n_groups > 1 (h=12 d=64
    -> lane group 2, 6 groups) the dbias output block was (bb, 1, t_k) over
    a (b, 6, t_k) array — rejected by Mosaic's divisible-by-8-or-equal rule
    at TPU lowering (and invisible to CPU tests because only INPUT specs
    were validated). The sublane-padded (bb, 8, t_k) slab layout must give
    the same bias gradient as the jnp reference."""
    import jax

    from outeffhop_tpu.ops.flash import attention_reference, flash_attention_packed

    rng = np.random.default_rng(7)
    b, h, t, d = 2, 12, 64, 64
    q = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, 1, 1, t)), jnp.float32)

    def loss_pallas(bias):
        out = flash_attention_packed(
            q, k, v, bias, heads=h, softmax_n=1.0, scale=1.0, causal=True,
            interpret=True,
        )
        return jnp.sum(out * out)

    def unpack(x):
        return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

    def loss_ref(bias):
        out = attention_reference(
            unpack(q), unpack(k), unpack(v), bias, softmax_n=1.0, scale=1.0,
            causal=True,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
        return jnp.sum(out * out)

    g_pallas = jax.grad(loss_pallas)(bias)
    g_ref = jax.grad(loss_ref)(bias)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n,causal,with_bias,t_q,t_k", [
    (1.0, False, False, 1024, 1024),
    (1.0, False, True, 1024, 1024),
    (0.0, True, False, 1024, 1024),
    (1.0, True, True, 512, 2048),   # t_q != t_k: end-aligned causal offset
    (0.0, False, True, 512, 2048),
])
def test_flash_recurrence_grad_matches_reference(n, causal, with_bias, t_q, t_k):
    """Streaming Pallas backward on the RECURRENCE path (t_k > block_k, the
    only regime where causal dispatch selects Pallas, T >= 2048 — VERDICT r4
    weak #4: previously only an XLA recompute that re-materialized the full
    score tensor, and no grad test exercised T > block_k at all). Shapes are
    sized past the 2 MB short-path gate so the online-softmax kernel and the
    new dq/dkv streaming kernels actually run (interpret mode on CPU)."""
    from outeffhop_tpu.ops import flash as fl

    rng = np.random.default_rng(33)
    b, h, d = 1, 2, 32
    q, k, v = make_qkv(rng, b=b, h=h, t_q=t_q, t_k=t_k, d=d)
    bias = None
    if with_bias:
        bias = jnp.asarray(
            np.where(rng.random((b, 1, 1, t_k)) > 0.1, 0.0, -1e9), jnp.float32
        )

    opts = dict(softmax_n=n, causal=causal, block_q=512, block_k=512,
                interpret=True)
    # the geometry must actually select the recurrence path
    geo = fl._flash_geometry(t_q, t_k, fl._FlashOpts(
        softmax_n=n, scale=1.0, causal=causal, block_q=512, block_k=512))
    assert geo[-1] == "recurrence", geo

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, **opts) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            attention_reference(q, k, v, bias, softmax_n=n, causal=causal) ** 2
        )

    # forward parity first (the stats-emitting kernel must not change out)
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v, bias, **opts)),
        np.asarray(attention_reference(q, k, v, bias, softmax_n=n, causal=causal)),
        rtol=2e-4, atol=2e-4,
    )
    argnums = (0, 1, 2, 3) if with_bias else (0, 1, 2)
    g_f = jax.grad(loss_flash, argnums=argnums)(q, k, v, bias)
    g_r = jax.grad(loss_ref, argnums=argnums)(q, k, v, bias)
    for a, bb, nm in zip(g_f, g_r, "qkvb"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-3, err_msg=nm
        )
