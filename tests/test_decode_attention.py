"""Fused decode-attention kernel (ops/decode_attention.py) vs the jnp
reference and the engine's XLA decode path, in interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_reference,
)


def make_case(rng, s=3, h=4, b=40, d=16, int8=False, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(s, h, d)), dtype)
    k_new = jnp.asarray(rng.normal(size=(s, h, d)), dtype)
    v_new = jnp.asarray(rng.normal(size=(s, h, d)), dtype)
    lengths = rng.integers(1, b, size=(s,))
    mask = jnp.asarray(
        np.where(np.arange(b)[None, :] < lengths[:, None], 0.0, -1e30), jnp.float32
    )
    kf = rng.normal(size=(s, h, b, d)).astype(np.float32)
    vf = rng.normal(size=(s, h, b, d)).astype(np.float32)
    if int8:
        ks = np.abs(kf).max(-1) / 127.0 + 1e-8
        vs = np.abs(vf).max(-1) / 127.0 + 1e-8
        k = jnp.asarray(np.clip(np.round(kf / ks[..., None]), -127, 127), jnp.int8)
        v = jnp.asarray(np.clip(np.round(vf / vs[..., None]), -127, 127), jnp.int8)
        return q, k, v, k_new, v_new, mask, jnp.asarray(ks, jnp.float32), jnp.asarray(vs, jnp.float32)
    return q, jnp.asarray(kf, dtype), jnp.asarray(vf, dtype), k_new, v_new, mask, None, None


@pytest.mark.parametrize("n,clip,int8", [
    (1.0, None, False),
    (0.0, None, False),
    (1.0, None, True),
    (1.0, (-0.025, 1.1), False),
    (0.0, (-0.003, 1.0), True),
])
def test_decode_kernel_matches_reference(n, clip, int8):
    rng = np.random.default_rng(0)
    q, k, v, kn, vn, mask, ks, vs = make_case(rng, int8=int8)
    got = decode_attention(
        q, k, v, kn, vn, mask, ks, vs, softmax_n=n, clip=clip, interpret=True
    )
    want = decode_attention_reference(
        q, k, v, kn, vn, mask, ks, vs, softmax_n=n, clip=clip
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_kernel_fully_masked_slot_finite():
    """An inactive slot (every past position masked) must stay finite — only
    the fresh token (and the phantom key) receives probability."""
    rng = np.random.default_rng(1)
    q, k, v, kn, vn, mask, _, _ = make_case(rng, s=2)
    mask = jnp.full_like(mask, -1e30)
    got = np.asarray(decode_attention(q, k, v, kn, vn, mask, softmax_n=1.0,
                                      interpret=True))
    assert np.all(np.isfinite(got))


def test_opt_decode_fast_fused_matches_xla():
    """opt_forward(decode_fast=True, fused_decode=True) == the XLA decode
    path, bf16-cache and int8-cache, through the real model."""
    from tests.test_opt import TINY
    from outeffhop_tpu.models.opt import (
        init_opt_params, opt_forward, quantize_kv,
    )
    from jax.experimental.pallas import tpu as pltpu

    cfg = dataclasses.replace(TINY, attn_softmax="softmax1")
    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    b, past_len = 2, 24
    # build a real past by prefilling
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, past_len)), jnp.int32)
    _, past = opt_forward(params, cfg, ids, deterministic=True)
    cur = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 1)), jnp.int32)
    mask = jnp.ones((b, past_len + 1), jnp.int32)

    ref_logits, _ = opt_forward(
        params, cfg, cur, mask, past_key_values=past, decode_fast=True,
        deterministic=True,
    )
    with pltpu.force_tpu_interpret_mode():
        fused_logits, _ = opt_forward(
            params, cfg, cur, mask, past_key_values=past, decode_fast=True,
            fused_decode=True, deterministic=True,
        )
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4
    )

    past8 = [quantize_kv(k, v) for k, v in past]
    ref8, _ = opt_forward(
        params, cfg, cur, mask, past_key_values=past8, decode_fast=True,
        deterministic=True,
    )
    with pltpu.force_tpu_interpret_mode():
        fused8, _ = opt_forward(
            params, cfg, cur, mask, past_key_values=past8, decode_fast=True,
            fused_decode=True, deterministic=True,
        )
    np.testing.assert_allclose(
        np.asarray(fused8), np.asarray(ref8), rtol=1e-4, atol=1e-4
    )


def test_engine_fused_decode_matches_xla_decode():
    """Full serving engine: fused_decode=True produces the same generations
    as the XLA decode path (greedy, incl. int8 KV cache)."""
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving.engine import EngineConfig, ServingEngine
    from jax.experimental.pallas import tpu as pltpu

    cfg = OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
        dropout=0.0, attn_softmax="softmax1",
    )
    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    prompts = [np.arange(3, 9), np.arange(20, 26), np.array([5, 7])]

    def run(fused):
        ecfg = EngineConfig(
            max_slots=2, max_seq=48, max_prompt=16, fused_decode=fused,
        )
        eng = ServingEngine(params, cfg, ecfg)
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        if fused:
            with pltpu.force_tpu_interpret_mode():
                return eng.run(decode_chunk=2)
        return eng.run(decode_chunk=2)

    a = run(False)
    b = run(True)
    assert set(a) == set(b)
    for rid in a:
        np.testing.assert_array_equal(a[rid], b[rid])


def test_decode_attention_vmem_guard():
    """Big-cache blocks must fail fast on the host (probe22b: 32 slots x
    bucket 2048 exceeded Mosaic's 16 MB scoped-VMEM stack in the REMOTE
    compile with an opaque error) — the kernel raises with a pointer to the
    XLA decode path instead."""
    import jax.numpy as jnp
    import pytest

    from outeffhop_tpu.ops.decode_attention import decode_attention

    s, h, b, d = 2, 12, 2048, 64
    q = jnp.zeros((s, h, d), jnp.bfloat16)
    kc = jnp.zeros((s, h, b, d), jnp.bfloat16)
    kn = jnp.zeros((s, h, d), jnp.bfloat16)
    mask = jnp.zeros((s, b), jnp.float32)
    with pytest.raises(ValueError, match="fused_decode=False"):
        decode_attention(q, kc, kc, kn, kn, mask, interpret=True)
