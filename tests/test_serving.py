"""Continuous-batching serving engine: correctness vs the batch greedy path,
slot reuse, EOS/length termination, sampling modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.models.opt import OPTConfig, greedy_generate, init_opt_params
from outeffhop_tpu.serving import EngineConfig, ServingEngine


@pytest.fixture(scope="module")
def opt():
    cfg = OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, ffn_dim=64, max_position_embeddings=512,
        attn_softmax="softmax1", dropout=0.0,
    )
    params = init_opt_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_engine_matches_greedy_generate(opt):
    """More requests than slots; every output must equal the single-sequence
    greedy path (continuous batching is numerically transparent)."""
    cfg, params = opt
    ecfg = EngineConfig(max_slots=2, max_seq=48, max_prompt=16, eos_token_id=999)
    eng = ServingEngine(params, cfg, ecfg)
    prompts = [np.random.RandomState(i).randint(3, 120, 4 + i) for i in range(5)]
    rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    res = eng.run()
    assert sorted(res) == sorted(rids)
    for i, p in enumerate(prompts):
        ref = np.asarray(greedy_generate(params, cfg, jnp.asarray(p)[None, :], 6))[0]
        got = res[rids[i]]
        assert len(got) == len(p) + 6
        np.testing.assert_array_equal(got, ref[: len(got)])


def test_engine_eos_terminates_early(opt):
    cfg, params = opt
    prompt = np.random.RandomState(0).randint(3, 120, 6)
    # find what greedy produces, then make its first generated token the EOS
    ref = np.asarray(
        greedy_generate(params, cfg, jnp.asarray(prompt)[None, :], 4)
    )[0]
    eos = int(ref[len(prompt)])
    ecfg = EngineConfig(max_slots=1, max_seq=48, max_prompt=16, eos_token_id=eos)
    eng = ServingEngine(params, cfg, ecfg)
    rid = eng.submit(prompt, max_new_tokens=10)
    res = eng.run()
    # terminated right after the EOS token, not after 10
    assert len(res[rid]) == len(prompt) + 1
    assert res[rid][-1] == eos


def test_engine_max_seq_guard(opt):
    cfg, params = opt
    ecfg = EngineConfig(max_slots=1, max_seq=12, max_prompt=8, eos_token_id=999)
    eng = ServingEngine(params, cfg, ecfg)
    rid = eng.submit(np.arange(3, 9), max_new_tokens=50)
    res = eng.run()
    assert len(res[rid]) <= 12  # clamped by the slot capacity


def test_engine_rejects_oversized_prompt(opt):
    cfg, params = opt
    eng = ServingEngine(params, cfg, EngineConfig(max_prompt=8))
    with pytest.raises(ValueError):
        eng.submit(np.arange(20), max_new_tokens=4)


def test_engine_sampling_mode_runs(opt):
    cfg, params = opt
    ecfg = EngineConfig(
        max_slots=2, max_seq=32, max_prompt=8, eos_token_id=999,
        temperature=0.8, top_k=10,
    )
    eng = ServingEngine(params, cfg, ecfg)
    rids = [eng.submit(np.arange(3, 8), max_new_tokens=5) for _ in range(2)]
    res = eng.run()
    for r in rids:
        assert len(res[r]) == 10
        assert (res[r] >= 0).all() and (res[r] < cfg.vocab_size).all()


def test_engine_top_p_mode_runs(opt):
    cfg, params = opt
    ecfg = EngineConfig(
        max_slots=1, max_seq=24, max_prompt=8, eos_token_id=999,
        temperature=1.0, top_p=0.9,
    )
    eng = ServingEngine(params, cfg, ecfg)
    rid = eng.submit(np.arange(3, 8), max_new_tokens=5)
    res = eng.run()
    assert len(res[rid]) == 10
    assert (res[rid] >= 0).all() and (res[rid] < cfg.vocab_size).all()


def test_sample_top_p_masks_tail():
    """Nucleus cut: with a 4-token distribution [0.5, 0.3, 0.15, 0.05] and
    top_p=0.8, only the two most likely tokens are ever sampled (the kept
    prefix is the smallest with cumulative mass >= 0.8); top_p ~ 0 degrades
    to argmax-only; top_p=1.0 leaves every token reachable."""
    import jax
    import jax.numpy as jnp

    from outeffhop_tpu.serving.engine import _sample

    p = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.log(jnp.asarray(p, jnp.float32))[None, :].repeat(512, axis=0)
    rng = jax.random.PRNGKey(0)
    toks = np.asarray(_sample(logits, rng, 1.0, 0, 0.8))
    assert set(np.unique(toks)) <= {0, 1}
    assert {0, 1} <= set(np.unique(toks))  # both survivors reachable
    toks = np.asarray(_sample(logits, rng, 1.0, 0, 1e-6))
    assert set(np.unique(toks)) == {0}  # the top token always survives
    toks = np.asarray(_sample(logits, jax.random.PRNGKey(1), 1.0, 0, 1.0))
    assert set(np.unique(toks)) == {0, 1, 2, 3}
    # composes with top_k: k=3 then p=0.94 keeps exactly {0, 1, 2}
    toks = np.asarray(_sample(logits, rng, 1.0, 3, 0.94))
    assert set(np.unique(toks)) == {0, 1, 2}
    # top_p=0.0 exactly degrades to argmax-only (n_keep clamps to 1; the
    # -1 cutoff index must not wrap to the smallest logit)
    toks = np.asarray(_sample(logits, rng, 1.0, 0, 0.0))
    assert set(np.unique(toks)) == {0}


def test_engine_slot_reuse_interleaved(opt):
    """Late submissions are admitted as slots free — the scheduler stays busy
    until everything drains."""
    cfg, params = opt
    ecfg = EngineConfig(max_slots=1, max_seq=48, max_prompt=8, eos_token_id=999)
    eng = ServingEngine(params, cfg, ecfg)
    r1 = eng.submit(np.arange(3, 7), max_new_tokens=3)
    eng.step()  # admit r1
    r2 = eng.submit(np.arange(10, 15), max_new_tokens=3)
    res = eng.run()
    assert set(res) == {r1, r2}
    assert len(res[r1]) == 4 + 3
    assert len(res[r2]) == 5 + 3


def test_engine_chunked_decode_matches_greedy(opt):
    """decode_chunk>1 runs N steps per dispatch; outputs unchanged."""
    cfg, params = opt
    ecfg = EngineConfig(max_slots=2, max_seq=48, max_prompt=16, eos_token_id=999)
    eng = ServingEngine(params, cfg, ecfg)
    prompts = [np.random.RandomState(i).randint(3, 120, 5) for i in range(3)]
    rids = [eng.submit(p, max_new_tokens=7) for p in prompts]
    res = eng.run(decode_chunk=4)
    for i, p in enumerate(prompts):
        ref = np.asarray(greedy_generate(params, cfg, jnp.asarray(p)[None, :], 7))[0]
        got = res[rids[i]]
        assert len(got) == len(p) + 7  # budget respected despite chunk overshoot
        np.testing.assert_array_equal(got, ref[: len(got)])
    assert eng.tokens_generated == 3 * 7


def test_engine_int8_weights(opt):
    """int8_weights=True executes decode matmuls in int8; logits track the
    float engine closely enough that short greedy generations stay sane."""
    cfg, params = opt
    ecfg = EngineConfig(max_slots=2, max_seq=40, max_prompt=16, eos_token_id=999)
    eng8 = ServingEngine(params, cfg, ecfg, int8_weights=True)
    engf = ServingEngine(params, cfg, ecfg)
    p = np.random.RandomState(0).randint(3, 120, 6)
    r8 = eng8.submit(p, max_new_tokens=4)
    rf = engf.submit(p, max_new_tokens=4)
    out8 = eng8.run()[r8]
    outf = engf.run()[rf]
    assert out8.shape == outf.shape
    # prompt echoed identically; generated tokens in-vocab
    np.testing.assert_array_equal(out8[:6], outf[:6])
    assert (out8 >= 0).all() and (out8 < cfg.vocab_size).all()


def test_int8_weight_ctx_head_stays_float(opt):
    from outeffhop_tpu.serving.engine import make_int8_weight_ctx

    cfg, params = opt
    qctx = make_int8_weight_ctx(params, cfg)
    keys = list(qctx._ctx.int8_dense)
    # every transformer dense site frozen; head/embeddings absent
    assert any("q_proj" in k for k in keys)
    assert any("fc1" in k for k in keys)
    assert not any("head" in k for k in keys)
    assert not any("embed" in k for k in keys)
    assert qctx.act_sites_enabled is False


def test_engine_bucketed_decode_correct_across_boundary(opt):
    """Bucket growth (64 → 128) must not change outputs: run with max_seq big
    enough that lengths cross the first bucket boundary mid-generation."""
    cfg, params = opt
    ecfg = EngineConfig(max_slots=1, max_seq=160, max_prompt=64, eos_token_id=999)
    eng = ServingEngine(params, cfg, ecfg)
    prompt = np.random.RandomState(3).randint(3, 120, 60)  # 60 + 80 crosses 64 and 128
    rid = eng.submit(prompt, max_new_tokens=80)
    res = eng.run(decode_chunk=8)
    ref = np.asarray(greedy_generate(params, cfg, jnp.asarray(prompt)[None, :], 80))[0]
    np.testing.assert_array_equal(res[rid], ref[: len(res[rid])])
    # multiple bucket programs were actually compiled
    assert len({k[1] for k in eng._decode_n}) >= 2


def test_engine_chunked_decode_max_seq_cap_keeps_last_token(opt):
    """Regression (ADVICE r1, high): a slot capped at max_seq must not have
    its final generated token overwritten by pad during chunked decode —
    the token write used to run unconditionally for inactive slots, clamping
    the update index to max_seq-1."""
    cfg, params = opt
    ecfg = EngineConfig(max_slots=1, max_seq=12, max_prompt=8, eos_token_id=999)

    ref_eng = ServingEngine(params, cfg, ecfg)
    r_ref = ref_eng.submit(np.arange(3, 9), max_new_tokens=50)
    ref = ref_eng.run(decode_chunk=1)[r_ref]

    eng = ServingEngine(params, cfg, ecfg)
    rid = eng.submit(np.arange(3, 9), max_new_tokens=50)
    got = eng.run(decode_chunk=4)[rid]

    np.testing.assert_array_equal(got, ref)
    assert got[-1] != ecfg.pad_token_id


def test_quantize_kv_roundtrip_error():
    from outeffhop_tpu.models.opt import quantize_kv

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32) * 3)
    v = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32) * 3)
    q8 = quantize_kv(k, v)
    assert q8.k.dtype == jnp.int8 and q8.k_scale.shape == (2, 4, 8)
    deq = q8.k.astype(jnp.float32) * q8.k_scale[..., None]
    # symmetric per-token-per-head grid: error bounded by scale/2
    err = jnp.abs(deq - k)
    assert float(jnp.max(err - q8.k_scale[..., None] / 2)) < 1e-5


def test_int8kv_decode_matches_fp_attention(opt):
    """opt_attention's decode_fast path with an Int8KV past must match the
    same step with the exact fp past to int8-grid tolerance."""
    from outeffhop_tpu.models.opt import opt_attention, quantize_kv

    cfg, params = opt
    rng = np.random.RandomState(1)
    B, H, T, D = 2, cfg.num_attention_heads, 12, cfg.head_dim
    past_k = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    past_v = jnp.asarray(rng.randn(B, H, T, D).astype(np.float32))
    x = jnp.asarray(rng.randn(B, 1, cfg.hidden_size).astype(np.float32))
    lp = params["layers"][0]["attn"] if "attn" in params["layers"][0] else None
    if lp is None:
        lp = params["layers"][0]["self_attn"]
    mask = jnp.zeros((B, 1, 1, T + 1), jnp.float32)

    out_fp, _ = opt_attention(
        lp, cfg, x, mask, past_key_value=(past_k, past_v), decode_fast=True
    )
    out_q8, _ = opt_attention(
        lp, cfg, x, mask, past_key_value=quantize_kv(past_k, past_v),
        decode_fast=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_q8), np.asarray(out_fp), rtol=0, atol=3e-2
    )


def test_int8kv_multitoken_matches_dequantized(opt):
    """Since round 5 an Int8KV past also works on the multi-token
    continuation path (speculative verification, q_len = K+1) by up-front
    dequantization — must match the explicit float-past computation exactly
    (the per-token scales commute with the attention matmuls)."""
    from outeffhop_tpu.models.opt import opt_attention, quantize_kv

    cfg, params = opt
    lp = params["layers"][0].get("attn") or params["layers"][0]["self_attn"]
    rs = np.random.RandomState(3)
    kf = jnp.asarray(rs.randn(1, 2, 4, 16), jnp.float32)
    vf = jnp.asarray(rs.randn(1, 2, 4, 16), jnp.float32)
    past8 = quantize_kv(kf, vf)
    deq_k = past8.k.astype(jnp.float32) * past8.k_scale[..., None]
    deq_v = past8.v.astype(jnp.float32) * past8.v_scale[..., None]
    h = jnp.asarray(rs.randn(1, 3, 32), jnp.float32)
    out8, _ = opt_attention(lp, cfg, h, None, past_key_value=past8,
                            decode_fast=False)
    outf, _ = opt_attention(lp, cfg, h, None, past_key_value=(deq_k, deq_v),
                            decode_fast=False)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(outf),
                               rtol=1e-6, atol=1e-6)


def test_engine_kv_int8_matches_bf16_greedy(opt):
    """The int8-KV engine must reproduce the fp-cache engine's greedy outputs
    on a tiny model (per-token-per-head int8 K/V is far inside the decision
    margin of argmax here) across slot reuse and chunked decode."""
    cfg, params = opt
    prompts = [np.random.RandomState(10 + i).randint(3, 120, 5 + i) for i in range(4)]

    outs = {}
    for kv_int8 in (False, True):
        ecfg = EngineConfig(
            max_slots=2, max_seq=48, max_prompt=16, eos_token_id=999,
            kv_int8=kv_int8,
        )
        eng = ServingEngine(params, cfg, ecfg)
        rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
        res = eng.run(decode_chunk=3)
        outs[kv_int8] = [res[r] for r in rids]
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)


def test_engine_kv_int8_composes_with_int8_weights(opt):
    """kv_int8 (cache) and int8_weights (dense matmuls) are independent
    levers; composed they must still reproduce the bf16 engine's outputs on
    a tiny model."""
    cfg, params = opt
    prompts = [np.random.RandomState(20 + i).randint(3, 120, 4 + i) for i in range(3)]

    def run(kv_int8, int8_weights):
        ecfg = EngineConfig(max_slots=2, max_seq=40, max_prompt=16,
                            eos_token_id=999, kv_int8=kv_int8)
        eng = ServingEngine(params, cfg, ecfg, int8_weights=int8_weights)
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(False, False)
    both = run(True, True)
    for a, b in zip(base, both):
        np.testing.assert_array_equal(a, b)


def test_engine_tensor_parallel_matches_single_device(opt):
    """TP serving: a ('data','model') mesh with model=2 shards params
    Megatron-style and the KV pool head-parallel; greedy outputs must be
    IDENTICAL to the unsharded engine (collectives are exact for these
    reductions)."""
    from outeffhop_tpu.parallel.mesh import make_mesh

    cfg, params = opt
    prompts = [np.random.RandomState(30 + i).randint(3, 120, 4 + i) for i in range(4)]

    def run(mesh):
        ecfg = EngineConfig(max_slots=2, max_seq=40, max_prompt=16,
                            eos_token_id=999)
        eng = ServingEngine(params, cfg, ecfg, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(None)
    tp = run(make_mesh(n_model=2))
    for a, b in zip(base, tp):
        np.testing.assert_array_equal(a, b)


def test_engine_tensor_parallel_kv_int8(opt):
    """TP x int8-KV: the head-parallel scale pools and int8 caches compose
    with the mesh."""
    from outeffhop_tpu.parallel.mesh import make_mesh

    cfg, params = opt
    prompts = [np.random.RandomState(40 + i).randint(3, 120, 5) for i in range(3)]

    def run(mesh, kv_int8):
        ecfg = EngineConfig(max_slots=2, max_seq=40, max_prompt=16,
                            eos_token_id=999, kv_int8=kv_int8)
        eng = ServingEngine(params, cfg, ecfg, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(None, True)
    tp = run(make_mesh(n_model=2), True)
    for a, b in zip(base, tp):
        np.testing.assert_array_equal(a, b)


def test_engine_data_parallel_matches_single_device(opt):
    """dp serving (continuous batching across hosts): a ('data','model') mesh
    with data=4 shards the SLOT pool over the data axis; greedy outputs must
    be IDENTICAL to the unsharded engine (decode is slot-parallel — no
    cross-slot reductions exist to reorder)."""
    from outeffhop_tpu.parallel.mesh import make_mesh

    cfg, params = opt
    prompts = [np.random.RandomState(60 + i).randint(3, 120, 4 + i) for i in range(6)]

    def run(mesh):
        ecfg = EngineConfig(max_slots=4, max_seq=40, max_prompt=16,
                            eos_token_id=999)
        eng = ServingEngine(params, cfg, ecfg, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(None)
    dp = run(make_mesh(n_data=4, n_model=2))   # dp x tp composed
    for a, b in zip(base, dp):
        np.testing.assert_array_equal(a, b)
    dp_only = run(make_mesh(n_data=8, n_model=1))
    # 8 slots needed for data=8 to divide; max_slots=4 → slot axis skipped,
    # still must be correct (falls back to replicated pool)
    for a, b in zip(base, dp_only):
        np.testing.assert_array_equal(a, b)


def test_engine_data_parallel_kv_int8(opt):
    """dp x int8-KV: slot-sharded int8 caches + scale pools compose."""
    from outeffhop_tpu.parallel.mesh import make_mesh

    cfg, params = opt
    prompts = [np.random.RandomState(70 + i).randint(3, 120, 5) for i in range(4)]

    def run(mesh):
        ecfg = EngineConfig(max_slots=4, max_seq=40, max_prompt=16,
                            eos_token_id=999, kv_int8=True)
        eng = ServingEngine(params, cfg, ecfg, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=4) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(None)
    dp = run(make_mesh(n_data=4, n_model=2))
    for a, b in zip(base, dp):
        np.testing.assert_array_equal(a, b)


def test_kv_int8_auto_policy(opt):
    """kv_int8='auto' resolves per the measured probe22/22b regimes: off at
    the weight-bound shape (8 slots x 512), on when the pool dwarfs the
    weights; the engine runs correctly either way."""
    from outeffhop_tpu.serving.engine import EngineConfig, ServingEngine, resolve_kv_int8
    from outeffhop_tpu.models.opt import OPTConfig

    real = OPTConfig()  # OPT-125m shapes
    weight_bound = EngineConfig(max_slots=8, max_seq=512, kv_int8="auto")
    cache_bound = EngineConfig(max_slots=32, max_seq=65536, kv_int8="auto")
    assert resolve_kv_int8("auto", real, weight_bound, jnp.bfloat16) is False
    assert resolve_kv_int8("auto", real, cache_bound, jnp.bfloat16) is True
    assert resolve_kv_int8(True, real, weight_bound, jnp.bfloat16) is True

    cfg, params = opt
    ecfg = EngineConfig(max_slots=2, max_seq=40, max_prompt=16,
                        eos_token_id=999, kv_int8="auto")
    eng = ServingEngine(params, cfg, ecfg)
    assert isinstance(eng.ecfg.kv_int8, bool)
    rid = eng.submit(np.random.RandomState(80).randint(3, 120, 5),
                     max_new_tokens=4)
    res = eng.run()
    assert len(res[rid]) > 0


def test_spec_decode_bit_identical_and_accelerates(opt):
    """Prompt-lookup speculative decoding (spec_k): greedy outputs must be
    BIT-IDENTICAL to the plain engine (acceptance only confirms the model's
    own argmaxes), and on self-repetitive generations the scheduler must
    finish in fewer step() dispatches (speculation actually accepting)."""
    cfg, params = opt
    # mix: repetitive prompts (bigram structure to look up) + random ones
    reps = [np.tile([7, 11, 13], 4)[:10], np.tile([5, 9], 6)]
    rnds = [np.random.RandomState(90 + i).randint(3, 120, 6) for i in range(2)]
    prompts = reps + rnds

    def run(spec_k, chunk=1):
        ecfg = EngineConfig(max_slots=4, max_seq=64, max_prompt=16,
                            eos_token_id=999, spec_k=spec_k)
        eng = ServingEngine(params, cfg, ecfg)
        rids = [eng.submit(p, max_new_tokens=12) for p in prompts]
        res = eng.run(decode_chunk=chunk)
        return [res[r] for r in rids], eng._step_count

    base, base_steps = run(0)
    spec, spec_steps = run(4)
    for a, b in zip(base, spec):
        np.testing.assert_array_equal(a, b)
    # every step emits >= 1 token, so spec can never need MORE steps; a
    # model generating anything self-repetitive accepts some drafts
    assert spec_steps <= base_steps
    # chunked dispatch composes with speculation
    spec_c, _ = run(4, chunk=2)
    for a, b in zip(base, spec_c):
        np.testing.assert_array_equal(a, b)


def test_spec_decode_int8_kv_and_budget_cap(opt):
    """spec x int8-KV composes bit-identically (vs the plain int8-KV
    engine), and a slot hitting max_seq / its token budget is clamped
    exactly as in plain decoding."""
    cfg, params = opt
    prompts = [np.tile([3, 8, 21], 3)[:8],
               np.random.RandomState(95).randint(3, 120, 5)]

    def run(spec_k):
        ecfg = EngineConfig(max_slots=2, max_seq=24, max_prompt=12,
                            eos_token_id=999, kv_int8=True, spec_k=spec_k)
        eng = ServingEngine(params, cfg, ecfg)
        # large budget: the max_seq=24 cap binds first for the 8-token prompt
        rids = [eng.submit(p, max_new_tokens=30) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(0)
    spec = run(3)
    for a, b in zip(base, spec):
        np.testing.assert_array_equal(a, b)


def test_spec_decode_requires_greedy(opt):
    cfg, params = opt
    import pytest as _pytest
    with _pytest.raises(ValueError, match="greedy"):
        ServingEngine(params, cfg, EngineConfig(max_slots=2, max_seq=32,
                                                temperature=0.8, spec_k=4))


def test_spec_adaptive_fallback(opt):
    """With spec_min_rate set high, an engine on any workload must disable
    speculation after spec_min_steps (measured emitted/step < threshold) and
    still produce bit-identical outputs; with the fallback disabled
    (spec_min_rate <= 1.0) speculation stays on for the whole run."""
    cfg, params = opt
    prompts = [np.random.RandomState(110 + i).randint(3, 120, 6) for i in range(3)]

    def run(**kw):
        ecfg = EngineConfig(max_slots=3, max_seq=64, max_prompt=16,
                            eos_token_id=999, **kw)
        eng = ServingEngine(params, cfg, ecfg)
        rids = [eng.submit(p, max_new_tokens=20) for p in prompts]
        res = eng.run()
        return [res[r] for r in rids], eng

    base, _ = run(spec_k=0)
    # impossible rate -> must fall back quickly, outputs still identical
    forced, eng_f = run(spec_k=4, spec_min_rate=99.0, spec_min_steps=4)
    assert not eng_f._spec_enabled
    for a, b in zip(base, forced):
        np.testing.assert_array_equal(a, b)
    # the DEFAULT threshold is per-SLOT normalized (probe50 bug: a
    # multi-slot engine sums emissions across slots, so an un-normalized
    # rate could never trip). Whatever this toy model's acceptance turns
    # out to be, the final enabled flag must be consistent with the
    # measured per-slot rate, and outputs stay identical either way.
    dflt, eng_d = run(spec_k=4)
    if eng_d._spec_steps >= eng_d.ecfg.spec_min_steps:
        rate = eng_d._spec_tokens / max(eng_d._spec_slotsteps, 1)
        if not eng_d._spec_enabled:
            assert rate < eng_d.ecfg.spec_min_rate
        # per-slot normalizer sanity: slotsteps >= steps (>=1 live slot)
        assert eng_d._spec_slotsteps >= eng_d._spec_steps
    for a, b in zip(base, dflt):
        np.testing.assert_array_equal(a, b)
    # fallback disabled -> speculation stays on to the end
    keep, eng_k = run(spec_k=4, spec_min_rate=0.0)
    assert eng_k._spec_enabled
    for a, b in zip(base, keep):
        np.testing.assert_array_equal(a, b)


def test_spec_decode_on_dp_mesh(opt):
    """Speculation composes with the dp/tp-sharded slot pool: outputs stay
    bit-identical to the unsharded plain engine."""
    from outeffhop_tpu.parallel.mesh import make_mesh

    cfg, params = opt
    prompts = [np.tile([4, 9, 17], 4)[:9],
               np.random.RandomState(120).randint(3, 120, 6)]

    def run(mesh, spec_k):
        ecfg = EngineConfig(max_slots=4, max_seq=48, max_prompt=16,
                            eos_token_id=999, spec_k=spec_k)
        eng = ServingEngine(params, cfg, ecfg, mesh=mesh)
        rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
        res = eng.run(decode_chunk=2)
        return [res[r] for r in rids]

    base = run(None, 0)
    spec_dp = run(make_mesh(n_data=4, n_model=2), 4)
    for a, b in zip(base, spec_dp):
        np.testing.assert_array_equal(a, b)


def test_engine_stats_surface(opt):
    cfg, params = opt
    ecfg = EngineConfig(max_slots=2, max_seq=40, max_prompt=16,
                        eos_token_id=999, spec_k=3)
    eng = ServingEngine(params, cfg, ecfg)
    s0 = eng.stats()
    assert s0["tokens_generated"] == 0 and s0["slots_live"] == 0
    eng.submit(np.arange(3, 9), max_new_tokens=5)
    eng.run()
    s1 = eng.stats()
    assert s1["tokens_generated"] == 5
    assert s1["device_steps"] > 0 and s1["slots_total"] == 2
    assert 0.0 <= s1["spec_rate_per_slot"] < 10
    assert isinstance(s1["spec_enabled"], bool)


def test_pick_bucket_granularity(opt):
    """Buckets: pow2 up to 256, then 128-multiples (probe52: decode cost is
    ~proportional to bucket size; pow2 above 256 wasted up to 2x traffic)."""
    cfg, params = opt
    eng = ServingEngine(params, cfg, EngineConfig(max_slots=1, max_seq=2048,
                                                  max_prompt=8))
    for max_len, growth, want in [
        (0, 1, 64), (60, 4, 128), (120, 8, 256), (250, 8, 384),
        (321, 1, 384), (400, 16, 512), (600, 16, 640), (2040, 16, 2048),
    ]:
        eng._max_len = max_len
        assert eng._pick_bucket(growth) == want, (max_len, growth)
