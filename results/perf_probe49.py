"""Driver-round-5 probe #49: prompt-lookup speculative decoding throughput.

ServingEngine wall-clock tok/s (OPT-125m bf16, 8 slots, max_seq 512,
decode_chunk 16 — the tunnel-amortized serving setup), spec_k 0 vs 4, on a
repetition-heavy prompt set and a random set. Outputs are bit-identical by
construction (tested on CPU); this measures the throughput effect of
emitting 1..K+1 confirmed tokens per step vs always 1.
Cells: {plain,spec}_{rep,rand}
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def to_bf16(p):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
        p, is_leaf=lambda x: x is None,
    )


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "plain_rep"
    variant, wl = cell.split("_")
    # "specN_rep" selects spec_k=N (default 4); K+1=8 (spec_k=7) makes the
    # verify window exactly one 8-row sublane tile

    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving.engine import EngineConfig, ServingEngine

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "| cell:", cell, flush=True)
    if on_tpu:
        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)
        dtype = jnp.bfloat16
        n_req, plen, new_toks, max_seq, chunk = 16, 64, 192, 512, 16
    else:
        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0, vocab_size=256,
                        hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, ffn_dim=64,
                        max_position_embeddings=128)
        dtype = jnp.float32
        n_req, plen, new_toks, max_seq, chunk = 4, 12, 24, 96, 4
    params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)) if dtype == jnp.bfloat16
                     else init_opt_params(k, cfg))(jax.random.PRNGKey(0))

    rs = np.random.RandomState(7)
    prompts = []
    for i in range(n_req):
        if wl == "rep":
            period = 3 + (i % 5)
            pat = rs.randint(3, min(cfg.vocab_size, 5000), period)
            prompts.append(np.tile(pat, plen // period + 1)[:plen])
        else:
            prompts.append(rs.randint(3, min(cfg.vocab_size, 5000), plen))

    if variant.startswith("spec"):
        spec_k = int(variant[4:]) if len(variant) > 4 else 4
    else:
        spec_k = 0
    ecfg = EngineConfig(max_slots=8 if on_tpu else 2, max_seq=max_seq,
                        max_prompt=plen, eos_token_id=0, spec_k=spec_k)
    eng = ServingEngine(params, cfg, ecfg, dtype=dtype)
    rids = [eng.submit(p, max_new_tokens=new_toks) for p in prompts]
    # warm the programs on a first pass, then measure a fresh engine
    t0 = time.perf_counter()
    res = eng.run(decode_chunk=chunk)
    warm_s = time.perf_counter() - t0

    eng2 = ServingEngine(params, cfg, ecfg, dtype=dtype)
    eng2._decode_n = eng._decode_n     # reuse compiled programs
    eng2._prefill = eng._prefill
    rids = [eng2.submit(p, max_new_tokens=new_toks) for p in prompts]
    t0 = time.perf_counter()
    res = eng2.run(decode_chunk=chunk)
    dt = time.perf_counter() - t0
    assert set(res) == set(rids)
    toks = eng2.tokens_generated
    spec_rate = (eng2._spec_tokens / max(eng2._spec_slotsteps, 1)
                 if getattr(eng2, "_spec_slotsteps", 0) else 0.0)
    print(f"serving49_{cell}: {toks} tokens in {dt:.2f}s = "
          f"{toks/dt:,.0f} tok/s ({eng2._step_count} device steps; "
          f"warm pass {warm_s:.1f}s; spec_steps {eng2._spec_steps} "
          f"rate/slot {spec_rate:.3f} enabled {eng2._spec_enabled})",
          flush=True)


if __name__ == "__main__":
    main()
