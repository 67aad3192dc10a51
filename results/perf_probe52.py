"""Driver-round-5 probe #52: speculative-step PROGRAM cost decomposition.

probe49's wall-clock put the spec_k=4 verify step at ~1.6x a plain decode
step; weight-streaming theory says ~1.1-1.2x (both read the same weights
once; the K+1-wide window adds FLOPs, not bytes). Scan-slope the raw
programs (no host scheduler, no tunnel-dispatch noise):

  plain_step    make_decode_n-style body, 1 token/step
  spec_step     _spec_decode_body, K+1-window verify + K+1-row scatter

If spec_step >> 1.2x, the prime suspect is the K+1-row advanced-index
cache scatter defeating XLA's in-place-update analysis inside the scan
(the probe29/30 failure mode: silent whole-pool copies).
OPT-125m bf16, 8 slots, max_seq 512, lengths pinned mid-pool.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def to_bf16(p):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
        p, is_leaf=lambda x: x is None,
    )


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "plain_step"

    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving import engine as se

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "| cell:", cell, flush=True)
    if on_tpu:
        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)
        dtype = jnp.bfloat16
        slots, max_seq, K = 8, 512, 4
        n_lo, n_hi = 8, 32
    else:
        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0, vocab_size=256,
                        hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, ffn_dim=64,
                        max_position_embeddings=128)
        dtype = jnp.float32
        slots, max_seq, K = 2, 96, 3
        n_lo, n_hi = 2, 4
    params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)) if dtype == jnp.bfloat16
                     else init_opt_params(k, cfg))(jax.random.PRNGKey(0))
    ecfg = se.EngineConfig(max_slots=slots, max_seq=max_seq, max_prompt=64,
                           eos_token_id=0, spec_k=K)
    state = se.init_state(cfg, ecfg, dtype)
    rs = np.random.RandomState(0)
    # populate: mid-pool lengths, random tokens, active everywhere
    L0 = 64
    state = se.EngineState(
        cache_k=jnp.asarray(rs.randn(*state.cache_k.shape) * 0.1, dtype),
        cache_v=jnp.asarray(rs.randn(*state.cache_v.shape) * 0.1, dtype),
        tokens=jnp.asarray(rs.randint(3, 5000, (slots, max_seq)), jnp.int32),
        lengths=jnp.full((slots,), L0, jnp.int32),
        active=jnp.ones((slots,), bool),
        scale_k=None, scale_v=None,
    )
    # lengths grow inside the scan: cap iterations so len stays < max_seq
    # (plain +1/step, spec +<=K+1/step; hi=32 spec steps -> +160 < 512-64-1)
    bucket = max_seq

    if cell == "plain_step":
        def body(s, i):
            return se._decode_body(cfg, ecfg, params, s,
                                   jax.random.fold_in(jax.random.PRNGKey(1), i),
                                   None, bucket), None
    else:
        def body(s, i):
            return se._spec_decode_body(cfg, ecfg, params, s, None, bucket), None

    @functools.partial(jax.jit, static_argnames="iters", donate_argnums=(0,))
    def loop(s, iters):
        out, _ = jax.lax.scan(body, s, jnp.arange(iters))
        return out

    def best_of(iters):
        out = loop(jax.tree.map(jnp.copy, state), iters=iters)
        _sync(out.lengths)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(jax.tree.map(jnp.copy, state), iters=iters)
            _sync(out.lengths)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    per = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    print(f"serving52_{cell}: {per*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
