"""Round-4 probe #22b: decode matrix in the CACHE-BOUND regime.

probe22 (8 slots, bucket 512) is weight-streaming-bound: 250 MB of OPT-125m
weights vs ~50 MB of cache per step, so halving cache traffic (int8 KV)
cannot show, and the fused kernel lost 2.6x to XLA. Here: 32 slots x bucket
2048 -> 4.8 GB of bf16 cache read per step vs the same 250 MB of weights
(cache is ~95% of traffic; bf16 roofline floor ~6.2 ms/step). If int8 KV's
convert fuses into the attention reads, it should approach 2x; if it
materializes a bf16 copy (round-3 probe17 diagnosis), it loses again.
"""

import time

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving.engine import EngineConfig, init_state, make_decode_n

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)

    @jax.jit
    def make_params(key):
        p = init_opt_params(key, cfg)
        return jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t is not None and t.dtype == jnp.float32
            else t,
            p, is_leaf=lambda t: t is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    slots, bucket = 32, 2048

    for fused in (False, True):
        for kv_int8 in (False, True):
            ecfg = EngineConfig(
                max_slots=slots, max_prompt=bucket, max_seq=bucket + 16,
                kv_int8=kv_int8, fused_decode=fused,
            )
            state = init_state(cfg, ecfg, dtype=jnp.bfloat16)
            fill = bucket - 8
            fresh = lambda s: s.__class__(
                cache_k=s.cache_k, cache_v=s.cache_v, tokens=s.tokens,
                lengths=jnp.full((slots,), fill, jnp.int32),
                active=jnp.ones((slots,), bool),
                scale_k=s.scale_k, scale_v=s.scale_v,
            )
            state = fresh(state)
            rng = jax.random.PRNGKey(0)

            def run(state, n_prog, reps):
                prog = make_decode_n(cfg, ecfg, n_prog, bucket=bucket)
                s = prog(params, state, rng)
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    s = prog(params, s, rng)
                    _sync(s.lengths)
                    best = min(best, time.perf_counter() - t0)
                return best, s

            t_lo, state = run(state, 4, 3)
            state = fresh(state)
            t_hi, state = run(state, 12, 3)
            per = max((t_hi - t_lo) / 8, 1e-9)
            print(
                f"decode fused={fused} kv_int8={kv_int8} slots={slots} "
                f"bucket={bucket}: {per*1e3:.2f} ms/step  {slots/per:,.0f} tok/s",
                flush=True,
            )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
