"""Round-4 probe #22: fused Pallas decode attention in the serving engine
(VERDICT r3 #4 adjudication of the INT8 KV cache).

Matrix: {XLA, fused} x {bf16 cache, int8 cache} decode step at bucket 512,
8 slots, OPT-125m — round-3 probe17 measured XLA+int8 at 3.29 ms vs XLA+bf16
2.34 ms (the int8->bf16 convert materializes). The fused kernel DMAs the
cache at its storage width and dequantizes in-register.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving.engine import (
        EngineConfig, init_state, make_decode_n,
    )

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

    for fused in (False, True):
        for kv_int8 in (False, True):
            ecfg = EngineConfig(
                max_slots=8, max_prompt=512, max_seq=576, kv_int8=kv_int8,
                fused_decode=fused,
            )
            bucket = 512
            state = init_state(cfg, ecfg, dtype=jnp.bfloat16)
            fill = bucket - 8
            fresh = lambda s: s.__class__(
                cache_k=s.cache_k, cache_v=s.cache_v, tokens=s.tokens,
                lengths=jnp.full((8,), fill, jnp.int32),
                active=jnp.ones((8,), bool),
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

            t_lo, state = run(state, 8, 3)
            state = fresh(state)
            t_hi, state = run(state, 24, 3)
            per = max((t_hi - t_lo) / 16, 1e-9)
            print(
                f"decode fused={fused} kv_int8={kv_int8} bucket={bucket}: "
                f"{per*1e3:.2f} ms/step  {8/per:,.0f} tok/s",
                flush=True,
            )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
