"""Round-3 probe #12: INT8 KV-cache decode (serving). Decode is KV-cache-
bandwidth-bound (BASELINE.md serving table: int8 WEIGHTS were neutral); the
int8 CACHE halves the dominant traffic term. Measures a full-pool decode step
(8 slots x OPT-125m, near-full 512-token caches) for bf16 vs int8 caches at
bucket 512, and the bucketed-128 case for scale.
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

    # bucket 128 scaling was measured in round 2; keep the compile budget to
    # the int8-vs-bf16 comparison at the full 512 bucket
    for kv_int8 in (False, True):
        for bucket in (512,):
            ecfg = EngineConfig(
                max_slots=8, max_prompt=512, max_seq=576, kv_int8=kv_int8
            )
            state = init_state(cfg, ecfg, dtype=jnp.bfloat16)
            # fake a near-full pool: lengths just under the bucket, active
            fill = bucket - 8
            state = state.__class__(
                cache_k=state.cache_k, cache_v=state.cache_v,
                tokens=state.tokens,
                lengths=jnp.full((8,), fill, jnp.int32),
                active=jnp.ones((8,), bool),
                scale_k=state.scale_k, scale_v=state.scale_v,
            )
            rng = jax.random.PRNGKey(0)

            def run(state, n_prog, reps):
                prog = make_decode_n(cfg, ecfg, n_prog, bucket=bucket)
                s = prog(params, state, rng)  # compile+warm
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    s = prog(params, s, rng)
                    _sync(s.lengths)
                    best = min(best, time.perf_counter() - t0)
                return best, s

            # two program lengths; slope cancels the dispatch intercept.
            # Each decode_n(8/24) stays under max_seq - fill headroom (56).
            t_lo, state = run(state, 8, 3)
            # reset lengths so the longer program has headroom too
            state = state.__class__(
                cache_k=state.cache_k, cache_v=state.cache_v,
                tokens=state.tokens,
                lengths=jnp.full((8,), fill, jnp.int32),
                active=jnp.ones((8,), bool),
                scale_k=state.scale_k, scale_v=state.scale_v,
            )
            t_hi, state = run(state, 24, 3)
            per = max((t_hi - t_lo) / 16, 1e-9)
            print(
                f"decode kv_int8={kv_int8} bucket={bucket}: {per*1e3:.2f} ms/step"
                f"  {8/per:,.0f} tok/s",
                flush=True,
            )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
