# NOTE (round 5): this probe predates the deletion of ops/decode_attention.py
# (adjudicated against, see BASELINE.md) - it no longer runs; the measured
# numbers live in results/probe29_decode.log.
"""Round-5 probe #29: BLOCKED flash-decode kernel (ops/decode_attention.py
rewrite) vs the XLA decode path, both regimes.

Round-4 state (probe22/probe22b): whole-slot-block kernel lost 2.6x at
8 slots x bucket 512 (weight-bound) and could not compile at 32 x 2048
(24 MB VMEM block). XLA big-cache numbers: bf16 40.32 ms, int8 20.15 ms
vs a ~3-6 ms HBM streaming floor — the target of the blocked rewrite.

Part A: standalone attention op (32 slots x 12 heads x bucket 2048 x 64),
scan-slope inside one jit: XLA reference vs blocked kernel, bf16 + int8.
Part B: full 12-layer engine decode step in both regimes, matrix
{XLA, fused} x {bf16, int8}.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(fn, args, lo=4, hi=12):
    """fn(carry, *args) -> carry (a small array); slope-timed."""

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(args, iters):
        def body(c, _):
            return fn(c, *args), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)[0]

    def best_of(iters):
        _sync(loop(args, iters=iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(args, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def part_a():
    from outeffhop_tpu.ops.decode_attention import (
        decode_attention, decode_attention_reference,
    )

    s, h, b, d = 32, 12, 2048, 64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (s, h, d), jnp.bfloat16)
    kn = jax.random.normal(ks[1], (s, h, d), jnp.bfloat16)
    vn = jax.random.normal(ks[2], (s, h, d), jnp.bfloat16)
    mask = jnp.zeros((s, b), jnp.float32)
    kc16 = jax.random.normal(ks[3], (s, h, b, d), jnp.bfloat16)
    vc16 = jax.random.normal(ks[4], (s, h, b, d), jnp.bfloat16)
    kc8 = jax.random.randint(ks[5], (s, h, b, d), -127, 128, jnp.int8)
    vc8 = jax.random.randint(ks[6], (s, h, b, d), -127, 128, jnp.int8)
    sc = jnp.full((s, h, b), 0.01, jnp.float32)

    cases = [
        ("xla  bf16", decode_attention_reference, (q, kc16, vc16, kn, vn, mask, None, None)),
        ("pallas bf16", decode_attention, (q, kc16, vc16, kn, vn, mask, None, None)),
        ("xla  int8", decode_attention_reference, (q, kc8, vc8, kn, vn, mask, sc, sc)),
        ("pallas int8", decode_attention, (q, kc8, vc8, kn, vn, mask, sc, sc)),
    ]
    gb = {True: (s * h * b * d * 2) / 1e9, False: (s * h * b * d * 2 * 2) / 1e9}
    for name, fn, args in cases:
        def step(c, *a, fn=fn):
            # perturb q with the carry so the scan body cannot be hoisted
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:], softmax_n=1.0)
            return c + jnp.sum(out[0, 0, :8].astype(jnp.float32)) * 1e-30

        t = bench_scan(step, args)
        traffic = gb["int8" in name]
        print(f"A {name:12s} {t*1e3:7.3f} ms   {traffic / t:6.1f} GB/s cache-stream",
              flush=True)


def part_b():
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

    # (8, 512) XLA cells already measured (probe22: bf16 1.30 ms, int8
    # 3.51 ms) — only the new kernel's cells re-run there.
    cells = [
        (8, 512, 576, True, False),
        (8, 512, 576, True, True),
        (32, 2048, 2112, False, False),
        (32, 2048, 2112, False, True),
        (32, 2048, 2112, True, False),
        (32, 2048, 2112, True, True),
    ]
    for slots, bucket, max_seq, fused, kv_int8 in cells:
        if True:
            if True:
                ecfg = EngineConfig(
                    max_slots=slots, max_prompt=bucket, max_seq=max_seq,
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

                try:
                    t_lo, state = run(state, 8, 3)
                    state = fresh(state)
                    t_hi, state = run(state, 24, 3)
                except Exception as e:  # record, keep matrix going
                    print(f"B slots={slots} bucket={bucket} fused={fused} "
                          f"kv_int8={kv_int8}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
                    continue
                per = max((t_hi - t_lo) / 16, 1e-9)
                print(
                    f"B slots={slots} bucket={bucket} fused={fused} "
                    f"kv_int8={kv_int8}: {per*1e3:.2f} ms/step  "
                    f"{slots/per:,.0f} tok/s",
                    flush=True,
                )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    part_a()
    part_b()
