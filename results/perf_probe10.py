"""Round-3 probe #5: INT8 matmul roofline diagnosis (VERDICT weak #5).

Round 2 recorded 5.6 TOPS (XLA) / 3.5 TOPS (Pallas) at 1024x768x3072 on a
394-TOPS chip. Two suspects: (a) the XLA path upcast its operands to int32
before the dot (now fixed — int8 operands go in directly), (b) the old
numbers were dispatch-contaminated (not scan-timed). This probe scan-times:
  * bf16 matmul (reference point / roofline sanity)
  * int8 dot_general with int8 operands (fixed path) + dequant epilogue
  * int8 dot_general with int32-upcast operands (the round-2 bug, kept for
    comparison)
  * the Pallas W8A8 kernel at several tile sizes
at a BERT layer shape and a compute-bound 4096^3 shape.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.int8_matmul import w8a8_matmul_pallas, w8a8_matmul_xla


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_scan(step, x0, lo, hi, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(c, _):
            out = step(c)
            # int8 carry: flip low bit based on out to keep the dependence
            dep = (jnp.max(jnp.abs(out)) > 1e30).astype(jnp.int8)
            return c + dep, None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    def best_of(iters):
        _sync(loop(x0, iters=iters))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(loop(x0, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def probe(M, K, N, lo, hi):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    xs = jnp.float32(0.01)
    zp = jnp.float32(0.0)
    ws = jnp.asarray(rng.uniform(0.005, 0.02, (N,)).astype(np.float32))
    cs = jnp.sum(w8.astype(jnp.int32), axis=0).astype(jnp.float32)
    xb = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)).astype(jnp.bfloat16)

    ops = 2.0 * M * K * N

    def report(name, secs):
        print(f"  {name:22s} {secs*1e6:9.1f} us  {ops/secs/1e12:7.1f} TOPS", flush=True)

    print(f"\n== {M}x{K}x{N} ==", flush=True)

    def bf16_step(x):
        return (x @ wb).astype(jnp.bfloat16)

    report("bf16 matmul", bench_scan(bf16_step, xb, lo, hi))

    def int8_fixed(x):
        return w8a8_matmul_xla(x, w8, xs, zp, ws, cs, out_dtype=jnp.bfloat16)

    report("int8 xla (int8 ops)", bench_scan(int8_fixed, x8, lo, hi))

    def int8_upcast(x):
        acc = jax.lax.dot_general(
            x.astype(jnp.int32), w8.astype(jnp.int32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)

    report("int8 xla (int32 bug)", bench_scan(int8_upcast, x8, lo, hi))

    for bm, bn, bk in [(256, 256, 512), (512, 512, 768), (256, 512, 1024)]:
        if bk > K or bm > M or bn > N:
            continue
        def pallas_step(x, bm=bm, bn=bn, bk=bk):
            return w8a8_matmul_pallas(
                x, w8, xs, zp, ws, cs, out_dtype=jnp.bfloat16, bm=bm, bn=bn, bk=bk
            )
        try:
            report(f"int8 pallas {bm}x{bn}x{bk}", bench_scan(pallas_step, x8, lo, hi))
        except Exception as e:
            print(f"  pallas {bm}x{bn}x{bk} FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    which = sys.argv[1:] or ["bert"]
    if "bert" in which:
        probe(1024, 768, 3072, 200, 2200)
    if "big" in which:
        probe(4096, 4096, 4096, 20, 220)
