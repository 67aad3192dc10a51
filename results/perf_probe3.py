"""Per-op floor / matmul efficiency scaling probe (scratch)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_chain(f, x0, iters=50, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            return f(c), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    _sync(loop(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(loop(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    d = jax.devices()[0]
    print("device:", d.device_kind, d.platform, flush=True)

    rs = np.random.RandomState(0)

    for m, k, n in [
        (4096, 768, 768),
        (4096, 3072, 3072),
        (4096, 768, 3072),
        (8192, 768, 768),
        (16384, 768, 768),
        (4096, 8192, 8192),
        (512, 768, 768),
    ]:
        x = jnp.asarray(rs.randn(m, k) * 0.1, jnp.bfloat16)
        W = jnp.asarray(rs.randn(k, n) * 0.1, jnp.bfloat16)
        Wb = jnp.asarray(rs.randn(n, k) * 0.1, jnp.bfloat16)

        def f(c):
            return (c @ W) @ Wb  # back to (m,k) so the chain types match

        t = bench_chain(f, x, iters=30)
        fl = 2 * m * k * n + 2 * m * n * k
        print(f"mm {m}x{k}x{n} pair   {t*1e3:8.3f} ms  {fl/t/1e12:7.1f} TF/s", flush=True)

    # elementwise floor: single relu on (4096,768)
    x = jnp.asarray(rs.randn(4096, 768), jnp.bfloat16)
    t = bench_chain(lambda c: jax.nn.relu(c + 1e-3), x, iters=100)
    print(f"relu+add (4096,768)      {t*1e3:8.3f} ms", flush=True)

    # 10 chained relus -> marginal per-op cost
    def relus(c):
        for _ in range(10):
            c = jax.nn.relu(c + 1e-3)
        return c

    t = bench_chain(relus, x, iters=50)
    print(f"10x relu+add             {t*1e3:8.3f} ms", flush=True)

    # gather: 4096 rows from (30522,768)
    tab = jnp.asarray(rs.randn(30522, 768) * 0.1, jnp.bfloat16)
    ids = jnp.asarray(rs.randint(0, 30522, (4096,)), jnp.int32)

    def gath(i):
        e = jnp.take(tab, i, axis=0)
        return i + (jnp.sum(e[:, :4]) * 0).astype(jnp.int32)

    t = bench_chain(gath, ids, iters=50)
    print(f"gather 4096x768          {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
