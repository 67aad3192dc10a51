"""Flash kernel vs unfused XLA attention crossover sweep (slope-timed)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def slope(step, args, lo=8, hi=40, repeats=3):
    @partial(jax.jit, static_argnames=("iters",))
    def loop(a, iters):
        def body(c, _):
            out = step(c, a[1], a[2], a[3])
            return out.astype(c.dtype), None
        out, _ = jax.lax.scan(body, a[0], None, length=iters)
        return out

    def best(iters):
        _sync(loop(args, iters=iters))
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(loop(args, iters=iters))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(hi) - best(lo)) / (hi - lo)


def main():
    from outeffhop_tpu.ops.flash import flash_attention
    from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn

    rs = np.random.RandomState(0)
    B, H, D = 32, 12, 64

    def unfused(q, k, v, bias):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / np.sqrt(D)
        if bias is not None:
            s = s + bias
        p = softmax_n_fn(s, 1.0, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    def flash(q, k, v, bias):
        return flash_attention(q, k, v, bias=bias, softmax_n=1.0)

    for T in (128, 256, 512, 1024):
        b = max(4, B * 128 // T)  # keep total tokens roughly constant
        q = jnp.asarray(rs.randn(b, H, T, D) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, H, T, D) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, H, T, D) * 0.1, jnp.bfloat16)
        bias = jnp.zeros((b, 1, 1, T), jnp.float32)
        # feed q back as carry
        t_un = slope(lambda c, kk, vv, bb: unfused(c, kk, vv, bb), (q, k, v, bias))
        t_fl = slope(lambda c, kk, vv, bb: flash(c, kk, vv, bb), (q, k, v, bias))
        print(f"T={T:5d} b={b:3d}  unfused {t_un*1e3:7.3f} ms  flash {t_fl*1e3:7.3f} ms"
              f"  flash speedup {t_un/t_fl:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
