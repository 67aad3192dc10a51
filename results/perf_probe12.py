"""Round-3 probe #7: XLA vs packed-kernel crossover sweep over sequence
length (distinct q/k/v + mask, the honest in-model setting — probe9). Picks
the dispatch threshold for `attention.py` (VERDICT #2: "if XLA genuinely wins
a shape, auto-dispatch to it").
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.flash import flash_attention_packed
from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, qkv0, lo, hi, repeats=4):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(qkv, iters):
        def body(c, _):
            q, k, v = c
            out = step(q, k, v)
            mix = 0.001 * jnp.mean(out).astype(q.dtype)
            return (q * 0.999 + mix, k * 0.999 + mix, v * 0.999 + mix), None

        out, _ = jax.lax.scan(body, qkv, None, length=iters)
        return out[0]

    def best_of(iters):
        _sync(loop(qkv0, iters=iters))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(loop(qkv0, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def sweep(b, t, h=12, d=64, lo=50, hi=450):
    hd = h * d
    scale = 1.0 / math.sqrt(d)
    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray(
            rng.normal(size=(b, t, hd)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)

    qkv0 = (mk(), mk(), mk())
    mask = np.ones((b, t), np.float32)
    mask[:, -5:] = 0.0
    bias = jnp.asarray((1 - mask)[:, None, None, :] * -1e9, jnp.float32)

    def xla_step(q, k, v):
        qh = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        s = s * scale + bias
        p = softmax_n_fn(s, 1.0, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vh)
        return ctx.transpose(0, 2, 1, 3).reshape(b, t, hd)

    def packed_step(q, k, v):
        return flash_attention_packed(
            q, k, v, bias=bias, heads=h, softmax_n=1.0, scale=scale
        )

    t_xla = bench_scan(xla_step, qkv0, lo, hi)
    t_packed = bench_scan(packed_step, qkv0, lo, hi)
    print(
        f"B{b:3d} T{t:4d}: xla {t_xla*1e6:8.1f} us  packed {t_packed*1e6:8.1f} us  "
        f"packed_speedup {t_xla/t_packed:5.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    for b, t, lo, hi in [
        (32, 128, 100, 900),
        (32, 192, 100, 700),
        (64, 200, 50, 450),   # ViT-base B64 (197→200)
        (32, 256, 50, 450),
        (32, 384, 50, 350),
        (32, 512, 50, 350),
    ]:
        sweep(b, t, lo=lo, hi=hi)
