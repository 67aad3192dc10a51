"""Round-3 probe: packed flash kernel (head-group lane slices) vs classic
(B,H,T,D) flash vs XLA unfused, all measured END-TO-END from packed (B,T,H*D)
inputs to packed outputs — i.e. including whatever layout ops each path forces
on the model. In-jit scan timing with a carry dependence (out feeds next q/k/v)
so the tunnel's per-dispatch latency cancels.

Run on the real chip: python results/perf_probe6.py
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.flash import (
    attention_reference,
    flash_attention,
    flash_attention_packed,
)
from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=100, hi=1100, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(c, _):
            return step(c), None

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


def split_heads(x, h):
    b, t, hd = x.shape
    return x.reshape(b, t, h, hd // h).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def probe(b, t, h, d, n=1.0, lo=100, hi=1100):
    hd = h * d
    scale = 1.0 / math.sqrt(d)
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, t, hd)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    def xla_step(x):
        q = split_heads(x, h)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q, preferred_element_type=jnp.float32)
        s = s * scale
        p = softmax_n_fn(s, n, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(x.dtype), q)
        return merge_heads(ctx)

    def classic_step(x):
        q = split_heads(x, h)
        ctx = flash_attention(q, q, q, softmax_n=n, scale=scale)
        return merge_heads(ctx)

    def packed_step(x):
        return flash_attention_packed(x, x, x, heads=h, softmax_n=n, scale=scale)

    res = {}
    for name, step in [("xla", xla_step), ("classic", classic_step), ("packed", packed_step)]:
        try:
            # correctness spot-check first
            ref = merge_heads(
                attention_reference(
                    split_heads(x0, h), split_heads(x0, h), split_heads(x0, h),
                    softmax_n=n, scale=scale,
                )
            )
            got = jax.jit(step)(x0)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            secs = bench_scan(step, x0, lo=lo, hi=hi)
            res[name] = (secs, err)
        except Exception as e:  # noqa
            res[name] = (None, f"{type(e).__name__}: {e}")
    base = res["xla"][0]
    print(f"\n== B{b} T{t} H{h} D{d} softmax_{n:g} ==")
    for name, (secs, err) in res.items():
        if secs is None:
            print(f"  {name:8s} FAILED: {str(err)[:200]}")
        else:
            print(
                f"  {name:8s} {secs*1e6:9.1f} us/step  vs_xla={base/secs:6.3f}  maxerr={err:.2e}"
            )


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    shapes = {
        "bert": ((32, 128, 12, 64), 100, 1100),   # BERT-base headline
        "opt": ((32, 512, 12, 64), 50, 350),      # OPT block
        "vit": ((64, 200, 12, 64), 100, 700),     # ViT-base-ish (197→200)
        "long": ((8, 1024, 12, 64), 50, 350),
    }
    for name in sys.argv[1:] or ["bert"]:
        (b, t, h, d), lo, hi = shapes[name]
        probe(b, t, h, d, lo=lo, hi=hi)
        sys.stdout.flush()
