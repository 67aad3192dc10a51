"""Round-3 probe #4: honest T=128 comparison — DISTINCT q/k/v (the real model
has three different tensors; q=k=v lets XLA CSE operand reads and flatters the
baseline) and the (B,1,1,T) additive mask, exactly as the model dispatches.
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.flash import flash_attention, flash_attention_packed
from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn

B, T, H, D = 32, 128, 12, 64
HD = H * D
SCALE = 1.0 / math.sqrt(D)


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, qkv0, lo=100, hi=1100, repeats=5):
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


def main():
    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray(
            rng.normal(size=(B, T, HD)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)

    qkv0 = (mk(), mk(), mk())
    mask = np.ones((B, T), np.float32)
    mask[:, -9:] = 0.0
    bias = jnp.asarray((1 - mask)[:, None, None, :] * -1e9, jnp.float32)

    def xla_step(q, k, v):
        qh = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        s = s * SCALE + bias
        p = softmax_n_fn(s, 1.0, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vh)
        return ctx.transpose(0, 2, 1, 3).reshape(B, T, HD)

    def classic_step(q, k, v):
        qh = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        ctx = flash_attention(qh, kh, vh, bias=bias, softmax_n=1.0, scale=SCALE)
        return ctx.transpose(0, 2, 1, 3).reshape(B, T, HD)

    def packed_step(q, k, v):
        return flash_attention_packed(
            q, k, v, bias=bias, heads=H, softmax_n=1.0, scale=SCALE
        )

    # official JAX Pallas flash kernel (vanilla softmax; timing reference)
    from jax.experimental.pallas.ops.tpu import flash_attention as offi
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def official_step(q, k, v):
        qh = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        ctx = offi.flash_attention(qh, kh, vh, sm_scale=SCALE)
        return ctx.transpose(0, 2, 1, 3).reshape(B, T, HD)

    # pure DMA probe: same blocks as the packed kernel, copy only
    def copy_kernel(q_ref, k_ref, v_ref, o_ref):
        o_ref[...] = q_ref[...] + k_ref[:1] * 0 + v_ref[:1] * 0

    def copy_step(q, k, v):
        bb, grp = 16, 2
        gd = grp * D
        return pl.pallas_call(
            copy_kernel,
            grid=(B // bb, H // grp),
            in_specs=[pl.BlockSpec((bb, T, gd), lambda i, h: (i, 0, h))] * 3,
            out_specs=pl.BlockSpec((bb, T, gd), lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(q, k, v)

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    ref = jax.jit(xla_step)(*qkv0)
    cases = [
        ("xla", xla_step), ("classic", classic_step), ("packed", packed_step),
        ("official", official_step), ("dma_copy", copy_step),
    ]
    for name, step in cases:
        try:
            got = jax.jit(step)(*qkv0)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            secs = bench_scan(step, qkv0)
            print(f"  {name:8s} {secs*1e6:8.1f} us/step  maxerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"  {name:8s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
