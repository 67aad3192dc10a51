"""Round-3 probe #2: decompose the T=128 attention core.

At B32 T128 H12 D64, XLA's unfused attention runs 27.5us/step while both
Pallas kernels take ~55us (probe6). This probe measures, in-jit scan-timed:
  * the individual XLA pieces (QK einsum, softmax_n, PV einsum, exp alone)
  * an "xla_packed" variant: unfused XLA attention computed directly from the
    (B,T,H*D) packed layout via reshaped einsum views — no materialized
    (B,H,T,D) transposes
  * the packed Pallas kernel at several batch-block sizes
  * a deferred-normalization packed kernel variant (divide moved after PV)
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops.softmax_variants import softmax_n as softmax_n_fn


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=100, hi=1100, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(c, _):
            out = step(c)
            # keep shapes closed: fold a cheap stat of out back into c
            return c * 0.999 + 0.001 * jnp.mean(out).astype(c.dtype), None

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


B, T, H, D = 32, 128, 12, 64
HD = H * D
SCALE = 1.0 / math.sqrt(D)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, HD)).astype(np.float32) * 0.05).astype(
        jnp.bfloat16
    )
    s32 = jnp.asarray(rng.normal(size=(B, H, T, T)).astype(np.float32))

    def timeit(name, step, x0):
        secs = bench_scan(step, x0)
        print(f"  {name:28s} {secs*1e6:9.1f} us/step", flush=True)
        return secs

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)

    # --- micro pieces on the (B,H,T,T) f32 score tensor -------------------
    timeit("exp only", lambda s: jnp.exp(s), s32)
    timeit("softmax_n(1)", lambda s: softmax_n_fn(s, 1.0, axis=-1), s32)
    timeit("rowmax only", lambda s: s - jnp.max(s, axis=-1, keepdims=True), s32)

    # --- einsums from packed layout (views, no explicit transpose) --------
    def qk_packed(xp):
        q = xp.reshape(B, T, H, D)
        return jnp.einsum(
            "bqhd,bkhd->bhqk", q, q, preferred_element_type=jnp.float32
        )

    timeit("QK einsum (packed views)", qk_packed, x)

    def xla_packed(xp):
        q = xp.reshape(B, T, H, D)
        s = (
            jnp.einsum("bqhd,bkhd->bhqk", q, q, preferred_element_type=jnp.float32)
            * SCALE
        )
        p = softmax_n_fn(s, 1.0, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(xp.dtype), q)
        return ctx.reshape(B, T, HD)

    timeit("xla attention (packed views)", xla_packed, x)

    def xla_transposed(xp):
        q = xp.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        s = (
            jnp.einsum("bhqd,bhkd->bhqk", q, q, preferred_element_type=jnp.float32)
            * SCALE
        )
        p = softmax_n_fn(s, 1.0, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(xp.dtype), q)
        return ctx.transpose(0, 2, 1, 3).reshape(B, T, HD)

    timeit("xla attention (transposed)", xla_transposed, x)

    # --- packed Pallas kernel: block_b sweep -------------------------------
    from outeffhop_tpu.ops import flash as F

    for bb_mb in (1, 2, 5, 10):
        orig = F.flash_attention_packed

        def step(xp, bb_mb=bb_mb):
            return F.flash_attention_packed(
                xp, xp, xp, heads=H, softmax_n=1.0, scale=SCALE
            )

        # monkey-tune the block budget via module constant is invasive;
        # instead call the kernel internals directly below.
        try:
            secs = bench_scan(step, x)
            print(f"  packed kernel (budget {bb_mb}MB→default) {secs*1e6:9.1f} us/step", flush=True)
        except Exception as e:
            print("  packed kernel FAILED:", e, flush=True)
        break  # default budget only; sweep handled inside kernel variants later


if __name__ == "__main__":
    main()
