"""Round-3 probe #3: packed-kernel VARIANTS at B32 T128 H12 D64 to find where
the 55-60us goes (XLA fused attention: ~29us). Variants are standalone here;
the winner gets ported to ops/flash.py.

V0 current packed kernel (per-head loop, normalize-then-PV)
V1 deferred normalization: PV on unnormalized p, scale output by 1/denom
V2 V1 + no max-shift (UNSAFE numerics; isolates the rowmax+subtract cost)
V3 V1 + exp2(x*log2e) instead of exp
V4 V1 + denominator via ones-column matmul (row-sum on the MXU)
V5 block_b sweep on V1
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, D = 32, 128, 12, 64
HD = H * D
SCALE = 1.0 / math.sqrt(D)
LOG2E = 1.4426950408889634


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=100, hi=1100, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(c, _):
            out = step(c)
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


def packed_variant(variant: str, block_b: int = 16, group: int = 2):
    d = D

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for hh in range(group):
            sl = slice(hh * d, (hh + 1) * d)
            q = q_ref[:, :, sl]
            k = k_ref[:, :, sl]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * SCALE
            if variant == "v2_nomax":
                p = jnp.exp(s)
                denom = jnp.sum(p, axis=-1, keepdims=True) + 1.0
            elif variant == "v3_exp2":
                m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), 0.0)
                p = jnp.exp2((s - m) * LOG2E)
                denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp2(-m * LOG2E)
            else:
                m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), 0.0)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(-m)
            if variant == "v0_current":
                p = p / denom
                pv = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[:, :, sl],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:, :, sl] = pv.astype(o_ref.dtype)
            else:  # deferred normalization
                pv = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[:, :, sl],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:, :, sl] = (pv / denom).astype(o_ref.dtype)

    def kernel_v4(q_ref, k_ref, v_ref, o_ref):
        # denominator via MXU: V extended with a ones column per head-pair is
        # awkward in packed layout; instead matmul p @ ones via dot with a
        # broadcasted ones matrix folded as sum — emulate with dot against
        # concat[v, ones] repacked (t_k, 128): lanes 0:64 v, lane 64 ones.
        for hh in range(group):
            sl = slice(hh * d, (hh + 1) * d)
            q = q_ref[:, :, sl]
            k = k_ref[:, :, sl]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * SCALE
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), 0.0)
            p = jnp.exp(s - m).astype(v_ref.dtype)
            v = v_ref[:, :, sl]
            ones = jnp.ones(v.shape[:2] + (128 - d,), v.dtype)
            v_ext = jnp.concatenate([v, ones], axis=-1)  # (bb, t_k, 128)
            pv = jax.lax.dot_general(
                p, v_ext, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bb, t_q, 128): 0:64 ctx, 64 rowsum
            denom = pv[:, :, d:d + 1] + jnp.exp(-m)
            o_ref[:, :, sl] = (pv[:, :, :d] / denom).astype(o_ref.dtype)

    body = kernel_v4 if variant == "v4_mxu_denom" else kernel

    def run(x):
        grid = (B // block_b, H // group)
        gd = group * d
        return pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, T, gd), lambda i, h: (i, 0, h)),
                pl.BlockSpec((block_b, T, gd), lambda i, h: (i, 0, h)),
                pl.BlockSpec((block_b, T, gd), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((block_b, T, gd), lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((B, T, HD), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(x, x, x)

    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, HD)).astype(np.float32) * 0.05).astype(
        jnp.bfloat16
    )

    # reference output for correctness
    def ref(xp):
        q = xp.reshape(B, T, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, q, preferred_element_type=jnp.float32) * SCALE
        m = jnp.maximum(jnp.max(s, -1, keepdims=True), 0.0)
        p = jnp.exp(s - m)
        p = p / (jnp.sum(p, -1, keepdims=True) + jnp.exp(-m))
        return jnp.einsum("bhqk,bkhd->bqhd", p.astype(xp.dtype), q).reshape(B, T, HD)

    want = jax.jit(ref)(x)
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)

    import sys

    if "groups" in sys.argv:
        # hypothesis: 128-lane head-group slices out of the 768-lane packed
        # array are STRIDED DMA (256B bursts of 1536B rows) at ~50% HBM
        # efficiency; full-width blocks make the DMA contiguous
        cases = [
            ("v1_defer", 4, 12), ("v1_defer", 8, 12), ("v1_defer", 16, 12),
            ("v1_defer", 8, 6), ("v1_defer", 8, 4), ("v1_defer", 16, 2),
            ("v2_nomax", 8, 12),
        ]
    else:
        cases = [
            ("v0_current", 16, 2), ("v1_defer", 16, 2), ("v2_nomax", 16, 2),
            ("v3_exp2", 16, 2), ("v4_mxu_denom", 16, 2),
            ("v1_defer", 4, 2), ("v1_defer", 8, 2), ("v1_defer", 32, 2),
        ]
    for variant, bb, grp in cases:
        try:
            run = packed_variant(variant, block_b=bb, group=grp)
            got = jax.jit(run)(x)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
            secs = bench_scan(run, x)
            print(f"  {variant:14s} bb={bb:3d} grp={grp:2d}  {secs*1e6:8.1f} us  maxerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"  {variant:14s} bb={bb:3d} grp={grp:2d}  FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
