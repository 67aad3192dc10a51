"""Round-4 probe #19: the Mosaic ApplyVectorLayout crash (round-3 probe14,
`Check failed: limits[i] <= dim(i) (64 vs. 1)`, OPT e2e B8xT512 SIGABRT).

Modes:
  new          — the FIXED kernels at the exact failing composition:
                 (a) standalone unpacked flash, bias+causal, B8 H12 T512 D64
                     (the _flash_attention_short path that crashed inside the
                     model), (b) standalone packed kernel with bias+causal at
                 the same shape (the path OPT prefill now dispatches to).
                 Correctness vs the jnp reference + scan-slope timing vs XLA.
  oldstyle     — a local copy of the round-3 kernel body (causal mask built as
                 a (1, T, T) iota broadcast through jnp.where) to confirm the
                 root cause in isolation. EXPECTED TO SIGABRT the process.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=4, hi=20, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(c, _):
            out = step(c)
            dep = (jnp.max(jnp.abs(out[..., :8])) > 1e30).astype(c.dtype)
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


def make_inputs(b=8, h=12, t=512, d=64):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
    mask = np.ones((b, t), np.float32)
    mask[:, -32:] = 0.0
    bias = jnp.asarray((1 - mask)[:, None, None, :] * -1e9, jnp.float32)
    return q, k, v, bias


def run_new():
    from outeffhop_tpu.ops.flash import (
        attention_reference,
        flash_attention,
        flash_attention_packed,
    )

    q, k, v, bias = make_inputs()
    b, h, t, d = q.shape
    ref = np.asarray(
        attention_reference(q, k, v, bias, softmax_n=1.0, causal=True), np.float32
    )

    got = np.asarray(
        jax.jit(
            lambda q, k, v: flash_attention(q, k, v, bias, softmax_n=1.0, causal=True)
        )(q, k, v),
        np.float32,
    )
    err = np.abs(got - ref).max()
    print(f"unpacked short bias+causal B{b}H{h}T{t}: max|err|={err:.4f}", flush=True)
    assert err < 0.1

    qp = q.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    kp = k.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    vp = v.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    gotp = np.asarray(
        jax.jit(
            lambda q, k, v: flash_attention_packed(
                q, k, v, bias, heads=h, softmax_n=1.0, causal=True
            )
        )(qp, kp, vp),
        np.float32,
    )
    errp = np.abs(gotp - ref.transpose(0, 2, 1, 3).reshape(b, t, h * d)).max()
    print(f"packed bias+causal B{b}H{h}T{t}: max|err|={errp:.4f}", flush=True)
    assert errp < 0.1

    t_xla = bench_scan(
        lambda qq: attention_reference(qq, k, v, bias, softmax_n=1.0, causal=True), q
    )
    t_un = bench_scan(
        lambda qq: flash_attention(qq, k, v, bias, softmax_n=1.0, causal=True), q
    )
    t_pk = bench_scan(
        lambda qq: flash_attention_packed(
            qq, kp, vp, bias, heads=h, softmax_n=1.0, causal=True
        ),
        qp,
    )
    print(
        f"causal+bias timing B{b}H{h}T{t}: xla {t_xla*1e6:.1f} us, "
        f"unpacked {t_un*1e6:.1f} us ({t_xla/t_un:.2f}x), "
        f"packed {t_pk*1e6:.1f} us ({t_xla/t_pk:.2f}x)",
        flush=True,
    )


def run_oldstyle():
    """Round-3 kernel body, verbatim singleton-broadcast causal mask."""

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, t_q, t_k):
        q = q_ref[...]
        k = k_ref[...]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s + bias_ref[...].astype(jnp.float32)
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (1, t_q, t_k), 1)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (1, t_q, t_k), 2)
        s = jnp.where(q_pos >= k_pos, s, -1e30)  # (1,T,T) broadcast: the bug
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), 0.0)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(-m)
        p = p / denom
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = pv.astype(o_ref.dtype)

    q, k, v, bias = make_inputs()
    b, h, t, d = q.shape
    qr = q.reshape(b * h, t, d)
    kr = k.reshape(b * h, t, d)
    vr = v.reshape(b * h, t, d)
    biasr = jnp.broadcast_to(bias[:, None], (b, h, 1, t)).reshape(b * h, 1, t)
    bb = 4
    out = pl.pallas_call(
        functools.partial(kernel, t_q=t, t_k=t),
        grid=(b * h // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, 1, t), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(qr, kr, vr, biasr)
    print("oldstyle compiled+ran?!", float(jnp.sum(out)), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "new"
    (run_oldstyle if mode == "oldstyle" else run_new)()
