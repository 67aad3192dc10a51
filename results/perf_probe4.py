"""Slope-fit timing: per-iteration time = (T(iters_hi) - T(iters_lo)) / (hi - lo).

Cancels per-dispatch tunnel/host overhead exactly. Weights passed as jit
arguments (not closure constants) so they aren't baked into the HLO.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timed(fn, *args, repeats=4):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(step, x0, ws, lo=8, hi=40):
    @partial(jax.jit, static_argnames=("iters",))
    def loop(x, ws, iters):
        def body(c, _):
            return step(c, ws), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    t_lo = timed(lambda x, w: loop(x, w, iters=lo), x0, ws)
    t_hi = timed(lambda x, w: loop(x, w, iters=hi), x0, ws)
    return (t_hi - t_lo) / (hi - lo), t_lo - lo * (t_hi - t_lo) / (hi - lo)


def rep(name, t, ovh, flops=None):
    extra = f"  {flops / t / 1e12:7.1f} TF/s" if flops else ""
    print(f"{name:28s} {t*1e3:8.3f} ms/iter  (dispatch ovh {ovh*1e3:6.1f} ms){extra}",
          flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rs = np.random.RandomState(0)

    x = jnp.asarray(rs.randn(4096, 768) * 0.1, jnp.bfloat16)

    # floor: relu+add
    t, o = slope(lambda c, w: jax.nn.relu(c + 1e-3), x, ())
    rep("relu+add(4096,768)", t, o)

    # matmul pairs
    for m, k, n in [(4096, 768, 768), (4096, 768, 3072), (4096, 3072, 3072),
                    (16384, 768, 768)]:
        xx = jnp.asarray(rs.randn(m, k) * 0.1, jnp.bfloat16)
        W = jnp.asarray(rs.randn(k, n) * 0.1, jnp.bfloat16)
        Wb = jnp.asarray(rs.randn(n, k) * 0.1, jnp.bfloat16)
        t, o = slope(lambda c, ws: (c @ ws[0]) @ ws[1], xx, (W, Wb))
        rep(f"mm {m}x{k}x{n} pair", t, o, 4 * m * k * n)

    # ln
    lnw = (jnp.ones((768,), jnp.bfloat16), jnp.zeros((768,), jnp.bfloat16))

    def ln(c, ws):
        mu = jnp.mean(c, -1, keepdims=True)
        var = jnp.mean(jnp.square(c - mu), -1, keepdims=True)
        return (c - mu) * jax.lax.rsqrt(var + 1e-12) * ws[0] + ws[1]

    t, o = slope(ln, x, lnw)
    rep("layer_norm(4096,768)", t, o)

    # gather
    tab = jnp.asarray(rs.randn(30522, 768) * 0.1, jnp.bfloat16)
    ids = jnp.asarray(rs.randint(0, 30522, (4096,)), jnp.int32)

    def gath(i, ws):
        e = jnp.take(ws[0], i, axis=0)
        return i + (jnp.sum(e[:, :4]) * 0).astype(jnp.int32)

    t, o = slope(gath, ids, (tab,))
    rep("gather 4096 of 30522x768", t, o)

    # argmax over vocab
    lg = jnp.asarray(rs.randn(4096, 30522) * 0.1, jnp.bfloat16)

    def am(i, ws):
        a = jnp.argmax(ws[0] + i[0, 0].astype(jnp.bfloat16), -1)
        return i + (jnp.sum(a) * 0).astype(jnp.int32)

    t, o = slope(am, ids, (lg,))
    rep("argmax(4096,30522)", t, o)


if __name__ == "__main__":
    main()
