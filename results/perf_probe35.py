"""Round-5 probe #35: where does the decode FORWARD's time go?

probe30 measured the 12-layer decode forward at 8.07 ms bf16 / 7.32 ms int8
(32 slots x bucket 2048) vs a ~4.7 ms floor (12 x 0.35 ms roofline attention
+ 0.3 ms weights + head). This probe fits per-layer slope + fixed intercept
by timing n_layers in {3, 6, 12} with identical per-layer cache shapes:

    t(L) = intercept + L * per_layer

per_layer >> 0.38 ms  -> the in-model attention/projection chain is the gap
intercept >> 0.3 ms   -> fixed head/embed/mask cost is the gap

Usage: perf_probe35.py [int8]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def to_bf16(params):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x is not None and x.dtype == jnp.float32
        else x,
        params,
        is_leaf=lambda x: x is None,
    )


def bench_fwd(n_layers, kv_int8):
    from outeffhop_tpu.models.opt import (
        Int8KV, OPTConfig, init_opt_params, opt_forward,
    )

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0,
                    num_hidden_layers=n_layers)
    params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)))(
        jax.random.PRNGKey(0)
    )
    S, B = 32, 2048
    H, D = cfg.num_attention_heads, cfg.head_dim
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    if kv_int8:
        pk = jax.random.randint(ks[0], (n_layers, S, H, B, D), -127, 128, jnp.int8)
        pv = jax.random.randint(ks[1], (n_layers, S, H, B, D), -127, 128, jnp.int8)
        sc = jnp.full((n_layers, S, H, B), 0.01, jnp.float32)
    else:
        pk = jax.random.normal(ks[0], (n_layers, S, H, B, D), jnp.bfloat16)
        pv = jax.random.normal(ks[1], (n_layers, S, H, B, D), jnp.bfloat16)
        sc = None
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(3, cfg.vocab_size, (S, 1)), jnp.int32
    )
    attn_mask = jnp.ones((S, B + 1), jnp.int32)

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(pk, pv, sc, tokens, iters):
        if kv_int8:
            past = [Int8KV(pk[l], pv[l], sc[l], sc[l]) for l in range(n_layers)]
        else:
            past = [(pk[l], pv[l]) for l in range(n_layers)]

        def body(c, _):
            cur = tokens + (c.astype(jnp.int32) % 2)
            logits, _ = opt_forward(
                params, cfg, cur, attn_mask, past_key_values=past,
                decode_fast=True,
            )
            return c + (jnp.max(jnp.abs(logits[:, -1, :8])) > 1e30).astype(
                jnp.float32
            ), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)[0]

    def best_of(iters):
        _sync(loop(pk, pv, sc, tokens, iters=iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(pk, pv, sc, tokens, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(4), best_of(12)
    per = max((t_hi - t_lo) / 8, 1e-9)
    print(f"decode fwd L={n_layers:2d} int8={kv_int8}: {per*1e3:.3f} ms/step",
          flush=True)
    return per


def main():
    kv_int8 = "int8" in sys.argv
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    ts = {}
    for L in (3, 6, 12):
        ts[L] = bench_fwd(L, kv_int8)
    # least-squares fit of t = a + b*L
    Ls = np.array(sorted(ts))
    ys = np.array([ts[L] for L in Ls])
    b_fit, a_fit = np.polyfit(Ls, ys, 1)
    print(f"fit: intercept {a_fit*1e3:.3f} ms + {b_fit*1e3:.3f} ms/layer",
          flush=True)


if __name__ == "__main__":
    main()
