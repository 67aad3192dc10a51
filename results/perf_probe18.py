"""Round-3 probe #13: OPT-125m e2e forward at T=2048 (long-sequence regime,
B2 — where the online-softmax flash path won 4.15-5x standalone on chip,
probe11). Validates the long-seq dispatch END-TO-END: probe14 showed that
standalone kernel wins can be eaten by XLA's surrounding-op fusion at short T.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=2, hi=8, repeats=5):
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


def main():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)

    @jax.jit
    def make_params(key):
        p = init_opt_params(key, cfg)
        return jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t is not None and t.dtype == jnp.float32
            else t,
            p, is_leaf=lambda t: t is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    b, t_len = 2, 2048
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t_len)), jnp.int32
    )

    for use_flash in (False, True):
        def step(c, uf=use_flash):
            logits, _ = opt_forward(params, cfg, c, deterministic=True, use_flash=uf)
            return logits

        t = bench_scan(step, ids)
        print(
            f"opt_125m B{b} T{t_len} use_flash={use_flash}: "
            f"{t*1e3:.2f} ms/step  {b*t_len/t:,.0f} tok/s",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
