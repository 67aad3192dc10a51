"""Driver-round-5 probe #48: _BLOCKDIAG_ASSOC A/B — full-depth block-diagonal
association matmuls (4x FLOPs, ~8x tile utilization on the 28x64x28 lattice;
see models/stanhop.py and probe47's decomposition). Cells: {base,bd} x
{infer,traind} on the ETTh1 headline shape, current defaults otherwise."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "base_infer"
    variant, mode = cell.split("_", 1)

    import outeffhop_tpu.models.stanhop as sh
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, init_stanhop_params, stanhop_forward,
    )

    sh._BLOCKDIAG_ASSOC = variant == "bd"
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "| cell:", cell, "| _BLOCKDIAG_ASSOC:", sh._BLOCKDIAG_ASSOC,
          flush=True)
    if on_tpu:
        cfg = STanHopConfig(
            data_dim=7, in_len=168, out_len=24, seg_len=6, win_size=2,
            factor=10, d_model=256, d_ff=512, n_heads=4, e_layers=3,
            dropout=0.0, mode="softmax1",
        )
        b = 128
    else:
        cfg = STanHopConfig(
            data_dim=7, in_len=24, out_len=12, seg_len=6, win_size=2,
            factor=4, d_model=16, d_ff=32, n_heads=2, e_layers=2,
            dropout=0.0, mode="softmax1",
        )
        b = 8
    params = jax.jit(lambda k: init_stanhop_params(k, cfg))(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, cfg.in_len, cfg.data_dim), jnp.float32)
    y = jnp.asarray(rs.randn(b, cfg.out_len, cfg.data_dim), jnp.float32)

    if mode == "traind":
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
        opt_state = tx.init(params)

        def train_step(params, opt_state):
            def loss_fn(p):
                pred = stanhop_forward(p, cfg, x)
                return jnp.mean((pred.astype(jnp.float32) - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @functools.partial(jax.jit, static_argnames="iters")
        def loop(params, opt_state, iters):
            def body(c, _):
                p, o, acc = c
                p, o, loss = train_step(p, o)
                return (p, o, acc + loss), None

            return jax.lax.scan(
                body, (params, opt_state, jnp.zeros((), jnp.float32)), None,
                length=iters,
            )[0]

        def best_of(iters):
            out = loop(params, opt_state, iters=iters)
            _sync(out[2])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(params, opt_state, iters=iters)
                _sync(out[2])
                best = min(best, time.perf_counter() - t0)
            return best
    else:
        @functools.partial(jax.jit, static_argnames="iters")
        def loop(xi, iters):
            def body(c, _):
                pred = stanhop_forward(params, cfg, c)
                dep = (jnp.max(jnp.abs(pred)) > 1e30).astype(xi.dtype)
                return c + dep, None

            return jax.lax.scan(body, xi, None, length=iters)[0]

        def best_of(iters):
            _sync(loop(x, iters=iters))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(loop(x, iters=iters))
                best = min(best, time.perf_counter() - t0)
            return best

    n_lo, n_hi = (10, 40) if on_tpu else (2, 4)
    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    per = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    print(f"stanhop48_{cell}: {per*1e3:.3f} ms/step  {b/per:,.0f} windows/s",
          flush=True)


if __name__ == "__main__":
    main()
