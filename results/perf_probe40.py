"""Round-6 probe #40: STanHop step decomposition + true MFU.

probe39 put the ETTh1 train step at 28.6 ms. Before optimizing, establish
(a) XLA cost-analysis FLOPs for fwd and train (→ real MFU), (b) where the
time goes: fwd | fwd+bwd | +adam | dropout on/off.

Cells: fwd, fwd_drop, train (control = probe39 f32), train_det.
"""

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
    cell = sys.argv[1]
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, init_stanhop_params, stanhop_forward,
    )

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    cfg = STanHopConfig(
        data_dim=7, in_len=168, out_len=24, seg_len=6, win_size=2,
        factor=10, d_model=256, d_ff=512, n_heads=4, e_layers=3,
        dropout=0.2, mode="softmax1",
    )
    b = 128
    params = jax.jit(lambda k: init_stanhop_params(k, cfg))(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, cfg.in_len, cfg.data_dim), jnp.float32)
    y = jnp.asarray(rs.randn(b, cfg.out_len, cfg.data_dim), jnp.float32)
    rng = (jax.random.key(1, impl="rbg")
           if jax.default_backend() == "tpu" else jax.random.PRNGKey(1))
    dropout_on = cell in ("fwd_drop", "train")

    def fwd_loss(p, carry_dep):
        pred = stanhop_forward(
            p, cfg, x + 0.0 * carry_dep,
            dropout_rng=rng if dropout_on else None,
            deterministic=not dropout_on,
        )
        return jnp.mean((pred - y) ** 2)

    if cell.startswith("fwd"):
        def one(carry):
            return fwd_loss(params, carry)

        # FLOP count of a single forward
        fl = jax.jit(lambda c: one(c)).lower(jnp.zeros(())).compile()
        try:
            flops = fl.cost_analysis()["flops"]
            print(f"fwd cost-analysis: {flops/1e9:.1f} GFLOP", flush=True)
        except Exception as e:  # noqa: BLE001
            print("cost_analysis unavailable:", e, flush=True)

        @functools.partial(jax.jit, static_argnames="iters")
        def loop(c0, iters):
            def body(c, _):
                return c + one(c) * 1e-30, None

            return jax.lax.scan(body, c0, None, length=iters)[0]

        def best_of(iters):
            out = loop(jnp.zeros(()), iters=iters)
            _sync(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(jnp.zeros(()), iters=iters)
                _sync(out)
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = best_of(10), best_of(40)
        per = max((t_hi - t_lo) / 30, 1e-9)
        print(f"{cell}: {per*1e3:.2f} ms  ({b/per:,.0f} windows/s)", flush=True)
        return

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_state = tx.init(params)

    def train_step(params, opt_state, dep):
        loss, grads = jax.value_and_grad(lambda p: fwd_loss(p, dep))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fl = (
        jax.jit(lambda p, o: train_step(p, o, jnp.zeros(())))
        .lower(params, opt_state).compile()
    )
    try:
        flops = fl.cost_analysis()["flops"]
        print(f"train cost-analysis: {flops/1e9:.1f} GFLOP", flush=True)
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", e, flush=True)

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(params, opt_state, iters):
        def body(c, _):
            p, o, acc = c
            p, o, loss = train_step(p, o, acc)
            return (p, o, acc + loss * 1e-30), None

        return jax.lax.scan(
            body, (params, opt_state, jnp.zeros(())), None, length=iters
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

    t_lo, t_hi = best_of(10), best_of(40)
    per = max((t_hi - t_lo) / 30, 1e-9)
    print(f"{cell}: {per*1e3:.2f} ms/step  {b/per:,.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()
