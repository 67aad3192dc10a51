"""Round-6 probe #39: STanHop-Net train-step throughput on chip — the one
model family with no perf row in BASELINE.md (the reference never measures
throughput at all, `exp_stanhop.py:245-247` iter prints only).

ETTh1 headline shape (README.md:162-208 command set): in 168, out 24,
seg 6, win 2, factor 10, d_model 256, d_ff 512, heads 4, e_layers 3,
batch 128, dropout 0.2. Cells: f32 | bf16 (param dtype).
State-carried scan over (params, opt_state), slope-timed.
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
    cell = sys.argv[1] if len(sys.argv) > 1 else "f32"
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
    if cell == "bf16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x is not None and x.dtype == jnp.float32 else x,
            params, is_leaf=lambda x: x is None,
        )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, cfg.in_len, cfg.data_dim), jnp.float32)
    y = jnp.asarray(rs.randn(b, cfg.out_len, cfg.data_dim), jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_state = tx.init(params)
    rng = (jax.random.key(1, impl="rbg")
           if jax.default_backend() == "tpu" else jax.random.PRNGKey(1))

    def train_step(params, opt_state, rng):
        def loss_fn(p):
            pred = stanhop_forward(p, cfg, x, dropout_rng=rng,
                                   deterministic=False)
            return jnp.mean((pred.astype(jnp.float32) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(params, opt_state, iters):
        def body(c, _):
            p, o, acc = c
            p, o, loss = train_step(p, o, rng)
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

    n_lo, n_hi = (10, 40) if jax.default_backend() == "tpu" else (2, 4)
    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    per = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    print(f"stanhop_{cell}: {per*1e3:.2f} ms/step  {b/per:,.0f} windows/s",
          flush=True)


if __name__ == "__main__":
    main()
