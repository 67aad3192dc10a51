"""Driver-round-5 probe #46: STanHop forward push past the pool-shared win
(VERDICT r4 item 2 — "think layout/batching restructuring").

New candidate `_DEC0_SHARED_STHM`: decoder layer 0's STHM input is the
dec_pos bank broadcast over the batch, so under a deterministic forward the
whole first STHM call is batch-constant — compute one row, broadcast back.
Same batch-redundancy family as probe43's pool-shared keys.

Cells (ETTh1 headline shape, B128, pool-shared ON everywhere):
  infer_base   deterministic forward, _DEC0_SHARED_STHM off   (6.14 ms ref)
  infer_dec0   deterministic forward, flag on
  enc_only     embed + encoder only (decomposition: decoder = full - this)
  traind_base  deterministic train step, flag off
  traind_dec0  deterministic train step, flag on
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
    cell = sys.argv[1] if len(sys.argv) > 1 else "infer_base"

    import outeffhop_tpu.models.stanhop as sh
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, init_stanhop_params, stanhop_forward, stanhop_encoder,
    )
    from outeffhop_tpu.models import common as mcommon

    sh._DEC0_SHARED_STHM = cell.endswith("dec0")
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "| cell:", cell, "| _DEC0_SHARED_STHM:", sh._DEC0_SHARED_STHM,
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

    if cell.startswith("traind"):
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
        if cell == "enc_only":
            def fwd(xi):
                bb = xi.shape[0]
                d = cfg.data_dim
                xs = xi.reshape(bb, cfg.in_seg_num, cfg.seg_len, d).transpose(0, 3, 1, 2)
                from outeffhop_tpu.quant.calibrate import NULL_QCTX
                h = mcommon.dense(params["enc_emb"], xs, NULL_QCTX, "enc_emb")
                h = h + params["enc_pos"].astype(h.dtype)
                h = mcommon.layer_norm(params["pre_norm"], h, 1e-5)
                outs = stanhop_encoder(params["encoder"], cfg, h)
                return outs[-1]
        else:
            def fwd(xi):
                return stanhop_forward(params, cfg, xi)

        @functools.partial(jax.jit, static_argnames="iters")
        def loop(xi, iters):
            def body(c, _):
                pred = fwd(c)
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
    print(f"stanhop_{cell}: {per*1e3:.3f} ms/step  {b/per:,.0f} windows/s",
          flush=True)


if __name__ == "__main__":
    main()
