"""Driver-round-5 probe #47: STanHop ENCODER decomposition (probe46 put the
encoder at 3.65 ms = 63% of the 5.77 ms forward; the tbp-profile converter in
this image is version-broken, so decompose by scan-slope on truncated
models / isolated sublayers instead).

Cells (ETTh1 headline shape, B128, deterministic, current defaults):
  enc1 / enc2 / enc3   embed + first N encoder STHM scales (slope per scale)
  sthm0                one full STHM layer at scale-0 shape (B,7,28,256)
  ct0                  cross-time Hopfield alone at (896, 28, 256)
  cs0                  cross-series pooling+readout at (3584, 7, 256)
  mlp0                 MLP1 alone at (896, 28, 256)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "enc3"

    from outeffhop_tpu.models import common as mcommon
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, init_stanhop_params, stanhop_encoder, sthm_layer,
        hopfield, hopfield_pooling, _mlp,
    )
    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "| cell:", cell, flush=True)
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

    d, dm = cfg.data_dim, cfg.d_model
    seg0 = cfg.in_seg_num

    def embed(xi):
        bb = xi.shape[0]
        xs = xi.reshape(bb, seg0, cfg.seg_len, d).transpose(0, 3, 1, 2)
        h = mcommon.dense(params["enc_emb"], xs, NULL_QCTX, "enc_emb")
        h = h + params["enc_pos"].astype(h.dtype)
        return mcommon.layer_norm(params["pre_norm"], h, 1e-5)

    sp = params["encoder"][0]["sthm"]

    if cell.startswith("enc"):
        n = int(cell[3:])

        def fwd(xi):
            return stanhop_encoder(params["encoder"][:n], cfg, embed(xi))[-1]
    elif cell == "sthm0":
        def fwd(xi):
            return sthm_layer(sp, cfg, embed(xi))
    elif cell == "ct0":
        def fwd(xi):
            h = embed(xi).reshape(b * d, seg0, dm)
            return hopfield(sp["cross_time"], cfg, h, h, h)
    elif cell == "cs0":
        def fwd(xi):
            h = (embed(xi).reshape(b, d, seg0, dm)
                 .transpose(0, 2, 1, 3).reshape(b * seg0, d, dm))
            ph = hopfield_pooling(sp["cross_series"], cfg, h)
            return hopfield(sp["hopfield"], cfg, h, h, ph)
    elif cell == "mlp0":
        def fwd(xi):
            h = embed(xi).reshape(b * d, seg0, dm)
            return _mlp(sp["MLP1"], h, NULL_QCTX)
    else:
        raise SystemExit(f"unknown cell {cell}")

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(xi, iters):
        def body(c, _):
            out = fwd(c)
            dep = (jnp.max(jnp.abs(out)) > 1e30).astype(xi.dtype)
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
    print(f"stanhop47_{cell}: {per*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
