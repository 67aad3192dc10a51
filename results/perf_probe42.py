"""Round-7 probe #42: quantized STanHop inference throughput on chip — the
forecaster family's first INT8 perf row (BASELINE.md has train/fwd FP rows
from probe39/40; the reference's quantized-STanHop code is absent upstream,
`OutEffHop/STanHop_outlier/` is empty).

ETTh1 headline shape (in 168, out 24, seg 6, win 2, factor 10, d_model 256,
d_ff 512, heads 4, e_layers 3, batch 128, deterministic eval forward).

Cells:
  fp32      — plain forward
  sim       — fake-quant W8A8 simulation (what --quantize measures)
  int8      — real int8xint8->int32 MXU execution (--execute_int8)

Harness: forward-only scan. The body's INPUT is threaded through the carry
with an always-false value comparison (bench.py:_bench_scan pattern) so XLA
cannot hoist the loop-invariant forward (probe28 trap).
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
    cell = sys.argv[1] if len(sys.argv) > 1 else "fp32"
    from outeffhop_tpu.drivers.common import build_quant_ctx
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, init_stanhop_params, stanhop_forward,
    )
    from outeffhop_tpu.quant.calibrate import NULL_QCTX
    from outeffhop_tpu.quant.config import QuantizedModelConfig

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    if jax.default_backend() == "tpu":
        cfg = STanHopConfig(
            data_dim=7, in_len=168, out_len=24, seg_len=6, win_size=2,
            factor=10, d_model=256, d_ff=512, n_heads=4, e_layers=3,
            dropout=0.0, mode="softmax1",
        )
        b = 128
    else:  # CPU smoke: tiny shapes, same code paths
        cfg = STanHopConfig(
            data_dim=7, in_len=24, out_len=12, seg_len=6, win_size=2,
            factor=4, d_model=16, d_ff=32, n_heads=2, e_layers=2,
            dropout=0.0, mode="softmax1",
        )
        b = 8
    params = jax.jit(lambda k: init_stanhop_params(k, cfg))(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, cfg.in_len, cfg.data_dim), jnp.float32)

    qctx = NULL_QCTX
    if cell in ("sim", "int8"):
        calib = [
            jnp.asarray(rs.randn(b, cfg.in_len, cfg.data_dim), jnp.float32)
            for _ in range(4)
        ]
        qctx = build_quant_ctx(
            lambda bt, q: stanhop_forward(params, cfg, bt, q=q),
            QuantizedModelConfig(est_num_batches=4),
            calib,
            execute_int8=(cell == "int8"),
        )

    def fwd(xi):
        return stanhop_forward(params, cfg, xi, q=qctx)

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

    n_lo, n_hi = (10, 40) if jax.default_backend() == "tpu" else (2, 4)
    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    per = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    print(f"stanhop_infer_{cell}: {per*1e3:.3f} ms/step  {b/per:,.0f} windows/s",
          flush=True)


if __name__ == "__main__":
    main()
