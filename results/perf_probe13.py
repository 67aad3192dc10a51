"""Round-3 probe #8: end-to-end REAL-INT8 BERT inference vs bf16 (VERDICT #4
"an end-to-end --execute_int8 BERT eval measurably faster than bf16").

BERT-base B32 S128, synthetic weights: all dense matmuls as int8x int8->int32
MXU ops with dynamic per-tensor activation quantization (quant/int8_exec.py)
vs the plain bf16 forward. Scan-timed tokens/s for both.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=8, hi=40, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(ids, iters):
        def body(c, _):
            logits = step(c)
            dep = (jnp.max(jnp.abs(logits[..., :8])) > 1e30).astype(jnp.int32)
            return c + dep, None

        out, _ = jax.lax.scan(body, ids, None, length=iters)
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
    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params
    from outeffhop_tpu.quant import QuantCtx, ScopedQuantCtx, default_quant_config
    from outeffhop_tpu.quant.calibrate import compute_weight_qparams
    from outeffhop_tpu.quant.int8_exec import build_int8_dense_map

    batch, seq = 32, 128
    cfg = BertConfig(
        attn_softmax="softmax1",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    # ONE jitted init on the device (eager init = a tunnel round trip per op;
    # host-resident params = hundreds of MB of executable constants uploaded
    # per benchmark compile — both measured pathological, see CLAUDE.md)
    @jax.jit
    def make_params(key):
        p = init_bert_params(key, cfg)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
            p, is_leaf=lambda x: x is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)

    # discover dense sites + freeze int8 weights (weights-only: act sites off,
    # so the flash/XLA attention fast paths stay on — the serving config).
    # Discovery runs EAGERLY (python-side site recording), so pin it to the
    # in-process CPU device — through the remote tunnel each of the ~hundreds
    # of eager ops costs ~100ms of dispatch latency and the probe times out.
    qcfg = default_quant_config(quantize_acts=False, per_channel_weights=True)
    # trace-based discovery: zero device execution (QuantCtx.trace_discovery)
    dctx = QuantCtx.trace_discovery(
        qcfg,
        lambda b, q: bert_mlm_forward(params, cfg, b, mask[:1], q=q),
        ids[:1],
    )
    wq = compute_weight_qparams(dctx.discovered_weights, qcfg)
    int8_map = build_int8_dense_map(dctx.discovered_weights, wq)
    print(f"int8 dense sites: {len(int8_map)}", flush=True)
    rctx = ScopedQuantCtx(QuantCtx.run(qcfg, {}, {}, int8_dense=int8_map), "")

    def bf16_step(c):
        return bert_mlm_forward(params, cfg, c, mask, deterministic=True, use_flash=True)

    def int8_step(c):
        return bert_mlm_forward(
            params, cfg, c, mask, deterministic=True, use_flash=True, q=rctx
        )

    t_bf = bench_scan(bf16_step, ids)
    t_i8 = bench_scan(int8_step, ids)
    print(
        f"bf16 {batch*seq/t_bf:,.0f} tok/s ({t_bf*1e3:.2f} ms)   "
        f"int8 {batch*seq/t_i8:,.0f} tok/s ({t_i8*1e3:.2f} ms)   "
        f"int8_speedup {t_bf/t_i8:.3f}x",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
