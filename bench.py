"""Headline benchmark: BERT-base softmax_1 MLM inference throughput (tokens/s).

The flagship config from the paper (BERT-base, softmax_1 attention, seq 128)
run in bf16 with the fused Pallas softmax_1 flash-attention kernel.
`vs_baseline` is the speedup over the same model with the unfused XLA
attention path (QK^T -> softmax_1 -> PV with the (B,H,T,T) score tensor
materialized), which is the reference's computation structure
(`bert_attention.py:222-292`) on this hardware.

Prints TWO JSON lines; the LAST is the headline
{"metric", "value", "unit", "vs_baseline"} line the round driver records.
The FIRST is a kernel-engaging guard: BERT-base clippedsoftmax1(-.025:1)
B16xT512 — the shape where the packed Pallas kernel with the fused
stretch-clip epilogue actually dispatches (the headline B32xS128 shape
routes BOTH cells to the same XLA program by the causal/size-aware gate, so
its vs_baseline is tunnel noise ~1.0 and cannot catch a kernel regression).
Its vs_baseline is pinned to the round-4 on-chip measurement (518,419 tok/s,
results/probe20_bert_flash.log): a silent Pallas/dispatch regression drops
that ratio well below 1.0 instead of hiding behind XLA-vs-XLA noise.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    # through the remote-TPU tunnel, block_until_ready returns before the
    # computation finishes; a host transfer is the only reliable fence
    return float(jnp.sum(x).astype(jnp.float32))


def _bench_scan(step_fn, ids0, lo=8, hi=40, repeats=5):
    """Time forwards INSIDE one jitted lax.scan with an argmax feedback
    dependence (prevents loop hoisting), at two scan lengths, and return the
    SLOPE (t_hi - t_lo) / (hi - lo). Each dispatch through the remote-TPU
    tunnel carries ~20-30 ms of fixed overhead (measured; a plain local
    dispatch is sub-ms) — the two-point fit cancels that intercept exactly,
    leaving pure on-device secs/step."""

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(ids, iters):
        def body(c, _):
            logits = step_fn(c)
            # cheap data dependence on the logits: enough to stop XLA from
            # hoisting the forward out of the loop, without adding a full
            # vocab-wide argmax reduction (~1.3 ms/step of pure harness cost)
            # to every timed iteration. The timed work is the complete MLM
            # forward, embeddings through vocab logits. A value comparison
            # (always-false at runtime, unprovable at compile time) cannot be
            # algebraically folded away, unlike the previous `sum * 0`.
            dep = (jnp.max(jnp.abs(logits[..., :8])) > 1e30).astype(jnp.int32)
            return c + dep, None

        out, _ = jax.lax.scan(body, ids, None, length=iters)
        return out

    def best_of(iters):
        _sync(loop(ids0, iters=iters))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(loop(ids0, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


# Round-4 on-chip measurement at the kernel-engaging shape (probe20):
# flash 518,419 tok/s vs XLA 352,304 tok/s (+47%). The guard line's
# vs_baseline is current/pinned — a kernel regression reads < ~0.9.
_KERNEL_GUARD_PINNED_TOKS = 518_419.0


def _bench_model(cfg_kwargs, batch, seq, use_flash, lo, hi):
    """Build a bf16 BERT MLM at `cfg_kwargs`, return (tokens/s, secs/step)."""
    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params

    cfg = BertConfig(**cfg_kwargs)

    @jax.jit
    def make_params(key):
        p = init_bert_params(key, cfg)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
            p,
            is_leaf=lambda x: x is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    input_ids = jnp.asarray(rs.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)

    def f(ids):
        return bert_mlm_forward(
            params, cfg, ids, mask, deterministic=True, use_flash=use_flash
        )

    t = _bench_scan(f, input_ids, lo=lo, hi=hi)
    return batch * seq / t, t


def kernel_guard_line(on_tpu):
    """BERT-base clippedsoftmax1 B16xT512: the packed-Pallas fused-epilogue
    shape. Two regression signals: `vs_baseline` pins against the round-4
    on-chip measurement (catches absolute drift; observed run-to-run band
    0.93-1.01 across processes — probe20 rerun adjudication, BASELINE.md),
    and `vs_xla` is the SAME-RUN flash/XLA ratio (immune to chip drift:
    healthy ~1.4-1.5; a kernel silently falling back to XLA reads ~1.0).
    CPU smoke: tiny shape, XLA both cells."""
    if on_tpu:
        batch, seq, layers, lo, hi = 16, 512, 12, 4, 16
    else:
        batch, seq, layers, lo, hi = 2, 128, 2, 1, 3
    cfg_kwargs = dict(
        num_hidden_layers=layers,
        attn_softmax="clippedsoftmax1(-.025:1)",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    toks, _ = _bench_model(cfg_kwargs, batch, seq, use_flash=on_tpu, lo=lo, hi=hi)
    toks_xla, _ = _bench_model(cfg_kwargs, batch, seq, use_flash=False, lo=lo, hi=hi)
    vs = toks / _KERNEL_GUARD_PINNED_TOKS if on_tpu else 1.0
    print(
        json.dumps(
            {
                "metric": "bert_base_clippedsoftmax1_T512_flash_guard",
                "value": round(toks, 1),
                "unit": "tokens/s",
                "vs_baseline": round(vs, 4),
                "vs_xla": round(toks / toks_xla, 4),
            }
        )
    )


def main():
    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params

    on_tpu = jax.default_backend() == "tpu"
    kernel_guard_line(on_tpu)
    if on_tpu:
        batch, seq, layers = 32, 128, 12
    else:  # CPU smoke: tiny shapes so the script always completes
        batch, seq, layers = 4, 128, 2

    cfg = BertConfig(
        num_hidden_layers=layers,
        attn_softmax="softmax1",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    # ONE jitted init on the device: eager init costs a dispatch round trip
    # per op (~100ms each through the remote tunnel — minutes for a model);
    # a single compiled graph leaves bf16 params device-resident, so the
    # benchmark jits capture on-device constants (no re-upload per compile).
    @jax.jit
    def make_params(key):
        p = init_bert_params(key, cfg)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
            p,
            is_leaf=lambda x: x is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    input_ids = jnp.asarray(rs.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)

    def fwd(use_flash):
        def f(ids):
            return bert_mlm_forward(
                params, cfg, ids, mask, deterministic=True, use_flash=use_flash
            )

        return f

    lo, hi = (8, 40) if on_tpu else (1, 3)
    t_base = _bench_scan(fwd(False), input_ids, lo=lo, hi=hi)
    t_flash = _bench_scan(fwd(on_tpu), input_ids, lo=lo, hi=hi)

    tokens_per_s = batch * seq / t_flash
    print(
        json.dumps(
            {
                "metric": "bert_base_softmax1_mlm_inference_bf16",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(t_base / t_flash, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
