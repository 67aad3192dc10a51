"""Round-4 probe #25: where does the train-step MFU go? (VERDICT r3 weak #5)

probe16 measured the BERT-base MLM train step (dropout ON, threefry PRNG) at
45.37 ms/step = 90,285 tok/s ~ 31% MFU, vs 73% MFU inference. Two suspects:

  (a) the backward+optimizer work itself (measure: deterministic step), and
  (b) dropout's random-bit generation — threefry2x32 is a long VPU
      instruction sequence per 32-bit word; the TPU has a hardware RNG that
      JAX exposes via the `rbg` key impl (lax.rng_bit_generator).

Matrix: {deterministic, dropout+threefry, dropout+rbg} x one shape
(BERT-base B32 S128, bf16 params, flash per dispatch gate). Scan-slope
timing as in probe21.
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


def bench_train(step_fn, state, batch, rng, lo=3, hi=9):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        def body(s, _):
            s2, loss = step_fn(s, batch, rng)
            return s2, loss

        s, losses = jax.lax.scan(body, state, None, length=iters)
        return s, losses[-1]

    def best_of(iters):
        _sync(loop(state, iters=iters)[1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(state, iters=iters)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    from outeffhop_tpu.models.bert import (
        BertConfig, bert_mlm_forward, init_bert_params, mlm_loss,
    )
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    cfg = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072, attn_softmax="softmax1",
    )
    params = jax.jit(lambda k: to_bf16(init_bert_params(k, cfg)))(jax.random.PRNGKey(0))
    b, t = 32, 128
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, t)), jnp.int32),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "labels": jnp.asarray(
            np.where(rs.rand(b, t) < 0.15, rs.randint(0, cfg.vocab_size, (b, t)), -100),
            jnp.int32,
        ),
    }
    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=1000, accum_steps=1)

    configs = [
        ("deterministic", True, jax.random.PRNGKey(1)),
        ("dropout+threefry", False, jax.random.PRNGKey(1)),
        ("dropout+rbg", False, jax.random.key(1, impl="rbg")),
    ]
    for name, det, rng in configs:
        def loss_fn(p, bt, r, det=det):
            logits = bert_mlm_forward(
                p, cfg, bt["input_ids"], bt["attention_mask"], dropout_rng=r,
                deterministic=det, use_flash=True,
            )
            return mlm_loss(logits, bt["labels"])

        step_fn = _make_train_step(loss_fn, tx)
        state = init_train_state(params, tx)
        per = bench_train(step_fn, state, batch, rng)
        tf = 3 * 926.7e9 / per / 1e12
        print(
            f"bert_base mlm train B{b} S{t} [{name}]: {per*1e3:.2f} ms/step  "
            f"{b*t/per:,.0f} tok/s  ~{tf:.1f} TFLOP/s ({tf/197*100:.0f}% bf16 peak)",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
