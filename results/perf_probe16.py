"""Round-3 probe #11: BERT-base MLM TRAIN-step throughput on chip (fwd+bwd+
AdamW+clip, bf16 params, B32 S128 — the reference's pretraining config at
`submit_outlier_bert.sh:35-62` scaled to one chip). BASELINE so far covers
inference only; the reference's main workload is 200k pretraining steps.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    from outeffhop_tpu.models.bert import BertConfig, init_bert_params
    from outeffhop_tpu.parallel.train import init_train_state, make_adamw

    batch, seq = 32, 128
    cfg = BertConfig(attn_softmax="softmax1")

    @jax.jit
    def make_params(key):
        p = init_bert_params(key, cfg)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x is not None and x.dtype == jnp.float32
            else x,
            p, is_leaf=lambda x: x is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=100_000)
    state = init_train_state(params, tx)

    from outeffhop_tpu.models.bert import bert_mlm_forward, mlm_loss
    from outeffhop_tpu.parallel.train import _make_train_step

    def loss_fn(p, b, rng):
        logits = bert_mlm_forward(
            p, cfg, b["input_ids"], b["attention_mask"],
            dropout_rng=rng, deterministic=False, use_flash=True,
        )
        return mlm_loss(logits, b["labels"])

    step_fn = _make_train_step(loss_fn, tx)  # unjitted: scanned below

    rs = np.random.RandomState(0)
    batch_d = {
        "input_ids": jnp.asarray(
            rs.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32
        ),
        "attention_mask": jnp.ones((batch, seq), jnp.int32),
        "labels": jnp.asarray(
            np.where(rs.rand(batch, seq) < 0.15,
                     rs.randint(0, cfg.vocab_size, (batch, seq)), -100),
            jnp.int32,
        ),
    }
    rng = jax.random.PRNGKey(1)

    # K optimizer steps INSIDE one jit (state threaded through the scan carry
    # gives the data dependence; per-dispatch tunnel latency cancels in the
    # two-point slope)
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        def body(s, _):
            s2, loss = step_fn(s, batch_d, rng)
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

    t_lo, t_hi = best_of(4), best_of(12)
    per = (t_hi - t_lo) / 8
    print(
        f"bert_base mlm train step B{batch} S{seq} bf16+flash: "
        f"{per*1e3:.2f} ms/step  {batch*seq/per:,.0f} tokens/s",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    main()
