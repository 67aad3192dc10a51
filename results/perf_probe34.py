"""Round-5 probe #34: the REALISTIC BERT-base MLM train config after the
round-5 loss fix — dropout 0.1 with the rbg hardware PRNG (the driver's TPU
default) + logsumexp loss. Refreshes BASELINE's training table (round-4 row:
31.37 ms / 130,588 tok/s with the old log_softmax loss).
"""

import functools
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


def main():
    from outeffhop_tpu.drivers.common import dropout_key
    from outeffhop_tpu.models.bert import (
        BertConfig, bert_mlm_forward, init_bert_params, mlm_loss,
    )
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    cfg = BertConfig(attn_softmax="softmax1")  # dropout defaults 0.1
    params = jax.jit(lambda k: to_bf16(init_bert_params(k, cfg)))(
        jax.random.PRNGKey(0)
    )
    b, s = 32, 128
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
    }

    def loss_fn(p, bt, r):
        logits = bert_mlm_forward(
            p, cfg, bt["input_ids"], None, dropout_rng=r, deterministic=False
        )
        return mlm_loss(logits, bt["labels"])

    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=1000,
                    clip_norm=1.0, accum_steps=1)
    step_fn = _make_train_step(loss_fn, tx)
    state = init_train_state(params, tx)
    rng = dropout_key(0, "rbg")

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        def body(sc, _):
            st, acc = sc
            s2, loss = step_fn(st, batch, rng)
            return (s2, acc + loss), None

        return jax.lax.scan(body, (state, jnp.zeros((), jnp.float32)), None,
                            length=iters)[0]

    def best_of(iters):
        out = loop(state, iters=iters)
        _sync(out[1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(state, iters=iters)
            _sync(out[1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(3), best_of(9)
    per = max((t_hi - t_lo) / 6, 1e-9)
    print(f"bert train dropout0.1+rbg+lse: {per*1e3:.2f} ms/step  "
          f"{b*s/per:,.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
