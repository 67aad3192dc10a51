"""Round-6 probe #38: BERT-base MLM train step — fused clip+adamw and
uint8 dropout thresholds, A/B'd as a subprocess matrix (CLAUDE.md rule).

Cells (prefix opt_ runs the OPT-125m B8xT512 CLM step instead):
  det_chain    deterministic, optax chain clip+adamw      (control ~27.2 ms)
  det_fused    deterministic, fused_clip_adamw
  drop_ch32    dropout 0.1 rbg, 32-bit thresholds, chain  (control ~29.7 ms)
  drop_ch8     dropout 0.1 rbg, uint8 thresholds, chain
  drop_fu8     dropout 0.1 rbg, uint8 thresholds, fused

State-carried scan (TrainState is the carry — hoist-safe), slope-timed
best-of-3 at two lengths.
"""

import functools
import os
import sys
import time

SMOKE = bool(os.environ.get("OEH_PROBE_SMOKE"))  # tiny shapes, CPU correctness only

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
    cellname = sys.argv[1]
    model = "opt" if cellname.startswith("opt_") else "bert"
    mode = cellname.split("_", 1)[-1] if model == "opt" else cellname
    fused = mode.endswith("fused") or mode.endswith("fu8")
    dropout_on = mode.startswith("drop")
    rng_bits = 8 if mode.endswith("8") else 32

    import outeffhop_tpu.models.common as common

    common.set_dropout_rng_bits(rng_bits)

    from outeffhop_tpu.models.bert import (
        BertConfig, bert_mlm_forward, init_bert_params, mlm_loss,
    )
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    drop = 0.1 if dropout_on else 0.0
    if model == "opt":
        from outeffhop_tpu.models.opt import (
            OPTConfig, clm_loss, init_opt_params, opt_forward,
        )

        if SMOKE:
            cfg = OPTConfig(attn_softmax="softmax1", dropout=drop,
                            vocab_size=128, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            ffn_dim=64)
            b, s = 2, 16
        else:
            cfg = OPTConfig(attn_softmax="softmax1", dropout=drop)
            b, s = 8, 512
        params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)))(
            jax.random.PRNGKey(0)
        )
    else:
        if SMOKE:
            cfg = BertConfig(attn_softmax="softmax1",
                             hidden_dropout_prob=drop,
                             attention_probs_dropout_prob=drop,
                             vocab_size=128, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=2,
                             intermediate_size=64)
            b, s = 2, 16
        else:
            cfg = BertConfig(attn_softmax="softmax1",
                             hidden_dropout_prob=drop,
                             attention_probs_dropout_prob=drop)
            b, s = 32, 128
        params = jax.jit(lambda k: to_bf16(init_bert_params(k, cfg)))(
            jax.random.PRNGKey(0)
        )
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
    }

    def loss_fn(p, bt, r):
        if model == "opt":
            logits, _ = opt_forward(
                p, cfg, bt["input_ids"], deterministic=not dropout_on,
                dropout_rng=r,
                use_flash=jax.default_backend() == "tpu",
            )
            return clm_loss(logits[:, :-1], bt["labels"][:, 1:])
        logits = bert_mlm_forward(
            p, cfg, bt["input_ids"], None, deterministic=not dropout_on,
            dropout_rng=r,
        )
        return mlm_loss(logits, bt["labels"])

    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=1000,
                    clip_norm=1.0, accum_steps=1, fused=fused)
    step_fn = _make_train_step(loss_fn, tx)
    state = init_train_state(params, tx)
    rng = (jax.random.key(1, impl="rbg")
           if jax.default_backend() == "tpu" else jax.random.PRNGKey(1))

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        def body(sc, _):
            s, acc = sc
            s2, loss = step_fn(s, batch, rng)
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
    tok = b * s / per
    print(f"{cellname}: {per*1e3:.2f} ms/step  {tok:,.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
