"""Round-5 probe #31: full BERT-base MLM train step with the two backward
fixes probe28 motivated, A/B'd at every combination (subprocess matrix —
CLAUDE.md A/B rule):

  embed  = one-hot-MXU-matmul embedding backward (common._EMBED_MATMUL_BWD)
           vs jnp.take's scatter-add
  lse    = logsumexp-based MLM loss (no (B,S,V) f32 log_softmax
           materialization) vs jax.nn.log_softmax + gather

Cell ids: base, embed, lse, both.  Control (base) reproduces probe21's
28.5 ms deterministic row. State-carried scan (real dependence), slope-timed.
"""

import functools
import os
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


def main():
    cellname = sys.argv[1]
    model = "opt" if cellname.startswith("opt_") else "bert"
    mode = cellname.split("_", 1)[-1] if model == "opt" else cellname
    use_embed = mode in ("embed", "both")
    use_lse = mode in ("lse", "both", "flat")  # flat cell = shipped loss + flat opt
    use_flat = mode == "flat"

    import outeffhop_tpu.models.common as common

    common._EMBED_MATMUL_BWD = use_embed

    from outeffhop_tpu.models.bert import (
        BertConfig, bert_mlm_forward, init_bert_params,
    )
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    if model == "opt":
        from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)
        params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)))(
            jax.random.PRNGKey(0)
        )
        b, s = 8, 512
    else:
        cfg = BertConfig(attn_softmax="softmax1")
        params = jax.jit(lambda k: to_bf16(init_bert_params(k, cfg)))(
            jax.random.PRNGKey(0)
        )
        b, s = 32, 128
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
    }

    def loss_lse(logits, labels):
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(
            logits, labels[..., None], axis=-1
        )[..., 0].astype(jnp.float32)
        return jnp.mean(lse - picked)

    def loss_old(logits, labels):
        # the pre-round-5 mlm_loss formulation, inlined so this probe stays
        # a valid A/B after the library switches to the lse form
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def loss_fn(p, bt, r):
        if model == "opt":
            logits, _ = opt_forward(
                p, cfg, bt["input_ids"], deterministic=True,
                use_flash=jax.default_backend() == "tpu",
            )
            logits, labels = logits[:, :-1], bt["labels"][:, 1:]
        else:
            logits = bert_mlm_forward(
                p, cfg, bt["input_ids"], None, deterministic=True
            )
            labels = bt["labels"]
        if use_lse:
            return loss_lse(logits, labels)
        return loss_old(logits, labels)

    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=1000,
                    clip_norm=1.0, accum_steps=1, flat=use_flat)
    step_fn = _make_train_step(loss_fn, tx)
    state = init_train_state(params, tx)
    rng = jax.random.PRNGKey(1)

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
    if model == "bert":
        flops = 3 * 926.7e9  # fwd 926.7 GFLOP (bench.py cost analysis), bwd ~2x
        print(f"{cellname}: {per*1e3:.2f} ms/step  {tok:,.0f} tok/s  "
              f"~{flops/per/1e12:.1f} TFLOP/s "
              f"({flops/per/197e12*100:.0f}% bf16 peak)", flush=True)
    else:
        print(f"{cellname}: {per*1e3:.2f} ms/step  {tok:,.0f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
