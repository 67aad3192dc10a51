"""Round-5 probe #28: WHERE does the train step spend its time?

BERT-base B32 S128 deterministic trains at 28.5 ms/step = 49% MFU while
inference runs at 73% (BASELINE.md round-4 tables). fwd+bwd ~ 3x fwd FLOPs
would predict ~19.5 ms at inference efficiency. This probe decomposes the
step on chip (scan-slope method, CLAUDE.md):

  fwd        loss value only (no grad)
  grad       value_and_grad, grads reduced to a scalar (no optimizer traffic)
  gradmat    value_and_grad, grads materialized into the carry (forces HBM
             writes of the full grad pytree, still no optimizer math)
  adamw      full step minus grad clipping
  full       clip(1.0) + adamw (the shipped recipe)  -- expect ~28.5 ms
  cheaploss  value_and_grad with xent replaced by a gather-mean
             (isolates the log_softmax fwd+bwd cost over the 30522 vocab)
  trunkloss  value_and_grad with the MLM head skipped entirely
             (isolates head matmul + xent together)
  lseloss    value_and_grad with the CANDIDATE loss: logsumexp-based nll
             (no full (B,S,V) f32 log_softmax materialization in fwd)

All deterministic (dropout off) to match the 49% row.
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


def bench_scan(make_body, init_carry, lo=3, hi=9):
    """make_body(carry, i) -> carry with a data dependence; slope-timed."""

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(carry, iters):
        carry = jax.lax.scan(make_body, carry, None, length=iters)[0]
        return carry

    def best_of(iters):
        out = loop(init_carry, iters=iters)
        _sync(jax.tree.leaves(out)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(init_carry, iters=iters)
            _sync(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    from outeffhop_tpu.models.bert import (
        BertConfig, bert_embeddings, bert_encoder, bert_mlm_forward,
        init_bert_params, mlm_loss,
    )
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    tiny = "--tiny" in sys.argv
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    if tiny:
        cfg = BertConfig(
            attn_softmax="softmax1", num_hidden_layers=2, hidden_size=64,
            num_attention_heads=2, intermediate_size=128, vocab_size=512,
        )
    else:
        cfg = BertConfig(attn_softmax="softmax1")
    params = jax.jit(lambda k: to_bf16(init_bert_params(k, cfg)))(
        jax.random.PRNGKey(0)
    )
    b, s = (4, 16) if tiny else (32, 128)
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
    }

    def fwd_logits(p):
        return bert_mlm_forward(
            p, cfg, batch["input_ids"], None, deterministic=True
        )

    def loss_xent(p):
        return mlm_loss(fwd_logits(p), batch["labels"])

    def loss_cheap(p):
        logits = fwd_logits(p)
        picked = jnp.take_along_axis(
            logits, batch["labels"][..., None], axis=-1
        )[..., 0]
        return -jnp.mean(picked.astype(jnp.float32))

    def loss_trunk(p):
        x = bert_embeddings(
            p["embeddings"], cfg, batch["input_ids"], None, deterministic=True
        )
        x = bert_encoder(p, cfg, x, None, deterministic=True)
        return jnp.mean(x.astype(jnp.float32) ** 2)

    def loss_lse(p):
        logits = fwd_logits(p)
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1
        )
        picked = jnp.take_along_axis(
            logits, batch["labels"][..., None], axis=-1
        )[..., 0].astype(jnp.float32)
        return jnp.mean(lse - picked)

    # ---- fwd only -------------------------------------------------------
    def fwd_body(carry, _):
        acc, p = carry
        return (acc + loss_xent(p), p), None

    t = bench_scan(fwd_body, (jnp.zeros((), jnp.float32), params))
    print(f"fwd        {t*1e3:8.2f} ms")

    # ---- grad, scalar-reduced ------------------------------------------
    def make_grad_body(loss_fn):
        def body(carry, _):
            acc, p = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            gsum = sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)
            )
            return (acc + loss + gsum * 1e-30, p), None
        return body

    for name, fn in (
        ("grad", loss_xent),
        ("cheaploss", loss_cheap),
        ("trunkloss", loss_trunk),
        ("lseloss", loss_lse),
    ):
        t = bench_scan(make_grad_body(fn), (jnp.zeros((), jnp.float32), params))
        print(f"{name:10s} {t*1e3:8.2f} ms")

    # ---- grad with the embedding tables frozen --------------------------
    # isolates the (vocab, H) scatter-add backward of the word embedding
    def loss_froz(rest, emb):
        p = dict(rest)
        p["embeddings"] = emb
        return loss_xent(p)

    emb = params["embeddings"]
    rest = {k: v for k, v in params.items() if k != "embeddings"}

    def froz_body(carry, _):
        acc, r = carry
        loss, g = jax.value_and_grad(loss_froz)(r, emb)
        gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
        return (acc + loss + gsum * 1e-30, r), None

    t = bench_scan(froz_body, (jnp.zeros((), jnp.float32), rest))
    print(f"frozemb    {t*1e3:8.2f} ms")

    # ---- grad, materialized into the carry ------------------------------
    def gradmat_body(carry, _):
        p = carry
        _, g = jax.value_and_grad(loss_xent)(p)
        # carry = params + eps*grads forces every grad leaf to be written
        return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g), None

    t = bench_scan(gradmat_body, params)
    print(f"gradmat    {t*1e3:8.2f} ms")

    # ---- optimizer variants --------------------------------------------
    for name, clip in (("adamw", None), ("full", 1.0)):
        tx = make_adamw(
            params, lr=1e-4, warmup_steps=10, total_steps=1000,
            clip_norm=clip, accum_steps=1,
        )
        step_fn = _make_train_step(lambda p, bt, r: loss_xent(p), tx)
        state = init_train_state(params, tx)
        rng = jax.random.PRNGKey(1)

        def opt_body(carry, _, step_fn=step_fn):
            s, acc = carry
            s2, loss = step_fn(s, batch, rng)
            return (s2, acc + loss), None

        t = bench_scan(opt_body, (state, jnp.zeros((), jnp.float32)))
        print(f"{name:10s} {t*1e3:8.2f} ms")

    # ---- candidate: full step with lse loss -----------------------------
    tx = make_adamw(
        params, lr=1e-4, warmup_steps=10, total_steps=1000,
        clip_norm=1.0, accum_steps=1,
    )
    step_fn = _make_train_step(lambda p, bt, r: loss_lse(p), tx)
    state = init_train_state(params, tx)
    rng = jax.random.PRNGKey(1)

    def lse_body(carry, _):
        s, acc = carry
        s2, loss = step_fn(s, batch, rng)
        return (s2, acc + loss), None

    t = bench_scan(lse_body, (state, jnp.zeros((), jnp.float32)))
    tok = b * s / t
    print(f"full+lse   {t*1e3:8.2f} ms   {tok:,.0f} tok/s")

    # numerical parity of the candidate loss
    l1 = float(loss_xent(params))
    l2 = float(loss_lse(params))
    print(f"loss parity: xent={l1:.6f} lse={l2:.6f} |d|={abs(l1-l2):.2e}")


if __name__ == "__main__":
    main()
