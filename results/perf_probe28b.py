"""Round-5 probe #28b: train-step breakdown, grad-family rows REDONE with a
real loop-carried dependence.

probe28's fwd row came back 0.23 ms — XLA hoisted the loop-invariant forward
out of the scan (the body only fed a scalar accumulator). Here every body
computes from `ids` carried through the scan and feeds back an always-false
comparison on its outputs (bench.py:_bench_scan pattern), so nothing hoists.

Rows:
  fwd        MLM loss value only
  grad       value_and_grad (grads feed the dep, not materialized to HBM)
  cheaploss  grad with xent replaced by a gather-mean (no log_softmax)
  trunkloss  grad with the MLM head skipped entirely
  lseloss    grad with the CANDIDATE logsumexp-based nll
  frozemb    grad with embedding tables frozen (no vocab-table scatter-add)
The optimizer rows (adamw/full/full+lse) come from probe28 — their carry is
the TrainState, a real dependence already.
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


def bench_ids_scan(make_out, ids0, lo=3, hi=9):
    """make_out(ids) -> scalar-ish output; body: ids' = ids + (out > 1e30)."""

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(ids, iters):
        def body(c, _):
            out = make_out(c)
            dep = (out > 1e30).astype(jnp.int32)
            return c + dep, None

        return jax.lax.scan(body, ids, None, length=iters)[0]

    def best_of(iters):
        _sync(loop(ids0, iters=iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(ids0, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    from outeffhop_tpu.models.bert import (
        BertConfig, bert_embeddings, bert_encoder, bert_mlm_forward,
        init_bert_params, mlm_loss,
    )

    tiny = "--tiny" in sys.argv
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
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
    ids0 = jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32)
    labels = jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32)

    def fwd_logits(p, ids):
        return bert_mlm_forward(p, cfg, ids, None, deterministic=True)

    def loss_xent(p, ids):
        return mlm_loss(fwd_logits(p, ids), labels)

    def loss_cheap(p, ids):
        logits = fwd_logits(p, ids)
        picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        return -jnp.mean(picked.astype(jnp.float32))

    def loss_trunk(p, ids):
        x = bert_embeddings(p["embeddings"], cfg, ids, None, deterministic=True)
        x = bert_encoder(p, cfg, x, None, deterministic=True)
        return jnp.mean(x.astype(jnp.float32) ** 2)

    def loss_lse(p, ids):
        logits = fwd_logits(p, ids)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(
            logits, labels[..., None], axis=-1
        )[..., 0].astype(jnp.float32)
        return jnp.mean(lse - picked)

    t = bench_ids_scan(lambda ids: loss_xent(params, ids), ids0)
    print(f"fwd        {t*1e3:8.2f} ms", flush=True)

    def grad_out(loss_fn):
        def out(ids):
            loss, g = jax.value_and_grad(loss_fn)(params, ids)
            gsum = sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)
            )
            return jnp.abs(loss) + jnp.abs(gsum) * 1e-30
        return out

    for name, fn in (
        ("grad", loss_xent),
        ("cheaploss", loss_cheap),
        ("trunkloss", loss_trunk),
        ("lseloss", loss_lse),
    ):
        t = bench_ids_scan(grad_out(fn), ids0)
        print(f"{name:10s} {t*1e3:8.2f} ms", flush=True)

    # embedding tables frozen
    emb = params["embeddings"]
    rest = {k: v for k, v in params.items() if k != "embeddings"}

    def loss_froz(r, ids):
        p = dict(r)
        p["embeddings"] = emb
        return loss_xent(p, ids)

    def froz_out(ids):
        loss, g = jax.value_and_grad(loss_froz)(rest, ids)
        gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
        return jnp.abs(loss) + jnp.abs(gsum) * 1e-30

    t = bench_ids_scan(froz_out, ids0)
    print(f"frozemb    {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
