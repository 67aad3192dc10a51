"""Matmul-peak proxies + head/embed/LN timings (scratch, run on the chip)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step_fn, x0, iters=50, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    _sync(loop(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(loop(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from outeffhop_tpu.models import common
    from outeffhop_tpu.models.bert import BertConfig, bert_embeddings, init_bert_params

    B, T = 32, 128
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, T, 768), jnp.bfloat16)
    x2 = x0.reshape(B * T, 768)

    def rep(name, t, flops=None):
        extra = f"  {flops / t / 1e12:7.1f} TF/s" if flops else ""
        print(f"{name:26s} {t*1e3:8.3f} ms{extra}", flush=True)

    W1 = jnp.asarray(rs.randn(768, 3072) * 0.02, jnp.bfloat16)
    W2 = jnp.asarray(rs.randn(3072, 768) * 0.02, jnp.bfloat16)
    t = bench_scan(lambda c: (c @ W1) @ W2, x2)
    rep("ffn_pair", t, 2 * 2 * B * T * 768 * 3072)

    Wq = jnp.asarray(rs.randn(768, 768) * 0.02, jnp.bfloat16)
    Wo = jnp.asarray(rs.randn(768, 768) * 0.02, jnp.bfloat16)
    t = bench_scan(lambda c: (c @ Wq) @ Wo, x2)
    rep("sq_pair", t, 2 * 2 * B * T * 768 * 768)

    W3 = jnp.asarray(rs.randn(768, 2304) * 0.02, jnp.bfloat16)
    W4 = jnp.asarray(rs.randn(2304, 768) * 0.02, jnp.bfloat16)
    t = bench_scan(lambda c: (c @ W3) @ W4, x2)
    rep("qkv_pair", t, 2 * 2 * B * T * 768 * 2304)

    # transposed-weight variant (the model stores (out,in) and does x @ w.T)
    t = bench_scan(lambda c: (c @ W1.T.T) @ W2, x2)  # no-op check
    W1t = jnp.asarray(np.asarray(W1).T)  # (3072,768) stored, used as x @ w.T
    W2t = jnp.asarray(np.asarray(W2).T)
    t = bench_scan(lambda c: (c @ W1t.T) @ W2t.T, x2)
    rep("ffn_pair_wT", t, 2 * 2 * B * T * 768 * 3072)

    # head decoder matmul (4096,768)@(768,30522)
    Wd = jnp.asarray(rs.randn(30522, 768) * 0.02, jnp.bfloat16)

    def head(c):
        lo = c @ Wd.T
        return c + (jnp.sum(lo[..., :8]) * 0).astype(c.dtype)

    t = bench_scan(head, x2, iters=20)
    rep("head_decoder", t, 2 * B * T * 768 * 30522)

    # head + argmax
    def head_am(c):
        lo = c @ Wd.T
        am = jnp.argmax(lo, -1)
        return c + (jnp.sum(am) * 0).astype(c.dtype)

    t = bench_scan(head_am, x2, iters=20)
    rep("head_decoder+argmax", t, 2 * B * T * 768 * 30522)

    # LN stack
    lnp = {"weight": jnp.ones((768,), jnp.bfloat16), "bias": jnp.zeros((768,), jnp.bfloat16)}

    def ln_stack(c):
        for _ in range(24):
            c = common.layer_norm(lnp, c, 1e-12)
        return c

    t = bench_scan(ln_stack, x0)
    rep("ln24_stack", t)

    # gelu+bias on (4096,3072)
    b1 = jnp.zeros((3072,), jnp.bfloat16)

    def ffn_gelu(c):
        return (common.gelu(c @ W1 + b1)) @ W2

    t = bench_scan(ffn_gelu, x2)
    rep("ffn_pair+bias+gelu", t, 2 * 2 * B * T * 768 * 3072)

    # embeddings
    cfg = BertConfig(num_hidden_layers=1, hidden_dropout_prob=0.0)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
        params,
        is_leaf=lambda x: x is None,
    )
    ids = jnp.asarray(rs.randint(0, cfg.vocab_size, (B, T)), jnp.int32)

    def emb_only(i):
        e = bert_embeddings(params["embeddings"], cfg, i, deterministic=True)
        return i + (jnp.sum(e[..., :4]) * 0).astype(jnp.int32)

    t = bench_scan(emb_only, ids, iters=20)
    rep("embeddings_only", t)


if __name__ == "__main__":
    main()
