"""Component-level timing probe for the headline bench config (scratch).

Times each piece of the BERT-base softmax1 forward (B32 x S128, bf16) with
the same in-jit scan methodology as bench.py, on whatever the default
backend is (run on the real chip).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def report(name, t):
    print(f"{name:28s} {t*1e3:8.3f} ms", flush=True)


def bench_scan(step_fn, x0, iters=20, repeats=3):
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
    from outeffhop_tpu.models.bert import (
        BertConfig,
        bert_embeddings,
        bert_encoder,
        bert_mlm_forward,
        extended_attention_mask,
        init_bert_params,
    )
    from outeffhop_tpu.models import common

    on_tpu = jax.default_backend() == "tpu"
    B, T, L = (32, 128, 12) if on_tpu else (4, 128, 2)
    cfg = BertConfig(
        num_hidden_layers=L,
        attn_softmax="softmax1",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
        params,
        is_leaf=lambda x: x is None,
    )
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    x0 = jnp.asarray(rs.randn(B, T, cfg.hidden_size), jnp.bfloat16)
    ext = extended_attention_mask(mask)

    res = {}

    # 1/2: full forward, argmax feedback (what bench.py measures)
    def full(use_flash):
        def f(i):
            lo = bert_mlm_forward(params, cfg, i, mask, deterministic=True, use_flash=use_flash)
            return jnp.argmax(lo, -1).astype(jnp.int32)
        return f

    res["full_flash_argmaxfb"] = bench_scan(full(on_tpu), ids); report("full_flash_argmaxfb", res["full_flash_argmaxfb"]); report("full_flash_argmaxfb", res["full_flash_argmaxfb"])
    res["full_unfused_argmaxfb"] = bench_scan(full(False), ids); report("full_unfused_argmaxfb", res["full_unfused_argmaxfb"])

    # 3: full forward, cheap feedback (sum over vocab slice -> ids unchanged)
    def full_cheap(i):
        lo = bert_mlm_forward(params, cfg, i, mask, deterministic=True, use_flash=on_tpu)
        d = (jnp.sum(lo[..., :8]) * 0).astype(jnp.int32)
        return i + d

    res["full_flash_cheapfb"] = bench_scan(full_cheap, ids); report("full_flash_cheapfb", res["full_flash_cheapfb"])

    # 4: encoder only (hidden -> hidden)
    def enc(use_flash, m):
        def f(x):
            return bert_encoder(
                params, cfg, x, m, deterministic=True, use_flash=use_flash
            ).astype(jnp.bfloat16)
        return f

    ext_bf16 = ext.astype(jnp.bfloat16)
    res["encoder_flash"] = bench_scan(enc(on_tpu, ext), x0); report("encoder_flash", res["encoder_flash"])
    res["encoder_unfused_f32mask"] = bench_scan(enc(False, ext), x0); report("encoder_unfused_f32mask", res["encoder_unfused_f32mask"])
    res["encoder_unfused_bf16mask"] = bench_scan(enc(False, ext_bf16), x0); report("encoder_unfused_bf16mask", res["encoder_unfused_bf16mask"])
    res["encoder_nomask_unfused"] = bench_scan(enc(False, None), x0); report("encoder_nomask_unfused", res["encoder_nomask_unfused"])

    # 5: head only
    head = params["head"]

    def head_only(x):
        h = common.gelu(x @ head["transform"]["weight"].T + head["transform"]["bias"])
        h = common.layer_norm(head["transform_ln"], h, cfg.layer_norm_eps)
        lo = h @ head["decoder"]["weight"].T + head["decoder"]["bias"]
        return x + (jnp.sum(lo[..., :8]) * 0).astype(x.dtype)

    res["head_only"] = bench_scan(head_only, x0); report("head_only", res["head_only"])

    # 6: embeddings only
    def emb_only(i):
        e = bert_embeddings(params["embeddings"], cfg, i, deterministic=True)
        return i + (jnp.sum(e[..., :4]) * 0).astype(jnp.int32)

    res["embeddings_only"] = bench_scan(emb_only, ids); report("embeddings_only", res["embeddings_only"])

    # 7: matmul peak proxies (FFN pair and qkv-ish pair), chained
    W1 = jnp.asarray(rs.randn(768, 3072) * 0.02, jnp.bfloat16)
    W2 = jnp.asarray(rs.randn(3072, 768) * 0.02, jnp.bfloat16)
    x2 = x0.reshape(B * T, 768)

    def ffn_pair(c):
        return (c @ W1) @ W2

    t = bench_scan(ffn_pair, x2, iters=50)
    res["ffn_pair_ms"] = t
    res["ffn_pair_tflops"] = 2 * 2 * B * T * 768 * 3072 / t / 1e12

    Wq = jnp.asarray(rs.randn(768, 768) * 0.02, jnp.bfloat16)
    Wo = jnp.asarray(rs.randn(768, 768) * 0.02, jnp.bfloat16)

    def sq_pair(c):
        return (c @ Wq) @ Wo

    t = bench_scan(sq_pair, x2, iters=50)
    res["sq_pair_ms"] = t
    res["sq_pair_tflops"] = 2 * 2 * B * T * 768 * 768 / t / 1e12

    # fused qkv proxy: one 768->2304 then 2304 summed back via 2304->768
    W3 = jnp.asarray(rs.randn(768, 2304) * 0.02, jnp.bfloat16)
    W4 = jnp.asarray(rs.randn(2304, 768) * 0.02, jnp.bfloat16)

    def qkv_pair(c):
        return (c @ W3) @ W4

    t = bench_scan(qkv_pair, x2, iters=50)
    res["qkv_pair_ms"] = t
    res["qkv_pair_tflops"] = 2 * 2 * B * T * 768 * 2304 / t / 1e12

    # 8: LN stack cost (24 LNs like the encoder has)
    lnp = {"weight": jnp.ones((768,), jnp.bfloat16), "bias": jnp.zeros((768,), jnp.bfloat16)}

    def ln_stack(c):
        for _ in range(24):
            c = common.layer_norm(lnp, c, 1e-12)
        return c

    res["ln24_stack"] = bench_scan(ln_stack, x0, iters=50); report("ln24_stack", res["ln24_stack"])

    for k, v in res.items():
        if k.endswith("tflops"):
            print(f"{k:28s} {v:8.1f}")
        else:
            print(f"{k:28s} {v*1e3:8.3f} ms")

    fwd = res["full_flash_argmaxfb"]
    print(f"\ntokens/s: {B*T/fwd:,.0f}")


if __name__ == "__main__":
    main()
