"""Round-4 probe #20: fused clipped-softmax(_n) epilogue END-TO-END
(VERDICT r3 #6). BERT-base at B16 x T512 with the paper's
clippedsoftmax1(-.025:1) preset and OPT-125m B8 x T512 with the same —
use_flash True (packed kernel + in-VMEM clip epilogue) vs False (XLA
stretch-clip on the materialized prob tensor).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_scan(step, x0, lo=4, hi=20, repeats=5):
    @functools.partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(c, _):
            out = step(c)
            dep = (jnp.max(jnp.abs(out[..., :8])) > 1e30).astype(c.dtype)
            return c + dep, None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    def best_of(iters):
        _sync(loop(x0, iters=iters))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(loop(x0, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(lo), best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def to_bf16(params):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x is not None and x.dtype == jnp.float32
        else x,
        params,
        is_leaf=lambda x: x is None,
    )


def bert_probe(variants=(False, True)):
    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params

    cfg = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, attn_softmax="clippedsoftmax1(-.025:1)",
    )
    params = jax.jit(lambda k: to_bf16(init_bert_params(k, cfg)))(jax.random.PRNGKey(0))
    b, t = 16, 512
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t)), jnp.int32
    )
    mask = jnp.ones((b, t), jnp.int32)

    for uf in variants:
        def step(c, uf=uf):
            return bert_mlm_forward(params, cfg, c, mask, deterministic=True,
                                    use_flash=uf)

        ms = bench_scan(step, ids) * 1e3
        print(
            f"bert_base clippedsoftmax1 B{b} T{t} use_flash={uf}: "
            f"{ms:.2f} ms/step  {b*t/ms*1e3:,.0f} tok/s",
            flush=True,
        )


def opt_probe():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

    cfg = OPTConfig(attn_softmax="clippedsoftmax1(-.025:1)", dropout=0.0)
    params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)))(jax.random.PRNGKey(0))
    b, t = 8, 512
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t)), jnp.int32
    )

    for uf in (False, True):
        def step(c, uf=uf):
            return opt_forward(params, cfg, c, deterministic=True, use_flash=uf)[0]

        ms = bench_scan(step, ids) * 1e3
        print(
            f"opt_125m clippedsoftmax1 B{b} T{t} use_flash={uf}: "
            f"{ms:.2f} ms/step  {b*t/ms*1e3:,.0f} tok/s",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sel = sys.argv[2] if len(sys.argv) > 2 else "both"
    variants = {"noflash": (False,), "flash": (True,), "both": (False, True)}[sel]
    if which in ("bert", "both"):
        bert_probe(variants)
    if which in ("opt", "both"):
        opt_probe()
