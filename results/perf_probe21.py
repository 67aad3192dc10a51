"""Round-4 probe #21: TRAINING step with the flash forward (custom_vjp lands
in round 4 — round 3 raised in jax.grad). OPT-125m B8 x T512 (above the
dispatch gate: packed Pallas forward + XLA-recompute backward) and BERT-base
B32 x S128 (headline, below the gate: pure XLA) train steps, flash on/off,
with a FLOPs-based MFU estimate (fwd+bwd ~ 3x fwd).
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


def opt_probe():
    from outeffhop_tpu.models.opt import OPTConfig, clm_loss, init_opt_params, opt_forward
    from outeffhop_tpu.parallel.train import _make_train_step, init_train_state, make_adamw

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)
    params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)))(jax.random.PRNGKey(0))
    b, t = 8, 512
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, t)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, t)), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)
    tx = make_adamw(params, lr=4e-4, warmup_steps=10, total_steps=1000, accum_steps=1)

    # 12L x (attn 4*2*b*t^2*h*d... ) quick FLOPs: use XLA cost analysis once
    for uf in (False, True):
        def loss_fn(p, bt, r, uf=uf):
            logits, _ = opt_forward(
                p, cfg, bt["input_ids"], dropout_rng=r, deterministic=True,
                use_flash=uf,
            )
            return clm_loss(logits, bt["labels"])

        step_fn = _make_train_step(loss_fn, tx)
        state = init_train_state(params, tx)
        per = bench_train(step_fn, state, batch, rng)
        print(
            f"opt_125m train B{b} T{t} use_flash={uf}: {per*1e3:.2f} ms/step  "
            f"{b*t/per:,.0f} tok/s",
            flush=True,
        )


def bert_probe():
    from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params, mlm_loss
    from outeffhop_tpu.parallel.train import _make_train_step, init_train_state, make_adamw

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
    rng = jax.random.PRNGKey(1)
    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=1000, accum_steps=1)

    def loss_fn(p, bt, r):
        logits = bert_mlm_forward(
            p, cfg, bt["input_ids"], bt["attention_mask"], dropout_rng=r,
            deterministic=True, use_flash=True,
        )
        return mlm_loss(logits, bt["labels"])

    step_fn = _make_train_step(loss_fn, tx)
    state = init_train_state(params, tx)
    per = bench_train(step_fn, state, batch, rng)

    # roofline context: fwd graph = 926.7 GFLOP/step at this shape (XLA cost
    # analysis, bench.py); train ~ 3x fwd
    tf = 3 * 926.7e9 / per / 1e12
    print(
        f"bert_base mlm train B{b} S{t}: {per*1e3:.2f} ms/step  "
        f"{b*t/per:,.0f} tok/s  ~{tf:.1f} TFLOP/s ({tf/197*100:.0f}% bf16 peak)",
        flush=True,
    )


def vit_probe():
    """ViT-base B64 train step: non-causal, above the dispatch gate — the
    packed Pallas forward AND the packed recompute backward both engage."""
    from outeffhop_tpu.models.vit import init_vit_params, vit_config, vit_forward
    from outeffhop_tpu.parallel.train import _make_train_step, init_train_state, make_adamw

    cfg = vit_config("vit_base_patch16_224", attn_softmax="softmax1", dropout=0.0,
                     attn_dropout=0.0)
    params = jax.jit(lambda k: to_bf16(init_vit_params(k, cfg)))(jax.random.PRNGKey(0))
    b = 64
    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.randn(b, 224, 224, 3), jnp.bfloat16),
        "labels": jnp.asarray(rs.randint(0, 1000, (b,)), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)
    tx = make_adamw(params, lr=1e-3, warmup_steps=10, total_steps=1000, accum_steps=1)

    for uf in (False, True):
        def loss_fn(p, bt, r, uf=uf):
            logits = vit_forward(p, cfg, bt["images"], dropout_rng=r,
                                 deterministic=True, use_flash=uf)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, bt["labels"][:, None], 1))

        step_fn = _make_train_step(loss_fn, tx)
        state = init_train_state(params, tx)
        per = bench_train(step_fn, state, batch, rng)
        print(
            f"vit_base train B{b} use_flash={uf}: {per*1e3:.2f} ms/step  "
            f"{b/per:,.0f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("opt", "both"):
        opt_probe()
    if which in ("bert", "both"):
        bert_probe()
    if which == "vit":
        vit_probe()
