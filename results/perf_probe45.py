"""Driver-round-5 probe #45: long-seq flash TRAINING adjudication (VERDICT r4
item 5). The recurrence path (T >= 2048 causal — the only regime where causal
dispatch selects Pallas, +53% inference e2e at OPT T2048 per probe18) was not
really trainable: its backward was an XLA recompute materializing the full
(B,H,T,T) score tensor. Round 5 adds the streaming Pallas backward (forward
saves per-row log-denominators; dq/dkv kernels recompute p = exp(s-L)
blockwise). Cells:

  gradcheck          on-chip numerics: streaming Pallas bwd vs the XLA
                     recompute bwd at B2 H12 T2048 D64 causal bf16
  train_xla          OPT-125m CLM train step B2xT2048, use_flash=False
  train_flash_xlabwd use_flash=True, _RECURRENCE_PALLAS_BWD=False (round-4 VJP)
  train_flash_palbwd use_flash=True, _RECURRENCE_PALLAS_BWD=True  (round-5)

Train cells: state-carried scan-slope (probe38 pattern), deterministic.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def to_bf16(p):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x is not None and x.dtype == jnp.float32 else x,
        p, is_leaf=lambda x: x is None,
    )


def gradcheck(on_tpu, with_bias=False):
    import outeffhop_tpu.ops.flash as fl

    if on_tpu:
        b, h, t, d = 2, 12, 2048, 64
        block_q, block_k = 512, 512
        dtype = jnp.bfloat16
        tol = 6e-2  # bf16 matmul accumulation over T=2048
    else:
        b, h, t, d = 1, 2, 1024, 32
        block_q, block_k = 512, 512
        dtype = jnp.float32
        tol = 2e-3
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, t, d), dtype) * 0.3
    k = jnp.asarray(rs.randn(b, h, t, d), dtype) * 0.3
    v = jnp.asarray(rs.randn(b, h, t, d), dtype) * 0.3
    bias = None
    argnames = "qkv"
    if with_bias:
        # padding-mask layout (B,1,1,T): exercises the dbias slab outputs
        bias = jnp.asarray(
            np.where(rs.rand(b, 1, 1, t) > 0.05, 0.0, -1e9), jnp.float32)
        argnames = "qkvb"
    opts = dict(softmax_n=1.0, causal=True, block_q=block_q, block_k=block_k,
                interpret=not on_tpu)
    geo = fl._flash_geometry(t, t, fl._FlashOpts(
        softmax_n=1.0, scale=1.0, causal=True, block_q=block_q, block_k=block_k))
    assert geo[-1] == "recurrence", geo
    argnums = tuple(range(4 if with_bias else 3))

    @jax.jit
    def grads_pallas(q, k, v, bias):
        def loss(q, k, v, bias):
            return jnp.sum(
                fl.flash_attention(q, k, v, bias, **opts).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=argnums)(q, k, v, bias)

    @jax.jit
    def grads_ref(q, k, v, bias):
        def loss(q, k, v, bias):
            return jnp.sum(fl.attention_reference(
                q, k, v, bias, softmax_n=1.0, causal=True).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=argnums)(q, k, v, bias)

    gp = grads_pallas(q, k, v, bias)
    gr = grads_ref(q, k, v, bias)
    for a, b_, nm in zip(gp, gr, argnames):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = max(np.abs(b32).max(), 1e-6)
        err = np.abs(a32 - b32).max() / denom
        print(f"  d{nm}: rel max err {err:.4g}", flush=True)
        assert err < tol, (nm, err)
    print("gradcheck PASS (streaming Pallas bwd == XLA recompute bwd, "
          f"bias={with_bias})", flush=True)


def train_cell(cell, on_tpu):
    import outeffhop_tpu.ops.flash as fl
    from outeffhop_tpu.models.opt import OPTConfig, clm_loss, init_opt_params, opt_forward
    from outeffhop_tpu.parallel.train import _make_train_step, init_train_state, make_adamw

    # optional "_tNNNN" suffix selects the sequence length (B1 beyond 2048 —
    # the memory-capacity regime where XLA autodiff's saved per-layer score/
    # prob residuals (12 x B·H·T² bf16) exceed HBM and the streaming Pallas
    # backward is the only trainable path)
    t_override = None
    if "_t" in cell:
        cell, t_str = cell.rsplit("_t", 1)
        t_override = int(t_str)
    use_flash = cell != "train_xla"
    fl._RECURRENCE_PALLAS_BWD = cell == "train_flash_palbwd"
    if on_tpu:
        s = t_override or 2048
        b = 2 if s <= 2048 else 1
        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0,
                        max_position_embeddings=max(s, 2048))
    elif False:
        pass
    else:
        cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0, vocab_size=128,
                        hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, ffn_dim=64)
        b, s = 2, 16
    params = jax.jit(lambda k: to_bf16(init_opt_params(k, cfg)))(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, cfg.vocab_size, (b, s)), jnp.int32),
    }

    def loss_fn(p, bt, r):
        logits, _ = opt_forward(
            p, cfg, bt["input_ids"], deterministic=True, dropout_rng=r,
            use_flash=use_flash and on_tpu,
        )
        return clm_loss(logits[:, :-1], bt["labels"][:, 1:])

    tx = make_adamw(params, lr=1e-4, warmup_steps=10, total_steps=1000,
                    clip_norm=1.0, accum_steps=1)
    step_fn = _make_train_step(loss_fn, tx)
    state = init_train_state(params, tx)
    rng = (jax.random.key(1, impl="rbg") if on_tpu else jax.random.PRNGKey(1))

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        def body(sc, _):
            st, acc = sc
            st2, loss = step_fn(st, batch, rng)
            return (st2, acc + loss), None

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

    n_lo, n_hi = (4, 12) if on_tpu else (2, 4)
    t_lo, t_hi = best_of(n_lo), best_of(n_hi)
    per = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
    print(f"opt125m_T{s}_{cell}: {per*1e3:.2f} ms/step  {b*s/per:,.0f} tok/s",
          flush=True)


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "gradcheck"
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "| cell:", cell, flush=True)
    if cell == "gradcheck":
        gradcheck(on_tpu)
    elif cell == "gradcheck_bias":
        gradcheck(on_tpu, with_bias=True)
    else:
        train_cell(cell, on_tpu)


if __name__ == "__main__":
    main()
