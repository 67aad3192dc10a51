"""Round-3 probe #10: (a) STanHop ETTh1-config forward+train-step throughput
on chip (the reference's 5th headline config: in 168, out 24, seg 6,
e_layers 11... trimmed to the published ETTh1 command's bs 128); (b) serving
prefill latency fp32-vs-int8-weights (prefill is matmul-bound at T=512, where
W8A8 measured 1.7x over bf16 at the layer level — probe10).
"""

import functools
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
            dep = (jnp.max(jnp.abs(out)) > 1e30).astype(c.dtype)
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


def stanhop_probe():
    from outeffhop_tpu.models.stanhop import (
        STanHopConfig, init_stanhop_params, mse_loss, stanhop_forward,
    )

    # README.md:162-208 ETTh1 command: in 168 out 24 seg 6 win 2 factor 10
    # d_model 256 d_ff 512 heads 4 e_layers 3 (paper table) — bs 128
    cfg = STanHopConfig(
        data_dim=7, in_len=168, out_len=24, seg_len=6, win_size=2, factor=10,
        d_model=256, d_ff=512, n_heads=4, e_layers=3, dropout=0.0,
        mode="softmax1",
    )
    params = jax.jit(lambda k: init_stanhop_params(k, cfg))(jax.random.PRNGKey(0))
    b = 128
    x = jnp.asarray(np.random.RandomState(0).randn(b, cfg.in_len, 7), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(b, cfg.out_len, 7), jnp.float32)

    def fwd(c):
        return stanhop_forward(params, cfg, c, deterministic=True)

    t_f = bench_scan(fwd, x)
    print(f"stanhop fwd B{b}: {t_f*1e3:.2f} ms/step  {b/t_f:,.0f} windows/s", flush=True)

    def train_step(c):
        def loss_fn(p):
            return mse_loss(stanhop_forward(p, cfg, c, deterministic=True), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # fold grads into a scalar so the scan dependence covers the bwd pass
        return loss + 0.0 * sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    def train_wrap(c):
        return train_step(c)[None]

    t_t = bench_scan(train_wrap, x)
    print(f"stanhop fwd+bwd B{b}: {t_t*1e3:.2f} ms/step  {b/t_t:,.0f} windows/s", flush=True)


def prefill_probe():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving.engine import (
        EngineConfig, init_state, make_int8_weight_ctx, make_prefill,
    )

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)

    @jax.jit
    def make_params(key):
        p = init_opt_params(key, cfg)
        return jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t is not None and t.dtype == jnp.float32
            else t,
            p, is_leaf=lambda t: t is None,
        )

    params = make_params(jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_slots=8, max_prompt=512, max_seq=576)
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (512,)), jnp.int32
    )

    for name, qctx in (
        ("bf16", None),
        ("int8-weights", make_int8_weight_ctx(params, cfg)),
    ):
        prefill = make_prefill(cfg, ecfg, qctx)
        rng = jax.random.PRNGKey(0)
        state = init_state(cfg, ecfg, dtype=jnp.bfloat16)
        slot = jnp.int32(0)
        plen = jnp.int32(512)
        # prefill donates state; rebuild per timed call. Time N sequential
        # prefills inside one dispatch via python loop over pre-warmed jit —
        # prefill is one big dispatch (not per-op), so wall-clock minus the
        # tunnel intercept via two-point fit over call counts.
        def run_n(n):
            s = init_state(cfg, ecfg, dtype=jnp.bfloat16)
            t0 = time.perf_counter()
            for i in range(n):
                s = prefill(params, s, slot, prompt, plen, rng)
            _sync(s.lengths)
            return time.perf_counter() - t0

        run_n(2)  # compile + warm
        lo = min(run_n(4) for _ in range(3))
        hi = min(run_n(12) for _ in range(3))
        per = (hi - lo) / 8
        print(f"prefill T512 {name}: {per*1e3:.2f} ms  {512/per:,.0f} tok/s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    stanhop_probe()
    prefill_probe()
