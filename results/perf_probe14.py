"""Round-3 probe #9: END-TO-END model throughput with the fused Pallas
attention path vs the pure-XLA attention, at the two shapes above the
dispatch crossover (BASELINE per-shape table): ViT-base B64 (T=197 patches)
and OPT-125m B8 x block 512. Both models auto-dispatch to the packed Pallas
kernel there (`pallas_attention_worthwhile`), so `use_flash=True` vs `False`
is the honest e2e delta a user sees.
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


def host_init(init_fn, *args):
    """ONE jitted init on the device: eager init pays a tunnel round trip per
    op; host-resident params would be re-uploaded as executable constants at
    every benchmark compile. A single compiled graph leaves bf16 params
    device-resident."""
    key, rest = args[0], args[1:]
    return jax.jit(lambda k: to_bf16(init_fn(k, *rest)))(key)


def vit_probe():
    from outeffhop_tpu.models.vit import init_vit_params, vit_config, vit_forward

    cfg = vit_config("vit_base_patch16_224", attn_softmax="softmax1", dropout=0.0,
                     attn_dropout=0.0)
    params = host_init(init_vit_params, jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(64, 224, 224, 3), jnp.bfloat16
    )

    for use_flash in (False, True):
        def step(x, uf=use_flash):
            return vit_forward(params, cfg, x, deterministic=True, use_flash=uf)

        t = bench_scan(step, imgs)
        print(
            f"vit_base B64 T{cfg.seq_len} use_flash={use_flash}: "
            f"{t*1e3:.2f} ms/step  {64/t:,.0f} img/s",
            flush=True,
        )


def opt_probe():
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0)
    params = host_init(init_opt_params, jax.random.PRNGKey(0), cfg)
    b, t_len = 8, 512
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t_len)), jnp.int32
    )

    for use_flash in (False, True):
        def step(c, uf=use_flash):
            logits, _ = opt_forward(params, cfg, c, deterministic=True, use_flash=uf)
            return logits

        t = bench_scan(step, ids)
        print(
            f"opt_125m B{b} T{t_len} use_flash={use_flash}: "
            f"{t*1e3:.2f} ms/step  {b*t_len/t:,.0f} tok/s",
            flush=True,
        )


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    # compiles through the tunnel are slow and NOT served by the persistent
    # cache (remote PJRT); run one model family per task so each fits its
    # timeout (ViT numbers captured in the attempt-1 log)
    if which in ("vit", "both"):
        vit_probe()
    if which in ("opt", "both"):
        opt_probe()
