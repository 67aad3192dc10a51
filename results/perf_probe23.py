"""Round-4 probe #23: bisect the in-model Mosaic crash.

probe19 proved the packed kernel with bias+causal at B8 H12 T512 D64 compiles
and runs standalone; probe14_opt_r4 proved the SAME kernel crashes Mosaic
(`Check failed: limits[i] <= dim(i) (64 vs. 1)` in vector_extract_slice /
xla::Array::Slice) when composed inside the OPT forward. Each variant here
COMPILES (lower().compile()) one intermediate composition in its own process
(SIGABRT kills the process) — run via chip_queue with tries=1 each:

  standalone   kernel on raw device arrays               (expect OK)
  scan         kernel inside lax.scan w/ carry dependence (probe19 shape)
  dense        q/k/v from three dense projections + fold  (one attention)
  layer        one full opt_decoder_layer, flash on
  model2       2-layer OPT forward, flash on
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.ops import flash as flash_mod
from outeffhop_tpu.ops.flash import flash_attention_packed

B, H, T, D = 8, 12, 512, 64
HD = H * D


def inputs():
    rs = np.random.RandomState(0)
    qp = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    kp = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    vp = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    bias = jnp.zeros((B, 1, 1, T), jnp.float32)
    return qp, kp, vp, bias


def compile_(f, *args):
    jax.jit(f).lower(*args).compile()
    print("compiled OK", flush=True)


def standalone():
    qp, kp, vp, bias = inputs()
    compile_(
        lambda q, k, v: flash_attention_packed(
            q, k, v, bias, heads=H, softmax_n=1.0, scale=1.0, causal=True
        ),
        qp, kp, vp,
    )


def scan():
    qp, kp, vp, bias = inputs()

    def f(q):
        def body(c, _):
            out = flash_attention_packed(
                c, kp, vp, bias, heads=H, softmax_n=1.0, scale=1.0, causal=True
            )
            dep = (jnp.max(jnp.abs(out[..., :8])) > 1e30).astype(c.dtype)
            return c + dep, None

        out, _ = jax.lax.scan(body, q, None, length=4)
        return out

    compile_(f, qp)


def dense():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    wq, wk, wv = (jnp.asarray(rs.randn(HD, HD) * 0.02, jnp.bfloat16) for _ in range(3))
    bias = jnp.zeros((B, 1, 1, T), jnp.float32)

    def f(x):
        q = (x @ wq.T) * (D**-0.5)
        k = x @ wk.T
        v = x @ wv.T
        return flash_attention_packed(
            q, k, v, bias, heads=H, softmax_n=1.0, scale=1.0, causal=True
        )

    compile_(f, x)


def layer():
    flash_mod.PALLAS_MIN_CAUSAL_T = 0
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_decoder_layer

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0, num_hidden_layers=1)
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t is not None and t.dtype == jnp.float32 else t,
            init_opt_params(k, cfg), is_leaf=lambda t: t is None,
        )
    )(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, HD), jnp.bfloat16)
    from outeffhop_tpu.models.opt import causal_mask_bias

    mask = jnp.ones((B, T), jnp.int32)
    cm = causal_mask_bias(mask, T)
    pb = jnp.zeros((B, 1, 1, T), jnp.float32)

    def f(x):
        h, _ = opt_decoder_layer(lp, cfg, x, cm, padding_bias=pb, use_flash=True)
        return h

    compile_(f, x)


def model2():
    flash_mod.PALLAS_MIN_CAUSAL_T = 0
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

    cfg = OPTConfig(attn_softmax="softmax1", dropout=0.0, num_hidden_layers=2)
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t is not None and t.dtype == jnp.float32 else t,
            init_opt_params(k, cfg), is_leaf=lambda t: t is None,
        )
    )(jax.random.PRNGKey(0))
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (B, T)), jnp.int32
    )
    compile_(lambda i: opt_forward(params, cfg, i, use_flash=True)[0], ids)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    globals()[sys.argv[1]]()
