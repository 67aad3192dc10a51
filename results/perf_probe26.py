"""Round-4 probe #26: pin down + fix the packed bias+causal Mosaic SIGABRT.

probe23 (21:27, HEAD) crashed `Check failed: limits[i] <= dim(i) (64 vs. 1)`
at EVERY composition level including the standalone kernel — while probe19
(09:24, commit f9f0f5f) ran the same call green. The score-tile geometry at
B8 H12 T512 D64 forces block_b=1 (per-program VMEM), and the kernel's
`s + bias` implicitly broadcasts a (1, 1, 512) bias tile over sublanes —
the same singleton-broadcast lowering path `_causal_keep` already documents
as crashing ApplyVectorLayout for masks. Fix: explicit full-shape
`jnp.broadcast_to` before the add (`ops/flash.py:_bias_add`).

Run with no args: executes each variant in a SUBPROCESS (SIGABRT kills the
child, not the driver) and prints a PASS/CRASH matrix.

Variants (all B8 H12 T512 D64, bf16, packed kernel):
  fixed_bias_causal      explicit broadcast ON  (the fix)        expect PASS
  unfixed_bias_causal    explicit broadcast OFF (old lowering)   reproduces?
  unfixed_bias_noncausal broadcast OFF, causal=False (probe20)   control
  unfixed_nobias_causal  broadcast OFF, no bias                  control
  fixed_grad             jax.grad through the fixed kernel       expect PASS
  fixed_model2           2-layer OPT e2e flash fwd, fix ON       expect PASS
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, D = 8, 12, 512, 64
HD = H * D


def inputs():
    rs = np.random.RandomState(0)
    qp = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    kp = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    vp = jnp.asarray(rs.randn(B, T, HD), jnp.bfloat16)
    bias = jnp.zeros((B, 1, 1, T), jnp.float32)
    return qp, kp, vp, bias


def _compile(f, *args):
    jax.jit(f).lower(*args).compile()
    print("compiled OK", flush=True)


def kernel_variant(bias_on, causal, explicit):
    from outeffhop_tpu.ops import flash as fm

    fm._EXPLICIT_BIAS_BROADCAST = explicit
    qp, kp, vp, bias = inputs()
    b = bias if bias_on else None
    _compile(
        lambda q, k, v: fm.flash_attention_packed(
            q, k, v, b, heads=H, softmax_n=1.0, causal=causal
        ),
        qp, kp, vp,
    )


def fixed_grad():
    from outeffhop_tpu.ops import flash as fm

    qp, kp, vp, bias = inputs()

    def loss(q):
        out = fm.flash_attention_packed(
            q, kp, vp, bias, heads=H, softmax_n=1.0, causal=True
        )
        return jnp.sum(out.astype(jnp.float32))

    _compile(jax.grad(loss), qp)


def fixed_model2():
    from outeffhop_tpu.ops import flash as fm
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

    fm.PALLAS_MIN_CAUSAL_T = 0  # force the packed causal path from the model
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
    _compile(lambda i: opt_forward(params, cfg, i, use_flash=True)[0], ids)


VARIANTS = {
    "fixed_bias_causal": lambda: kernel_variant(True, True, True),
    "unfixed_bias_causal": lambda: kernel_variant(True, True, False),
    "unfixed_bias_noncausal": lambda: kernel_variant(True, False, False),
    "unfixed_nobias_causal": lambda: kernel_variant(False, True, False),
    "fixed_grad": fixed_grad,
    "fixed_model2": fixed_model2,
}


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
              flush=True)
        VARIANTS[sys.argv[1]]()
    else:
        for name in VARIANTS:
            r = subprocess.run(
                [sys.executable, __file__, name],
                capture_output=True, text=True, timeout=1200,
            )
            status = "PASS" if r.returncode == 0 else f"CRASH(rc={r.returncode})"
            print(f"{name}: {status}", flush=True)
            if r.returncode != 0:
                tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
                for line in tail:
                    print(f"    {line}", flush=True)
