"""Round-4 probe #26b: scale=1.0 is the Mosaic-crash trigger — A/B the fix.

probe23 (crashed, all levels) called the packed kernel with scale=1.0 (as
every model does — 1/sqrt(d) folds into q); probe19/probe26 (passed) used
the default 1/sqrt(64). Hypothesis: with the `s * scale` multiply elided,
the (bb, 1, T_k) bias broadcast-add lands directly on the matmul output and
ApplyVectorLayout SIGABRTs (`limits[i] <= dim(i) (64 vs. 1)`).

Fix under test: `_bias_causal_fold` — bias folds onto the full-shape iota
causal mask; one full-shape add touches the dot output.

Variants (B8 H12 T512 D64 bf16 packed, each in a subprocess):
  old_scale1      fold OFF, scale=1.0, bias+causal    expect CRASH (repro)
  new_scale1      fold ON,  scale=1.0, bias+causal    expect PASS (the fix)
  new_scale1_grad fold ON,  scale=1.0, jax.grad       expect PASS
  new_model2      fold ON,  2-layer OPT e2e flash (packed causal forced)
  old_defscale    fold OFF, default scale (control — probe26 passed this)
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


def kernel(fold, scale):
    from outeffhop_tpu.ops import flash as fm

    fm._FOLD_BIAS_INTO_MASK = fold
    qp, kp, vp, bias = inputs()
    _compile(
        lambda q, k, v: fm.flash_attention_packed(
            q, k, v, bias, heads=H, softmax_n=1.0, scale=scale, causal=True
        ),
        qp, kp, vp,
    )


def new_scale1_grad():
    from outeffhop_tpu.ops import flash as fm

    qp, kp, vp, bias = inputs()

    def loss(q):
        out = fm.flash_attention_packed(
            q, kp, vp, bias, heads=H, softmax_n=1.0, scale=1.0, causal=True
        )
        return jnp.sum(out.astype(jnp.float32))

    _compile(jax.grad(loss), qp)


def new_model2():
    from outeffhop_tpu.ops import flash as fm
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward

    fm.PALLAS_MIN_CAUSAL_T = 0  # force packed causal from the model
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
    "old_scale1": lambda: kernel(False, 1.0),
    "new_scale1": lambda: kernel(True, 1.0),
    "new_scale1_grad": new_scale1_grad,
    "new_model2": new_model2,
    "old_defscale": lambda: kernel(False, None),
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
                capture_output=True, text=True, timeout=1500,
            )
            status = "PASS" if r.returncode == 0 else f"CRASH(rc={r.returncode})"
            print(f"{name}: {status}", flush=True)
            if r.returncode != 0:
                with open(f"results/probe26b_{name}.err", "w") as f:
                    f.write(r.stdout + "\n=== STDERR ===\n" + r.stderr)
                err = [l for l in (r.stderr or r.stdout).splitlines()
                       if "WARNING" not in l and l.strip()]
                for line in err[-15:]:
                    print(f"    {line}", flush=True)
