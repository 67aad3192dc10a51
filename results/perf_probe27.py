"""Round-4 probe #27: what does --remat buy on chip?

ViT-base train step at growing batch sizes, remat off vs on: the largest
batch that fits 16 GB HBM, and the throughput cost of recomputation at a
batch both fit. Run each (B, remat) cell in a SUBPROCESS so an OOM/abort
kills the child, not the sweep.
"""

import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def cell(b, remat):
    import functools

    from outeffhop_tpu.models.vit import init_vit_params, vit_config, vit_forward
    from outeffhop_tpu.parallel.train import (
        _make_train_step, init_train_state, make_adamw,
    )

    def to_bf16(p):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x is not None and x.dtype == jnp.float32 else x,
            p, is_leaf=lambda x: x is None,
        )

    cfg = vit_config("vit_base_patch16_224", attn_softmax="softmax1",
                     dropout=0.0, attn_dropout=0.0)
    params = jax.jit(lambda k: to_bf16(init_vit_params(k, cfg)))(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.randn(b, 224, 224, 3), jnp.bfloat16),
        "labels": jnp.asarray(rs.randint(0, 1000, (b,)), jnp.int32),
    }
    tx = make_adamw(params, lr=1e-3, warmup_steps=10, total_steps=1000)

    def loss_fn(p, bt, r):
        logits = vit_forward(p, cfg, bt["images"], dropout_rng=r,
                             deterministic=True, use_flash=True, remat=remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, bt["labels"][:, None], 1))

    step_fn = _make_train_step(loss_fn, tx)
    state = init_train_state(params, tx)
    rng = jax.random.PRNGKey(1)

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        def body(s, _):
            s2, loss = step_fn(s, batch, rng)
            return s2, loss
        s, losses = jax.lax.scan(body, state, None, length=iters)
        return s, losses[-1]

    def best_of(iters):
        float(jnp.sum(loop(state, iters=iters)[1]).astype(jnp.float32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(loop(state, iters=iters)[1]).astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        return best

    per = max((best_of(6) - best_of(2)) / 4, 1e-9)
    print(f"vit_base train B{b} remat={remat}: {per*1e3:.2f} ms/step  "
          f"{b/per:,.0f} img/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2:
        print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
              flush=True)
        arg = sys.argv[2]
        cell(int(sys.argv[1]), "dots" if arg == "dots" else arg == "remat")
        sys.exit(0)
    for remat in ("noremat", "remat"):
        for b in (64, 256, 512, 1024):
            r = subprocess.run(
                [sys.executable, __file__, str(b), remat],
                capture_output=True, text=True, timeout=2400,
            )
            if r.returncode == 0:
                print(r.stdout.strip().splitlines()[-1], flush=True)
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()
                oom = any("RESOURCE_EXHAUSTED" in l or "Out of memory" in l
                          or "exceeds the limit" in l for l in tail)
                print(f"vit_base train B{b} remat={remat=='remat'}: "
                      f"{'OOM' if oom else f'FAILED(rc={r.returncode})'}",
                      flush=True)
                if not oom:
                    for line in tail[-3:]:
                        print(f"    {line}", flush=True)
                break  # larger batches will also fail
