"""Round-5 probe #37: is the optimizer's cost per-leaf launch overhead?

probe28 priced the BERT-base optimizer at adamw 2.4 ms + global-norm clip
2.0 ms vs a ~1.9 ms HBM-traffic floor. Hypothesis: the ~200-leaf pytree
turns each optax pass into hundreds of small kernels. Test: run the SAME
optax chain (clip 1.0 + adamw) over (a) the real BERT param tree shape
(~200 bf16 leaves, 110M params) vs (b) ONE flat bf16 array of the same
total size. If (b) is much faster, a flat-buffer optimizer is worth
building; if not, the cost is traffic/serialization and we stop here.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_opt(params, label):
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
    )
    opt_state = tx.init(params)

    @functools.partial(jax.jit, static_argnames="iters", donate_argnums=(0, 1))
    def loop(params, opt_state, iters):
        def body(carry, _):
            p, s = carry
            # synthetic grads derived from p: real dependence, no bwd cost
            g = jax.tree.map(lambda x: x * jnp.bfloat16(1e-3) + jnp.bfloat16(1e-6), p)
            upd, s2 = tx.update(g, s, p)
            return (optax.apply_updates(p, upd), s2), None

        return jax.lax.scan(body, (params, opt_state), None, length=iters)[0]

    def best_of(iters):
        p, s = loop(jax.tree.map(jnp.copy, params),
                    jax.tree.map(jnp.copy, opt_state), iters=iters)
        _sync(jax.tree.leaves(p)[0][..., :4])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            p2, s2 = loop(jax.tree.map(jnp.copy, params),
                          jax.tree.map(jnp.copy, opt_state), iters=iters)
            _sync(jax.tree.leaves(p2)[0][..., :4])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_of(4), best_of(16)
    per = max((t_hi - t_lo) / 12, 1e-9)
    print(f"{label}: {per*1e3:.3f} ms/update", flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    from outeffhop_tpu.models.bert import BertConfig, init_bert_params

    cfg = BertConfig(attn_softmax="softmax1")

    @jax.jit
    def mk(key):
        p = init_bert_params(key, cfg)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x is not None and x.dtype == jnp.float32 else x,
            p, is_leaf=lambda x: x is None,
        )

    tree = mk(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(tree))
    leaves = len(jax.tree.leaves(tree))
    print(f"tree: {leaves} leaves, {n/1e6:.1f}M params", flush=True)
    bench_opt(tree, "tree (BERT-base shapes)")

    flat = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.bfloat16) * 0.02)(
        jax.random.PRNGKey(1)
    )
    bench_opt(flat, "flat (one array, same size)")


if __name__ == "__main__":
    main()
