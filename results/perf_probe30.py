"""Round-5 probe #30: decode-step write-back fix (single stacked scatter vs
the round-4 per-layer .at[l].set loop) + step decomposition.

probe29 found the big-cache decode step (32 slots x bucket 2048) spends
~37 ms of 42 ms OUTSIDE attention (standalone XLA attention is at the HBM
roofline: 12 x 0.35 ms bf16). Suspect: the 12-iteration cache write-back
loop copies the whole (L, S, H, T, D) pool per iteration inside the scanned
decode body. probe29's fused=False cells (42.11 ms bf16 / 19.85 ms int8)
are the LOOP control; this probe measures the scatter path and decomposes.

Usage: perf_probe30.py <cell>
  cells: full_bf16 full_int8 fwd_bf16 fwd_int8 wb_bf16 small_bf16
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


TINY = False


def build(slots, bucket, max_seq, kv_int8):
    from outeffhop_tpu.models.opt import OPTConfig, init_opt_params
    from outeffhop_tpu.serving.engine import EngineConfig, init_state

    if TINY:
        cfg = OPTConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=64, max_position_embeddings=4096,
            dropout=0.0, attn_softmax="softmax1",
        )
    else:
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
    ecfg = EngineConfig(
        max_slots=slots, max_prompt=bucket, max_seq=max_seq, kv_int8=kv_int8,
    )
    state = init_state(cfg, ecfg, dtype=jnp.bfloat16)
    fill = bucket - 8
    state = state.__class__(
        cache_k=state.cache_k, cache_v=state.cache_v, tokens=state.tokens,
        lengths=jnp.full((slots,), fill, jnp.int32),
        active=jnp.ones((slots,), bool),
        scale_k=state.scale_k, scale_v=state.scale_v,
    )
    return cfg, ecfg, params, state


def bench_full(slots, bucket, max_seq, kv_int8):
    from outeffhop_tpu.serving.engine import make_decode_n

    cfg, ecfg, params, state0 = build(slots, bucket, max_seq, kv_int8)
    rng = jax.random.PRNGKey(0)

    def cell(n_prog, reps=3):
        prog = make_decode_n(cfg, ecfg, n_prog, bucket=bucket)
        s = prog(params, _clone(state0), rng)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = prog(params, s, rng)
            _sync(s.lengths)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = cell(8), cell(24)
    per = max((t_hi - t_lo) / 16, 1e-9)
    print(f"full slots={slots} bucket={bucket} int8={kv_int8}: "
          f"{per*1e3:.2f} ms/step  {slots/per:,.0f} tok/s", flush=True)


def _clone(state):
    return jax.tree.map(lambda x: x + 0 if x is not None else None, state,
                        is_leaf=lambda x: x is None)


def bench_fwd(slots, bucket, max_seq, kv_int8):
    """opt_forward decode_fast over the bucket slices, NO state update."""
    import functools

    from outeffhop_tpu.models.opt import Int8KV, opt_forward
    from outeffhop_tpu.serving.engine import EngineConfig

    cfg, ecfg, params, state = build(slots, bucket, max_seq, kv_int8)
    B = bucket
    L = cfg.num_hidden_layers
    S = slots

    @functools.partial(jax.jit, static_argnames="iters")
    def loop(state, iters):
        len_km1 = jnp.maximum(state.lengths - 1, 0)
        past_valid = (jnp.arange(B)[None, :] < len_km1[:, None]).astype(jnp.int32)
        attn_mask = jnp.concatenate(
            [past_valid, jnp.ones((S, 1), jnp.int32)], axis=1
        )
        if kv_int8:
            past = [
                Int8KV(state.cache_k[l, :, :, :B], state.cache_v[l, :, :, :B],
                       state.scale_k[l, :, :, :B], state.scale_v[l, :, :, :B])
                for l in range(L)
            ]
        else:
            past = [
                (state.cache_k[l, :, :, :B], state.cache_v[l, :, :, :B])
                for l in range(L)
            ]

        def body(acc, _):
            cur = jnp.take_along_axis(
                state.tokens, len_km1[:, None], axis=1
            ) + (acc.astype(jnp.int32) % 2)
            logits, _ = opt_forward(
                params, cfg, cur, attn_mask, past_key_values=past,
                decode_fast=True,
            )
            return acc + jnp.sum(logits[:, -1, :8].astype(jnp.float32)) * 1e-30, None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)[0]

    def cell(iters):
        _sync(loop(state, iters=iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(state, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = cell(4), cell(12)
    per = max((t_hi - t_lo) / 8, 1e-9)
    print(f"fwd  slots={slots} bucket={bucket} int8={kv_int8}: "
          f"{per*1e3:.2f} ms/step", flush=True)


def bench_wb(slots, bucket, max_seq, kv_int8):
    """Write-back only: scatter fabricated current-token K/V into the donated
    cache pool, no forward."""
    import functools

    cfg, ecfg, params, state = build(slots, bucket, max_seq, kv_int8)
    L = cfg.num_hidden_layers
    S = slots
    H, D = cfg.num_attention_heads, cfg.head_dim

    @functools.partial(jax.jit, static_argnames="iters", donate_argnums=(0,))
    def loop(state, iters):
        def body(s, _):
            len_km1 = jnp.maximum(s.lengths - 1, 0)
            fab = (
                jnp.broadcast_to(
                    s.lengths.astype(jnp.bfloat16)[None, :, None, None],
                    (L, S, H, D),
                )
                * 1e-3
            )
            ladv = jnp.arange(L)[:, None]
            sadv = jnp.arange(S)[None, :]
            ck, cv = s.cache_k, s.cache_v
            sk, sv = s.scale_k, s.scale_v
            if kv_int8:
                from outeffhop_tpu.models.opt import quantize_kv

                q8 = quantize_kv(fab[:, :, :, None, :], fab[:, :, :, None, :])
                nk, nv = q8.k[..., 0, :], q8.v[..., 0, :]
                sk = sk.at[ladv, sadv, :, len_km1[None, :]].set(q8.k_scale[..., 0])
                sv = sv.at[ladv, sadv, :, len_km1[None, :]].set(q8.v_scale[..., 0])
            else:
                nk = nv = fab.astype(ck.dtype)
            ck = ck.at[ladv, sadv, :, len_km1[None, :], :].set(nk)
            cv = cv.at[ladv, sadv, :, len_km1[None, :], :].set(nv)
            return s.__class__(ck, cv, s.tokens, s.lengths + 1, s.active,
                               sk, sv), None

        return jax.lax.scan(body, state, None, length=iters)[0]

    def cell(iters):
        s = loop(_clone(state), iters=iters)
        _sync(s.lengths)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = loop(_clone(state), iters=iters)
            _sync(s.lengths)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = cell(8), cell(24)
    per = max((t_hi - t_lo) / 16, 1e-9)
    print(f"wb   slots={slots} bucket={bucket} int8={kv_int8}: "
          f"{per*1e3:.2f} ms/step", flush=True)


def main():
    global TINY
    cell = sys.argv[1]
    if "--tiny" in sys.argv:
        TINY = True
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    big = (4, 64, 96) if TINY else (32, 2048, 2112)
    if cell == "full_bf16":
        bench_full(*big, False)
    elif cell == "full_int8":
        bench_full(*big, True)
    elif cell == "fwd_bf16":
        bench_fwd(*big, False)
    elif cell == "fwd_int8":
        bench_fwd(*big, True)
    elif cell == "wb_bf16":
        bench_wb(*big, False)
    elif cell == "small_bf16":
        bench_full(8, 512, 576, False)
    elif cell == "nobucket_bf16":
        # max_seq == bucket: the per-layer [:, :, :B] cache slices become
        # identity — isolates the slice-materialization cost inside the
        # scanned decode body (vs full_bf16's 2048-of-2112 slices)
        bench_full(32, 2048, 2048, False)
    elif cell == "nobucket_int8":
        bench_full(32, 2048, 2048, True)
    else:
        raise SystemExit(f"unknown cell {cell}")


if __name__ == "__main__":
    main()
