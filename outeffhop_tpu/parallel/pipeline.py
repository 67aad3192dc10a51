"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.8 marks PP
"optional"); this module adds it the TPU-native way: no send/recv
transport code — a `jax.shard_map` over a 1-D ``('pipe',)`` mesh, layer
parameters stacked on a leading axis and sharded across stages, and the
stage-to-stage activation hop expressed as `lax.ppermute` (which XLA lowers
to an ICI neighbour copy). The whole schedule — bubbles included — is ONE
jitted program, differentiable end to end (`ppermute`/`psum` have exact
transposes), so the same machinery serves inference and training.

Schedule: classic GPipe. The batch is split into M microbatches; the loop
runs ``M + S - 1`` ticks (S = pipeline stages). At tick t, stage s works on
microbatch ``t - s`` (bubble ticks compute on clamped dummy microbatches and
their results are discarded — the usual (S-1)/(M+S-1) bubble overhead).
Activations hop stage→stage+1 between ticks. The last stage's outputs are
collected and broadcast with one masked `lax.psum` so the (replicated) head
and loss can run identically on every stage — redundant but tiny next to
the trunk, and it keeps the module generic over heads.

dp×pp composition is built in: `make_pipe_mesh(n_stages, n_data)` makes a
2-D ``('pipe', 'data')`` mesh, microbatches shard their batch dim over
`data`, and the gradient all-reduce across replicas falls out of the
shard_map transpose (replicated param in_specs psum their cotangents over
every mesh axis). tp×pp is NOT composed here: inside shard_map the layer
code is per-device and would need explicit psums after the row-parallel
matmuls — use dp×pp (this module) or dp×tp (`parallel/mesh.py`), not both
model-sharding schemes at once.

Quant-ctx / telemetry-tape threading is deliberately NOT supported inside
the pipeline trunk (sites are discovered per layer index, which is a
host-side Python concept; the stacked trunk is index-free). Train with
pipeline, then calibrate/serve the checkpoint on the un-stacked model.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_pipe_mesh(
    n_stages: Optional[int] = None, n_data: int = 1, devices=None
) -> Mesh:
    """('pipe', 'data') mesh: S pipeline stages × D data-parallel replicas.

    `data` is innermost so each stage's replicas are ICI neighbours (their
    per-microbatch activation grad psum stays on-chip-local links); `pipe`
    hops also ride ICI on a contiguous slice."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_stages is None:
        n_stages = devices.size // n_data
    assert devices.size == n_stages * n_data, (
        f"pipe mesh wants {n_stages}x{n_data} devices, have {devices.size}"
    )
    return Mesh(devices.reshape(n_stages, n_data), ("pipe", "data"))


def stack_layer_params(layers: list) -> Any:
    """[{...}, {...}, ...] (identical structures) → one pytree whose leaves
    gain a leading layer axis. The inverse of ``unstack_layer_params``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, n_layers: int) -> list:
    return [
        jax.tree.map(lambda x: x[i], stacked) for i in range(n_layers)
    ]


def shard_pipeline_params(pparams, mesh: Mesh):
    """Place a pipeline param pytree: ``stacked_layers`` leaves sharded on
    their leading (layer) axis over `pipe`; everything else replicated."""

    def place(path, leaf):
        if leaf is None:
            return None
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        spec = P("pipe") if "stacked_layers" in names else P()
        # fresh buffers, never aliases of the caller's arrays: pipelined train
        # steps donate their state, and device_put is a no-op (same buffer)
        # when the sharding already matches
        return jax.device_put(jnp.array(leaf), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        place, pparams, is_leaf=lambda x: x is None
    )


def gpipe_trunk(
    layer_fn: Callable[[Any, Array, Array, Array], Array],
    stacked_local: Any,
    x_mb: Array,
    n_stages: int,
    axis: str = "pipe",
) -> Array:
    """The schedule core — call INSIDE a shard_map over `axis`.

    layer_fn(layer_params, x, global_layer_idx, micro_idx) -> x
    stacked_local: layer params with leading dim L/S (this stage's slice)
    x_mb: (M, mb, ...) microbatched trunk input, replicated across stages
    Returns (M, mb, ...) trunk output, broadcast to every stage.
    """
    stage = lax.axis_index(axis)
    n_micro = x_mb.shape[0]
    l_local = jax.tree.leaves(stacked_local)[0].shape[0]
    local_idx = jnp.arange(l_local)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def stage_apply(x: Array, micro: Array) -> Array:
        def body(h, xs):
            lp, il = xs
            g = stage * l_local + il  # global layer index (rng streams)
            return layer_fn(lp, h, g, micro), None

        out, _ = lax.scan(body, x, (stacked_local, local_idx))
        return out

    def tick(recv, t):
        x0 = x_mb[jnp.clip(t, 0, n_micro - 1)]
        x = jnp.where(stage == 0, x0, recv)
        micro = jnp.clip(t - stage, 0, n_micro - 1)
        y = stage_apply(x, micro)
        nxt = (
            lax.ppermute(y, axis, perm) if perm else jnp.zeros_like(y)
        )
        return nxt, y

    _, ys = lax.scan(tick, jnp.zeros_like(x_mb[0]),
                     jnp.arange(n_micro + n_stages - 1))
    outs = ys[n_stages - 1:]  # (M, mb, ...) — microbatch m at row m
    outs = jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs))
    return lax.psum(outs, axis)


# --------------------------------------------------------------------------
# BERT MLM on the pipeline
# --------------------------------------------------------------------------


def to_pipeline_params(params, mesh: Mesh, layers_key: str = "layers"):
    """{..., layers_key: [...]} → pipeline pytree with ``stacked_layers``
    sharded over `pipe` (leading layer axis); everything else replicated."""
    p = {k: v for k, v in params.items() if k != layers_key}
    p["stacked_layers"] = stack_layer_params(params[layers_key])
    return shard_pipeline_params(p, mesh)


def from_pipeline_params(pparams, n_layers: int, layers_key: str = "layers"):
    p = {k: v for k, v in pparams.items() if k != "stacked_layers"}
    p[layers_key] = unstack_layer_params(pparams["stacked_layers"], n_layers)
    return p


def to_bert_pipeline_params(params, mesh: Mesh):
    return to_pipeline_params(params, mesh, "layers")


def from_bert_pipeline_params(pparams, n_layers: int):
    return from_pipeline_params(pparams, n_layers, "layers")


def bert_pipeline_mlm_forward(
    pparams,
    cfg,
    input_ids: Array,
    attention_mask: Optional[Array],
    mesh: Mesh,
    n_micro: int,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    remat: bool = False,
):
    """`bert_mlm_forward` with the encoder trunk pipelined over `pipe`.

    Matches the un-pipelined forward exactly in the deterministic case
    (tests assert allclose); with dropout the rng STREAMS differ from the
    sequential encoder's (per-layer fold_in is replaced by a
    (global-layer, microbatch) fold), so losses are equal in distribution,
    not bitwise. Embeddings and head run replicated on every stage.
    """
    from outeffhop_tpu.models.bert import (
        bert_embeddings, bert_layer, extended_attention_mask,
    )
    from outeffhop_tpu.models import common

    b, t = input_ids.shape
    n_stages = mesh.shape["pipe"]
    n_data = mesh.shape.get("data", 1)
    assert b % n_micro == 0, f"batch {b} not divisible by {n_micro} microbatches"
    mb = b // n_micro
    assert mb % n_data == 0, (
        f"microbatch {mb} not divisible by {n_data} data replicas"
    )
    assert cfg.num_hidden_layers % n_stages == 0, (
        f"{cfg.num_hidden_layers} layers not divisible by {n_stages} stages"
    )

    ext_mask = (
        extended_attention_mask(attention_mask)
        if attention_mask is not None
        else jnp.zeros((b, 1, 1, t), jnp.float32)
    )

    def run(stacked, other, ids_mb, mask_mb, rng):
        m_, mbl, t_ = ids_mb.shape  # local: mb sharded over 'data'
        if rng is not None and n_data > 1:
            rng = jax.random.fold_in(rng, lax.axis_index("data"))
        x = bert_embeddings(
            other["embeddings"], cfg, ids_mb.reshape(m_ * mbl, t_), None,
            dropout_rng=None if rng is None else jax.random.fold_in(rng, 1 << 20),
            deterministic=deterministic,
        )
        x_mb = x.reshape(m_, mbl, t_, -1)

        def layer_fn(lp, h, g, m):
            r = (
                jax.random.fold_in(jax.random.fold_in(rng, g), m)
                if rng is not None
                else None
            )
            return bert_layer(
                lp, cfg, h, mask_mb[m],
                dropout_rng=r, deterministic=deterministic,
                use_flash=use_flash,
            )

        if remat:
            # per-layer jax.checkpoint: recompute stage activations in the
            # backward — the lever that matters for PP, where M microbatches
            # of residuals are live at once. `remat` is the same
            # False | True | "full" | "dots" knob as the sequential
            # forwards (common.checkpoint_layer honors --remat_policy).
            from outeffhop_tpu.models.common import checkpoint_layer

            layer_fn = checkpoint_layer(layer_fn, remat)
        out = gpipe_trunk(layer_fn, stacked, x_mb, n_stages)
        x = out.reshape(m_ * mbl, t_, -1)
        head = other["head"]
        h = common.gelu(x @ head["transform"]["weight"].T + head["transform"]["bias"])
        h = common.layer_norm(head["transform_ln"], h, cfg.layer_norm_eps)
        logits = h @ head["decoder"]["weight"].T + head["decoder"]["bias"]
        return logits.reshape(m_, mbl, t_, -1)

    other = {k: v for k, v in pparams.items() if k != "stacked_layers"}
    mb_spec = P(None, "data") if n_data > 1 else P()
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P("pipe"), P(), mb_spec, mb_spec, P()),
        out_specs=mb_spec,
        check_vma=False,
    )
    logits = sharded(
        pparams["stacked_layers"],
        other,
        input_ids.reshape(n_micro, mb, t),
        ext_mask.reshape(n_micro, mb, *ext_mask.shape[1:]),
        dropout_rng,
    )
    return logits.reshape(b, t, -1)


# --------------------------------------------------------------------------
# ViT on the pipeline
# --------------------------------------------------------------------------


def to_vit_pipeline_params(params, mesh: Mesh):
    return to_pipeline_params(params, mesh, "blocks")


def from_vit_pipeline_params(pparams, depth: int):
    return from_pipeline_params(pparams, depth, "blocks")


def vit_pipeline_forward(
    pparams,
    cfg,
    images: Array,
    mesh: Mesh,
    n_micro: int,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    remat: bool = False,
):
    """`vit_forward` with the block trunk pipelined (maskless — the simplest
    trunk). Patch-embed / final-norm / pool / head run replicated. Same
    contract notes as `bert_pipeline_mlm_forward`; differentiable, so
    training drives it with jax.grad over any loss on the logits."""
    from outeffhop_tpu.models import common
    from outeffhop_tpu.models.vit import (
        attention_pool_latent, patch_embed, vit_block,
    )

    b = images.shape[0]
    n_stages = mesh.shape["pipe"]
    n_data = mesh.shape.get("data", 1)
    assert b % n_micro == 0, f"batch {b} not divisible by {n_micro} microbatches"
    mb = b // n_micro
    assert mb % n_data == 0, (
        f"microbatch {mb} not divisible by {n_data} data replicas"
    )
    assert cfg.depth % n_stages == 0, (
        f"{cfg.depth} blocks not divisible by {n_stages} stages"
    )

    def run(stacked, other, img_mb, rng):
        m_, mbl = img_mb.shape[:2]
        if rng is not None and n_data > 1:
            rng = jax.random.fold_in(rng, lax.axis_index("data"))
        imgs = img_mb.reshape((m_ * mbl,) + img_mb.shape[2:])
        from outeffhop_tpu.quant.calibrate import NULL_QCTX

        x = patch_embed(other["patch_embed"], cfg, imgs, NULL_QCTX)
        if cfg.class_token:
            cls = jnp.broadcast_to(
                other["cls_token"].astype(x.dtype), (x.shape[0], 1, x.shape[-1])
            )
            x = jnp.concatenate([cls, x], axis=1)
        x = x + other["pos_embed"].astype(x.dtype)
        t = x.shape[1]
        x_mb = x.reshape(m_, mbl, t, -1)

        def layer_fn(lp, h, g, m):
            r = (
                jax.random.fold_in(jax.random.fold_in(rng, g), m)
                if rng is not None
                else None
            )
            return vit_block(
                lp, cfg, h, dropout_rng=r, deterministic=deterministic,
                use_flash=use_flash,
            )

        if remat:
            # per-layer jax.checkpoint: recompute stage activations in the
            # backward — the lever that matters for PP, where M microbatches
            # of residuals are live at once. `remat` is the same
            # False | True | "full" | "dots" knob as the sequential
            # forwards (common.checkpoint_layer honors --remat_policy).
            from outeffhop_tpu.models.common import checkpoint_layer

            layer_fn = checkpoint_layer(layer_fn, remat)
        out = gpipe_trunk(layer_fn, stacked, x_mb, n_stages)
        x = out.reshape(m_ * mbl, t, -1)
        x = common.layer_norm(other["norm"], x, cfg.layer_norm_eps)
        if cfg.global_pool == "token":
            pooled = x[:, 0]
        elif cfg.global_pool == "avg":
            start = 1 if cfg.class_token else 0
            pooled = jnp.mean(x[:, start:], axis=1)
        elif cfg.global_pool == "map":
            pooled = attention_pool_latent(other["attn_pool"], cfg, x)
        else:
            return x.reshape(m_, mbl, t, -1)
        if cfg.num_classes > 0:
            pooled = pooled @ other["head"]["weight"].T + other["head"]["bias"]
        return pooled.reshape(m_, mbl, -1)

    other = {k: v for k, v in pparams.items() if k != "stacked_layers"}
    mb_spec = P(None, "data") if n_data > 1 else P()
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P("pipe"), P(), mb_spec, P()),
        out_specs=mb_spec,
        check_vma=False,
    )
    out = sharded(
        pparams["stacked_layers"],
        other,
        images.reshape((n_micro, mb) + images.shape[1:]),
        dropout_rng,
    )
    return out.reshape((b,) + out.shape[2:])


# --------------------------------------------------------------------------
# OPT CLM on the pipeline
# --------------------------------------------------------------------------


def to_opt_pipeline_params(params, mesh: Mesh):
    return to_pipeline_params(params, mesh, "layers")


def from_opt_pipeline_params(pparams, n_layers: int):
    return from_pipeline_params(pparams, n_layers, "layers")


def opt_pipeline_forward(
    pparams,
    cfg,
    input_ids: Array,
    attention_mask: Optional[Array],
    mesh: Mesh,
    n_micro: int,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    remat: bool = False,
):
    """`opt_forward` (no-cache training path) with the decoder trunk
    pipelined — same contract notes as `bert_pipeline_mlm_forward`."""
    from outeffhop_tpu.models import common
    from outeffhop_tpu.models.opt import (
        causal_mask_bias, opt_decoder_layer, opt_positions,
    )

    b, t = input_ids.shape
    n_stages = mesh.shape["pipe"]
    n_data = mesh.shape.get("data", 1)
    assert b % n_micro == 0, f"batch {b} not divisible by {n_micro} microbatches"
    mb = b // n_micro
    assert mb % n_data == 0, (
        f"microbatch {mb} not divisible by {n_data} data replicas"
    )
    assert cfg.num_hidden_layers % n_stages == 0, (
        f"{cfg.num_hidden_layers} layers not divisible by {n_stages} stages"
    )
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    combined_mask = causal_mask_bias(attention_mask, t, 0)
    padding_bias = (
        (1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
        * jnp.finfo(jnp.float32).min
    )

    def run(stacked, other, ids_mb, mask_mb, bias_mb, amask_mb, rng):
        m_, mbl, t_ = ids_mb.shape  # local: mb sharded over 'data'
        if rng is not None and n_data > 1:
            rng = jax.random.fold_in(rng, lax.axis_index("data"))
        ids = ids_mb.reshape(m_ * mbl, t_)
        x = common.embedding(other["embed_tokens"], ids)
        pos = common.embedding(
            other["embed_positions"],
            opt_positions(amask_mb.reshape(m_ * mbl, t_), 0),
        )
        if "project_in" in other:
            x = x @ other["project_in"]["weight"].T
        h = x + pos
        h = common.dropout(
            h, cfg.dropout,
            None if rng is None else jax.random.fold_in(rng, 1 << 20),
            deterministic,
        )
        x_mb = h.reshape(m_, mbl, t_, -1)

        def layer_fn(lp, hh, g, m):
            r = (
                jax.random.fold_in(jax.random.fold_in(rng, g), m)
                if rng is not None
                else None
            )
            return opt_decoder_layer(
                lp, cfg, hh, mask_mb[m], padding_bias=bias_mb[m],
                dropout_rng=r, deterministic=deterministic,
                use_flash=use_flash,
            )[0]

        if remat:
            # per-layer jax.checkpoint: recompute stage activations in the
            # backward — the lever that matters for PP, where M microbatches
            # of residuals are live at once. `remat` is the same
            # False | True | "full" | "dots" knob as the sequential
            # forwards (common.checkpoint_layer honors --remat_policy).
            from outeffhop_tpu.models.common import checkpoint_layer

            layer_fn = checkpoint_layer(layer_fn, remat)
        out = gpipe_trunk(layer_fn, stacked, x_mb, n_stages)
        h = out.reshape(m_ * mbl, t_, -1)
        h = common.layer_norm(other["final_ln"], h, cfg.layer_norm_eps)
        if "project_out" in other:
            h = h @ other["project_out"]["weight"].T
        lm_w = other["head"]["lm"]["weight"]
        if lm_w is None:
            lm_w = other["embed_tokens"]["weight"]  # tied
        logits = h @ lm_w.T
        return logits.reshape(m_, mbl, t_, -1)

    other = {k: v for k, v in pparams.items() if k != "stacked_layers"}
    mb_spec = P(None, "data") if n_data > 1 else P()
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P("pipe"), P(), mb_spec, mb_spec, mb_spec, mb_spec, P()),
        out_specs=mb_spec,
        check_vma=False,
    )
    logits = sharded(
        pparams["stacked_layers"],
        other,
        input_ids.reshape(n_micro, mb, t),
        combined_mask.reshape(n_micro, mb, *combined_mask.shape[1:]),
        padding_bias.reshape(n_micro, mb, *padding_bias.shape[1:]),
        attention_mask.reshape(n_micro, mb, t),
        dropout_rng,
    )
    return logits.reshape(b, t, -1)


def make_pipeline_clm_train_step(cfg, tx, mesh: Mesh, n_micro: int,
                                 use_flash: bool = False, remat: bool = False):
    """Pipelined analogue of `make_clm_train_step`."""
    from outeffhop_tpu.models.opt import clm_loss
    from outeffhop_tpu.parallel.train import TrainState
    import optax

    def train_step(state: TrainState, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_of(pparams):
            logits = opt_pipeline_forward(
                pparams, cfg, batch["input_ids"], batch.get("attention_mask"),
                mesh, n_micro, dropout_rng=rng,
                deterministic=False, use_flash=use_flash, remat=remat,
            )
            return clm_loss(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            loss,
        )

    return jax.jit(train_step, donate_argnums=(0,))


def make_pipeline_mlm_train_step(cfg, tx, mesh: Mesh, n_micro: int,
                                 use_flash: bool = False, remat: bool = False):
    """Pipelined analogue of `make_mlm_train_step` (same TrainState / tx
    contract; batch replicated across stages, grads correct via the
    shard_map transpose's psum over the masked last-stage loss)."""
    from outeffhop_tpu.models.bert import mlm_loss
    from outeffhop_tpu.parallel.train import TrainState
    import optax

    def train_step(state: TrainState, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_of(pparams):
            logits = bert_pipeline_mlm_forward(
                pparams, cfg, batch["input_ids"], batch.get("attention_mask"),
                mesh, n_micro, dropout_rng=rng,
                deterministic=False, use_flash=use_flash, remat=remat,
            )
            return mlm_loss(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            loss,
        )

    return jax.jit(train_step, donate_argnums=(0,))
