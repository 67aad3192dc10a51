"""Sharded training step — TPU-native equivalent of the reference's
accelerate/DDP train loops (`run_mlm.py:437-673`, `run_clm.py:460-480`).

The reference's optimizer recipe is reproduced exactly:

  * AdamW with TWO param groups — weight decay applied to everything except
    biases and LayerNorm weights (`run_mlm.py:437-450`); implemented as an
    optax mask, which is the functional equivalent of the group split.
  * BERT MLM: lr 1e-4, linear warmup+decay, clip 1.0 (`submit_outlier_bert.sh`).
  * OPT CLM: betas (0.9, 0.95) per the OPT paper (`run_clm.py:460-462`) and the
    warmup/total-step stretch for `final_lr_fraction`
    (`a = 1/(1-(1-w)*eps)`, `run_clm.py:470-480`).
  * Gradient accumulation (`accelerator.accumulate`) → `optax.MultiSteps`.

DDP's gradient all-reduce is not written anywhere here: the batch is sharded on
the mesh's `data` axis and params are replicated over it, so XLA emits the
cross-replica psum inside the jitted step (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from outeffhop_tpu.parallel.mesh import batch_pspec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def decay_mask(params):
    """True where weight decay applies: everything except biases and LN/gate
    scalars (`run_mlm.py:437-450` no_decay = ["bias", "LayerNorm.weight"])."""

    def is_decay(path, leaf):
        if leaf is None:
            return False
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if names and names[-1] == "bias":
            return False
        # LN params are {"weight","bias"} under a key containing "ln"
        if any("ln" in n.lower() for n in names):
            return False
        if any("gate" in n.lower() for n in names):
            return False
        # learned quantizer ranges (QAT bundle): never weight-decayed — decay
        # would shrink every scale toward zero regardless of the data
        if any(n == "ranges" for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(
        is_decay, params, is_leaf=lambda x: x is None
    )


def linear_schedule_with_stretch(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    final_lr_fraction: float = 0.0,
) -> optax.Schedule:
    """Linear warmup → linear decay; when final_lr_fraction=eps>0, stretch the
    decay so the schedule hits lr*eps exactly at `total_steps`
    (`run_clm.py:470-480`: a = 1/(1-(1-w)*eps), applied to warmup & total)."""
    if final_lr_fraction > 0.0:
        w = warmup_steps / total_steps
        a = 1.0 / (1.0 - (1.0 - w) * final_lr_fraction)
        warmup_steps = int(round(a * warmup_steps))
        total_steps = int(round(a * total_steps))

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(warmup_steps, 1)
        decay = (total_steps - count) / jnp.maximum(total_steps - warmup_steps, 1)
        return lr * jnp.clip(jnp.where(count < warmup_steps, warm, decay), 0.0, 1.0)

    return schedule


def _clip_by_global_inf_norm(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_(norm_type=inf) equivalent: scale all
    grads by max_norm / max(|g|) when the global max-abs exceeds max_norm."""

    def update(updates, state, params=None):
        del params
        g_norm = jax.tree.reduce(
            jnp.maximum,
            jax.tree.map(lambda g: jnp.max(jnp.abs(g)), updates),
            jnp.asarray(0.0),
        )
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g_norm, 1e-16))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlatAdamWState:
    count: jax.Array
    m: jax.Array
    v: jax.Array


def flat_adamw(
    params_template,
    sched,
    *,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = None,
    grad_norm_type: float = 2.0,
) -> optax.GradientTransformation:
    """AdamW (+ optional global-norm clip) over ONE flattened buffer.

    MEASURED AND REJECTED as the default (kept as a documented option):
    isolated, the flat buffer wins big — probe37 timed the identical
    clip+adamw math at 7.38 ms/update over BERT-base's 203-leaf tree vs
    2.84 ms flat (per-leaf kernel-launch overhead). But in the REAL train
    step it LOSES: 35.32 vs 27.21 ms (probe31 'flat' cell) — the per-leaf
    chain lets XLA's latency-hiding scheduler overlap optimizer kernels
    with the tail of the backward, while ravel_pytree's concatenate needs
    every grad first (a full barrier) and adds ~0.8 GB of gather/split
    copies. A lesson in measuring inside the real program, not standalone.

    Semantics match optax.chain(clip_by_global_norm, adamw) with the decay
    mask from `decay_mask` (tests assert equivalence). The moments live in
    the PARAM dtype like optax's default (mu_dtype=None). The opt-state
    STRUCTURE differs from the optax chain — checkpoints are not
    interchangeable between the two.
    """
    from jax.flatten_util import ravel_pytree

    b1, b2 = betas
    mask_tree = decay_mask(params_template)
    mask_flat, _ = ravel_pytree(
        jax.tree.map(
            lambda use_wd, x: None if x is None else jnp.full(
                x.shape, 1.0 if use_wd else 0.0, x.dtype
            ),
            mask_tree,
            params_template,
            is_leaf=lambda x: x is None,
        )
    )

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat),
            v=jnp.zeros_like(flat),
        )

    def update(updates, state, params=None):
        g, _ = ravel_pytree(updates)
        p, unravel = ravel_pytree(params)
        if clip_norm is not None:
            gf = g.astype(jnp.float32)
            if grad_norm_type == float("inf"):
                gn = jnp.max(jnp.abs(gf))
            else:
                gn = jnp.sqrt(jnp.sum(gf * gf))
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gn, 1e-16))
            g = (gf * scale).astype(g.dtype)
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        cf = count.astype(jnp.float32)
        mhat = m.astype(jnp.float32) / (1.0 - b1**cf)
        vhat = v.astype(jnp.float32) / (1.0 - b2**cf)
        upd = mhat / (jnp.sqrt(vhat) + eps)
        if weight_decay:
            upd = upd + weight_decay * mask_flat.astype(jnp.float32) * p.astype(
                jnp.float32
            )
        # optax's scale_by_schedule reads its counter BEFORE incrementing:
        # the first update uses sched(0) (zero lr under a 1-step warmup)
        upd = (-sched(state.count) * upd).astype(p.dtype)
        return unravel(upd), FlatAdamWState(count=count, m=m, v=v)

    return optax.GradientTransformation(init, update)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedAdamWState:
    count: jax.Array
    m: Any
    v: Any


def fused_clip_adamw(
    params_template,
    sched,
    *,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = None,
    grad_norm_type: float = 2.0,
) -> optax.GradientTransformation:
    """Global-norm clip FOLDED into the AdamW update — one transform, still
    per-leaf (no flat buffer; see `flat_adamw` for why flattening loses).

    optax.chain(clip_by_global_norm, adamw) pays a dedicated read+write pass
    over every grad leaf just to apply the clip scale before adam reads them
    again — XLA does not fuse the scaled-grad producers into the adam
    fusions across the global-norm barrier (probe28b: clip alone 2.0 ms on
    BERT-base vs the ~0.8 ms one-read floor of the norm reduction itself).
    Here the norm reduction reads the grads once and `g * scale` is inlined
    into the m/v moment update, so each leaf is touched by exactly one
    elementwise chain: read {g, m, v, p} -> write {m, v, update}.

    Math matches optax.chain(clip_by_global_norm | inf-clip, adamw(mask=
    decay_mask)) leaf for leaf (tests assert equivalence); the schedule
    counter reads BEFORE increment like optax's scale_by_schedule (first
    update uses sched(0)). The opt-state STRUCTURE differs from the optax
    chain — checkpoints are not interchangeable between the two.
    """
    b1, b2 = betas
    # keep None leaves as None so the mask matches the grads' tree structure
    # (decay_mask marks them False, which breaks flatten_up_to)
    mask_tree = jax.tree.map(
        lambda use_wd, x: None if x is None else use_wd,
        decay_mask(params_template),
        params_template,
        is_leaf=lambda x: x is None,
    )

    def init(params):
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        if clip_norm is not None:
            if grad_norm_type == float("inf"):
                gn = jax.tree.reduce(
                    jnp.maximum,
                    jax.tree.map(lambda g: jnp.max(jnp.abs(g)), updates),
                    jnp.asarray(0.0),
                )
            else:
                gn = jnp.sqrt(
                    jax.tree.reduce(
                        jnp.add,
                        jax.tree.map(
                            lambda g: jnp.sum(jnp.square(g.astype(jnp.float32))),
                            updates,
                        ),
                        jnp.asarray(0.0, jnp.float32),
                    )
                )
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gn, 1e-16))
        else:
            scale = None
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf
        lr_t = sched(state.count)  # pre-increment, like optax scale_by_schedule

        def leaf(g, m, v, p, use_wd):
            if scale is not None:
                g = g * scale.astype(g.dtype)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * jnp.square(g)
            upd = (m2.astype(jnp.float32) / bc1) / (
                jnp.sqrt(v2.astype(jnp.float32) / bc2) + eps
            )
            if weight_decay and use_wd:
                upd = upd + weight_decay * p.astype(jnp.float32)
            return (-lr_t * upd).astype(p.dtype), m2, v2

        flat_g, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        flat_p = treedef.flatten_up_to(params)
        flat_mask = treedef.flatten_up_to(mask_tree)
        out = [
            leaf(g, m, v, p, wd)
            for g, m, v, p, wd in zip(flat_g, flat_m, flat_v, flat_p, flat_mask)
        ]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        return new_updates, FusedAdamWState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init, update)


def make_adamw(
    params,
    lr: float = 1e-4,
    *,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    warmup_steps: int = 0,
    total_steps: int = 1,
    final_lr_fraction: float = 0.0,
    clip_norm: Optional[float] = 1.0,
    accum_steps: int = 1,
    scheduler: str = "linear",
    grad_norm_type: float = 2.0,
    flat: bool = False,
    fused: bool = False,
) -> optax.GradientTransformation:
    """`scheduler` ∈ {linear, cosine, constant} (`--lr_scheduler_type`,
    reference args.py); `grad_norm_type` 2.0 or inf (`--grad_norm_type`,
    torch clip_grad_norm_'s norm_type). `flat` runs clip+adamw over one
    flattened buffer — measured SLOWER end-to-end (the flat concat is a
    barrier against backward/optimizer overlap; see `flat_adamw`), kept as
    an option; opt-state structure differs, checkpoints not
    interchangeable. `fused` folds the clip scale into the per-leaf adam
    update (`fused_clip_adamw`), skipping the separate scaled-grad pass."""
    if scheduler == "linear":
        sched = linear_schedule_with_stretch(
            lr, warmup_steps, total_steps, final_lr_fraction
        )
    elif scheduler == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=lr * final_lr_fraction,
        )
    elif scheduler == "constant":
        warm = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
        sched = optax.join_schedules(
            [warm, optax.constant_schedule(lr)], [max(warmup_steps, 1)]
        )
    else:
        raise ValueError(f"unknown scheduler {scheduler!r} (linear|cosine|constant)")
    if grad_norm_type not in (2.0, float("inf")):
        raise ValueError("grad_norm_type must be 2.0 or inf")
    if flat and fused:
        raise ValueError("flat and fused are mutually exclusive")
    if flat:
        tx = flat_adamw(
            params, sched, betas=betas, eps=eps, weight_decay=weight_decay,
            clip_norm=clip_norm, grad_norm_type=grad_norm_type,
        )
        if accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
        return tx
    if fused:
        tx = fused_clip_adamw(
            params, sched, betas=betas, eps=eps, weight_decay=weight_decay,
            clip_norm=clip_norm, grad_norm_type=grad_norm_type,
        )
        if accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
        return tx
    chain = []
    if clip_norm is not None:
        if grad_norm_type == float("inf"):
            chain.append(_clip_by_global_inf_norm(clip_norm))
        elif grad_norm_type == 2.0:
            chain.append(optax.clip_by_global_norm(clip_norm))
        else:
            raise ValueError("grad_norm_type must be 2.0 or inf")
    chain.append(
        optax.adamw(
            sched,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=decay_mask(params),
        )
    )
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def _make_train_step(loss_fn: Callable, tx: optax.GradientTransformation):
    def train_step(state: TrainState, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_of(params):
            return loss_fn(params, batch, rng)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            loss,
        )

    return train_step


def _qat_ctx(trainable, qat_config, grad_scaling):
    """Split a QAT bundle {'model', 'ranges'} into (model_params, run-mode
    quant ctx over the *traced* range leaves) — the `learn_ranges` FSM state
    (`quantization_manager.py:80-87`): fake-quant runs with trainable
    delta/zero_float, gradients flow via the STE machinery."""
    from outeffhop_tpu.quant.calibrate import NULL_QCTX, QuantCtx, ScopedQuantCtx

    if qat_config is None:
        return trainable, NULL_QCTX
    ranges = trainable["ranges"]
    ctx = QuantCtx.run(
        qat_config, ranges["w"], ranges["a"], grad_scaling=grad_scaling
    )
    return trainable["model"], ScopedQuantCtx(ctx, "")


def make_mlm_train_step(
    cfg,
    tx,
    mesh: Optional[Mesh] = None,
    use_flash: bool = False,
    qat_config=None,
    grad_scaling: bool = True,
    remat: bool = False,
):
    """BERT MLM train step: batch = dict(input_ids, attention_mask, labels).

    With `qat_config` (a QuantizedModelConfig), the state's params pytree is a
    {'model': params, 'ranges': RangesBundle} QAT bundle and the forward runs
    fake-quantized with trainable ranges (learned-ranges QAT)."""
    from outeffhop_tpu.models.bert import bert_mlm_forward, mlm_loss

    def loss_fn(trainable, batch, rng):
        params, q = _qat_ctx(trainable, qat_config, grad_scaling)
        logits = bert_mlm_forward(
            params,
            cfg,
            batch["input_ids"],
            batch.get("attention_mask"),
            q=q,
            dropout_rng=rng,
            deterministic=False,
            use_flash=use_flash,
            remat=remat,
        )
        return mlm_loss(logits, batch["labels"])

    step = _make_train_step(loss_fn, tx)
    if mesh is not None:
        return _sharded_step(step, mesh)
    return jax.jit(step, donate_argnums=(0,))


def make_clm_train_step(
    cfg,
    tx,
    mesh: Optional[Mesh] = None,
    use_flash: bool = False,
    qat_config=None,
    grad_scaling: bool = True,
    remat: bool = False,
):
    """OPT CLM train step: batch = dict(input_ids, attention_mask, labels)
    with labels = input_ids (`run_clm.py` block packing). `qat_config` enables
    the learned-ranges QAT bundle as in `make_mlm_train_step`."""
    from outeffhop_tpu.models.opt import clm_loss, opt_forward

    def loss_fn(trainable, batch, rng):
        params, q = _qat_ctx(trainable, qat_config, grad_scaling)
        logits, _ = opt_forward(
            params,
            cfg,
            batch["input_ids"],
            batch.get("attention_mask"),
            q=q,
            dropout_rng=rng,
            deterministic=False,
            use_flash=use_flash,
            remat=remat,
        )
        return clm_loss(logits, batch["labels"])

    step = _make_train_step(loss_fn, tx)
    if mesh is not None:
        return _sharded_step(step, mesh)
    return jax.jit(step, donate_argnums=(0,))


def _sharded_step(step, mesh: Mesh):
    """jit the step with batch sharded on `data`; param/opt-state shardings are
    taken from the (already device_put) state and propagated by XLA."""
    batch_sharding = NamedSharding(mesh, batch_pspec())

    return jax.jit(
        step,
        in_shardings=(None, batch_sharding, None),
        donate_argnums=(0,),
    )


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
