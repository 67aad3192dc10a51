"""ViT image-classification training driver.

Reproduces the capability set of `run_vit.py` (the reference's timm train
script + attention surgery, :497-1433), TPU-native:

  * model: the shared ViT family with *WithExtras attention (softmax
    variants, clipped-α, gating) selected by the same CLI flags the surgery
    loop consumes in the reference (:633-658);
  * augmentation: batch Mixup / CutMix with Beta(α,α) mixing and a 0.5
    switch probability, label smoothing — all inside the jitted train step
    (timm Mixup, run_vit.py:891-904), implemented with static-shape masks;
  * optimizer: AdamW + cosine schedule with linear warmup (timm defaults),
    global-norm clip, gradient accumulation via optax.MultiSteps
    (:1192-1260 manual accum equivalent);
  * model EMA tracked inside the same jitted step (timm ModelEmaV2,
    run_vit.py:771-777); EMA weights validated alongside the live ones;
  * bf16 param/compute option — TPU's AMP equivalent (NativeScaler/fp16 loss
    scaling, :744-768, is unnecessary in bf16);
  * telemetry: per-interval weight/act ∞-norms (wandb block :1267-1291) via
    the probe tape on the eval pass;
  * checkpointing: per-epoch save, best-top1 tracking ("CheckpointSaver
    keeps best-N", :1004-1015), resume;
  * data: synthetic class-conditional images by default (hermetic), or
    {images,labels}.npy dirs for real datasets; DP sharding over the mesh
    (raw NCCL DDP init, :513-567 → jax mesh).
"""

from __future__ import annotations

import argparse
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from outeffhop_tpu.drivers import args as A
from outeffhop_tpu.drivers.common import cast_params, dropout_key, write_results
from outeffhop_tpu.drivers.validate_vit import vit_config_from_args
from outeffhop_tpu.models.vit import accuracy_topk, init_vit_params, vit_forward
from outeffhop_tpu.parallel.mesh import batch_pspec, make_mesh, shard_params
from outeffhop_tpu.parallel.train import decay_mask
from outeffhop_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for add in (A.add_model_args, A.add_softmax_args, A.add_quant_args,
                A.add_training_args, A.add_data_args, A.add_tpu_args):
        add(p)
    g = p.add_argument_group("vit-train (run_vit.py flags)")
    g.add_argument("--model", type=str, default=None, help="vit preset name")
    g.add_argument("--img_size", type=int, default=32)
    g.add_argument("--patch_size", type=int, default=8)
    g.add_argument("--num_classes", type=int, default=10)
    g.add_argument("--image_dir", type=str, default=None,
                   help="dir of train_{images,labels}.npy + val_{images,labels}.npy")
    g.add_argument("--train_samples", type=int, default=512,
                   help="synthetic train-set size")
    g.add_argument("--mixup", type=float, default=0.0, help="mixup α (0 = off)")
    g.add_argument("--cutmix", type=float, default=0.0, help="cutmix α (0 = off)")
    g.add_argument("--aa", type=str, default=None,
                   help="rand-augment config, timm syntax e.g. rand-m9-mstd0.5 "
                        "(reference run_vit.py:883-895); runs on-device in the "
                        "jitted train step")
    g.add_argument("--reprob", type=float, default=0.0,
                   help="random-erasing probability, 'pixel' mode "
                        "(reference run_vit.py --reprob)")
    g.add_argument("--smoothing", type=float, default=0.1, help="label smoothing")
    g.add_argument("--model_ema", action="store_true")
    g.add_argument("--model_ema_decay", type=float, default=0.9998)
    g.add_argument("--warmup_epochs", type=int, default=0)
    # --tb_scalar_log_interval comes from add_training_args
    return p


# ---------------------------------------------------------------------------
# Mixup / CutMix / smoothing — static-shape, jit-safe
# ---------------------------------------------------------------------------


def _rand_beta(key, alpha: float):
    # Beta(α, α) via two gammas; α is static.
    g1 = jax.random.gamma(key, alpha)
    key2 = jax.random.fold_in(key, 1)
    g2 = jax.random.gamma(key2, alpha)
    return g1 / (g1 + g2)


def _cutmix_mask(key, H: int, W: int, lam):
    """Random box covering (1−λ) of the area (timm rand_bbox); returns
    (H, W) float mask of the KEPT region and the corrected λ."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (ratio * H).astype(jnp.int32)
    cut_w = (ratio * W).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    y0 = jnp.clip(cy - cut_h // 2, 0, H)
    y1 = jnp.clip(cy + cut_h // 2, 0, H)
    x0 = jnp.clip(cx - cut_w // 2, 0, W)
    x1 = jnp.clip(cx + cut_w // 2, 0, W)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / float(H * W)
    return jnp.where(inside, 0.0, 1.0), lam_adj


def mix_batch(key, images, labels, mixup_alpha: float, cutmix_alpha: float):
    """→ (mixed_images, labels_a, labels_b, λ). One λ per batch (timm
    default); 0.5 switch between mixup and cutmix when both are enabled."""
    B, H, W, _ = images.shape
    k_perm, k_lam, k_box, k_switch = jax.random.split(key, 4)
    perm = jax.random.permutation(k_perm, B)
    if mixup_alpha <= 0 and cutmix_alpha <= 0:
        return images, labels, labels, jnp.float32(1.0)

    def do_mixup(_):
        lam = _rand_beta(k_lam, mixup_alpha if mixup_alpha > 0 else cutmix_alpha)
        mixed = lam * images + (1 - lam) * images[perm]
        return mixed, lam

    def do_cutmix(_):
        lam0 = _rand_beta(k_lam, cutmix_alpha if cutmix_alpha > 0 else mixup_alpha)
        mask, lam = _cutmix_mask(k_box, H, W, lam0)
        mixed = images * mask[None, :, :, None] + images[perm] * (1 - mask)[None, :, :, None]
        return mixed, lam

    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.bernoulli(k_switch, 0.5)
        mixed, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)
    elif cutmix_alpha > 0:
        mixed, lam = do_cutmix(None)
    else:
        mixed, lam = do_mixup(None)
    return mixed, labels, labels[perm], lam


def smoothed_ce(logits, labels, smoothing: float):
    # logsumexp formulation: nll = lse - logits[y]; the uniform-smoothing
    # term is -mean_c(logp) = lse - mean_c(logits) (see models/bert.py)
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    nll = lse - jnp.take_along_axis(lf, labels[:, None], axis=-1)[:, 0]
    if smoothing <= 0:
        return nll.mean()
    smooth = lse - lf.mean(axis=-1)
    return ((1 - smoothing) * nll + smoothing * smooth).mean()


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


def load_data(args, cfg):
    if args.image_dir:
        xtr = np.load(os.path.join(args.image_dir, "train_images.npy"))
        ytr = np.load(os.path.join(args.image_dir, "train_labels.npy"))
        xva = np.load(os.path.join(args.image_dir, "val_images.npy"))
        yva = np.load(os.path.join(args.image_dir, "val_labels.npy"))
        return (xtr, ytr), (xva, yva)
    # class-conditional Gaussians (learnable; hermetic)
    rs = np.random.RandomState(args.seed)
    means = rs.normal(0, 1, (cfg.num_classes, cfg.img_size, cfg.img_size, cfg.in_chans))

    def make(n, s):
        r = np.random.RandomState(s)
        y = r.randint(0, cfg.num_classes, n)
        x = means[y] + r.normal(0, 0.5, (n, cfg.img_size, cfg.img_size, cfg.in_chans))
        return x.astype(np.float32), y.astype(np.int32)

    return make(args.train_samples, args.seed + 1), make(
        max(args.train_samples // 4, args.per_device_eval_batch_size), args.seed + 2
    )


# ---------------------------------------------------------------------------
# Main
# ---------------------------------------------------------------------------


def main(argv=None):
    args = build_parser().parse_args(argv)
    A.setup_platform(args)
    from jax.sharding import NamedSharding

    cfg = vit_config_from_args(args)
    params = cast_params(init_vit_params(jax.random.PRNGKey(args.seed), cfg), args.dtype)
    pipeline = args.pipeline_stages and args.pipeline_stages > 1
    if pipeline:
        if args.mesh_model > 1:
            raise ValueError("--pipeline_stages is incompatible with --mesh_model")
        from outeffhop_tpu.drivers.common import build_pipeline_mesh
        from outeffhop_tpu.parallel import to_vit_pipeline_params

        pmesh = build_pipeline_mesh(args)
        mesh = None
        params = to_vit_pipeline_params(params, pmesh)
    else:
        mesh = make_mesh(n_model=max(args.mesh_model, 1))
        params = shard_params(params, mesh)

    (xtr, ytr), (xva, yva) = load_data(args, cfg)
    bs = args.per_device_train_batch_size
    steps_per_epoch = max(len(xtr) // bs, 1)
    accum = args.gradient_accumulation_steps
    total_steps = args.max_train_steps or (
        steps_per_epoch * args.num_train_epochs // accum
    )
    warmup = args.num_warmup_steps or args.warmup_epochs * steps_per_epoch // max(accum, 1)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, max(warmup, 1), max(total_steps, 2), end_value=0.0
    )
    if args.optimizer_impl == "fused":
        from outeffhop_tpu.parallel.train import fused_clip_adamw

        tx = fused_clip_adamw(
            params, sched, betas=(args.adam_beta1, args.adam_beta2),
            weight_decay=args.weight_decay, clip_norm=args.max_grad_norm,
        )
    elif args.optimizer_impl == "flat":
        from outeffhop_tpu.parallel.train import flat_adamw

        tx = flat_adamw(
            params, sched, betas=(args.adam_beta1, args.adam_beta2),
            weight_decay=args.weight_decay, clip_norm=args.max_grad_norm,
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(args.max_grad_norm),
            optax.adamw(
                sched, b1=args.adam_beta1, b2=args.adam_beta2,
                weight_decay=args.weight_decay, mask=decay_mask(params),
            ),
        )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    opt_state = tx.init(params)
    # a distinct copy: params and ema are both donated to the train step
    ema_params = jax.tree.map(jnp.copy, params) if args.model_ema else None
    from outeffhop_tpu.drivers.common import resolve_train_use_flash

    use_flash = resolve_train_use_flash(
        args.use_flash, causal=False, n_layers=cfg.depth,
        batch=args.per_device_train_batch_size,
        seq=(cfg.img_size // cfg.patch_size) ** 2 + 1,
        n_heads=cfg.num_heads,
    )

    def loss_fn(p, images, labels_a, labels_b, lam, rng):
        if pipeline:
            from outeffhop_tpu.parallel import vit_pipeline_forward

            logits = vit_pipeline_forward(
                p, cfg, images, pmesh, args.pipeline_microbatches,
                dropout_rng=rng, deterministic=False, use_flash=use_flash,
                remat=args.remat_policy if args.remat else False,
            )
        else:
            logits = vit_forward(
                p, cfg, images, dropout_rng=rng, deterministic=False,
                use_flash=use_flash, remat=args.remat_policy if args.remat else False,
            )
        la = smoothed_ce(logits, labels_a, args.smoothing)
        lb = smoothed_ce(logits, labels_b, args.smoothing)
        return lam * la + (1 - lam) * lb

    aa_cfg = None
    if args.aa:
        from outeffhop_tpu.data.augment import parse_rand_augment_config

        aa_cfg = parse_rand_augment_config(args.aa)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(p, opt_state, ema, images, labels, rng):
        k_aa, k_erase, k_mix, k_drop = jax.random.split(rng, 4)
        images = images.astype(jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
        if aa_cfg is not None:
            from outeffhop_tpu.data.augment import rand_augment

            images = rand_augment(images, k_aa, **aa_cfg)
        if args.reprob > 0:
            from outeffhop_tpu.data.augment import random_erasing

            images = random_erasing(images, k_erase, prob=args.reprob)
        mixed, la, lb, lam = mix_batch(k_mix, images, labels, args.mixup, args.cutmix)
        loss, grads = jax.value_and_grad(loss_fn)(p, mixed, la, lb, lam, k_drop)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        if ema is not None:
            d = args.model_ema_decay
            ema = jax.tree.map(lambda e, q: e * d + q.astype(e.dtype) * (1 - d), ema, p)
        return p, opt_state, ema, loss

    @jax.jit
    def eval_step(p, images, labels):
        if pipeline:
            from outeffhop_tpu.parallel import vit_pipeline_forward

            logits = vit_pipeline_forward(
                p, cfg, images, pmesh, args.pipeline_microbatches,
                deterministic=True, use_flash=use_flash,
            )
        else:
            logits = vit_forward(p, cfg, images, deterministic=True, use_flash=use_flash)
        return (
            accuracy_topk(logits, labels, k=1),
            accuracy_topk(logits, labels, k=min(5, cfg.num_classes)),
        )

    def validate(p):
        t1s, t5s = [], []
        ebs = args.per_device_eval_batch_size
        for s in range(0, len(xva) - ebs + 1, ebs):
            t1, t5 = eval_step(p, jnp.asarray(xva[s:s + ebs]), jnp.asarray(yva[s:s + ebs]))
            t1s.append(float(t1))
            t5s.append(float(t5))
        return float(np.mean(t1s)), float(np.mean(t5s))

    start_epoch = 0
    if args.resume_from_checkpoint:
        found = latest_checkpoint(args.resume_from_checkpoint)
        if found:
            path, _, idx = found
            state = restore_checkpoint(path, like={"params": params, "opt": opt_state})
            params, opt_state = state["params"], state["opt"]
            start_epoch = idx + 1
            print(f"resumed from {path} (epoch {idx})")

    from outeffhop_tpu.utils.tracking import init_tracker

    tracker = init_tracker(args, config=vars(args))
    from outeffhop_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler(
        args.profile_dir, args.profile_start_step, args.profile_steps
    )
    try:
        rng = dropout_key(args.seed + 99, args.rng_impl, args.dropout_rng_bits)
        best_top1, losses, completed = -1.0, [], 0
        batch_sharding = None if pipeline else NamedSharding(mesh, batch_pspec())
        for epoch in range(start_epoch, args.num_train_epochs):
            perm = np.random.RandomState(args.seed + epoch).permutation(len(xtr))
            for s in range(0, len(perm) - bs + 1, bs):
                sel = perm[s:s + bs]
                if pipeline:
                    imgs, labs = jnp.asarray(xtr[sel]), jnp.asarray(ytr[sel])
                else:
                    imgs = jax.device_put(jnp.asarray(xtr[sel]), batch_sharding)
                    labs = jax.device_put(jnp.asarray(ytr[sel]), batch_sharding)
                params, opt_state, ema_params, loss = train_step(
                    params, opt_state, ema_params, imgs, labs,
                    jax.random.fold_in(rng, completed),
                )
                profiler.tick(completed, fence_on=loss)
                losses.append(float(loss))
                completed += 1
                if (
                    args.tb_scalar_log_interval
                    and completed % args.tb_scalar_log_interval == 0
                ):
                    w_inf = max(
                        float(jnp.max(jnp.abs(l)))
                        for l in jax.tree.leaves(params)
                        if l is not None
                    )
                    print(f"step {completed} loss {losses[-1]:.4f} max|w|_inf {w_inf:.3f}")
                if args.max_train_steps and completed >= args.max_train_steps:
                    break
            top1, top5 = validate(params)
            tracker.log(
                {"train/loss": losses[-1] if losses else 0.0, "eval/top1": top1,
                 "eval/top5": top5}, epoch,
            )
            if args.model_ema:
                e1, _ = validate(ema_params)
                print(f"epoch {epoch}: top1 {top1:.4f} top5 {top5:.4f} ema_top1 {e1:.4f}")
            else:
                print(f"epoch {epoch}: top1 {top1:.4f} top5 {top5:.4f}")
            if args.output_dir:
                save_checkpoint(args.output_dir, f"epoch_{epoch}",
                                {"params": params, "opt": opt_state})
                if top1 > best_top1:
                    save_checkpoint(args.output_dir, "best", {"params": params, "opt": opt_state})
            best_top1 = max(best_top1, top1)
            if args.max_train_steps and completed >= args.max_train_steps:
                break

    finally:
        profiler.close()
    top1, top5 = validate(params)
    results = {
        "train_loss": float(np.mean(losses[-50:])) if losses else None,
        "top1": top1,
        "top5": top5,
        "best_top1": max(best_top1, top1),
        "completed_steps": completed,
    }
    if args.model_ema:
        results["ema_top1"], results["ema_top5"] = validate(ema_params)
    tracker.finish()
    if args.output_dir:
        with open(os.path.join(args.output_dir, "args.json"), "w") as f:
            json.dump(vars(args), f, indent=2, default=str)
    write_results(args.output_dir, results)
    return results


if __name__ == "__main__":
    main()
