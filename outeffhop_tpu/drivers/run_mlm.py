"""BERT MLM pretraining driver.

Reproduces `run_mlm.py` / `run_mlm_ddp.py` / `run_mlm_origin.py` as ONE
driver (the reference's three variants differ only in launch plumbing and a
fixed bug): args → config (+YAML overlay, run_mlm.py:147-153) → attention
surgery via config knobs → token pipeline (group_texts chunking :364-377) →
AdamW with two weight-decay groups (:437-450) → linear warmup/decay schedule →
sharded train step over the ('data','model') mesh (the accelerate/DDP
equivalent, SURVEY.md §2.8) → grad-accum, clip 1.0 → checkpoint every N steps
(`step_{i}` naming, resume parsing :517-543) → eval with ∞-norm/kurtosis
telemetry → final save.

The reference's `args.ucky2` bug (`run_mlm.py:456` — crashes multi-epoch runs;
fixed only in the ddp/origin variants) is not replicated.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.drivers import args as A
from outeffhop_tpu.drivers.common import (
    cast_params, dropout_key, eval_loop, token_nll, write_results,
)
from outeffhop_tpu.drivers.validate_mlm import bert_config_from_args, make_batches
from outeffhop_tpu.models.bert import bert_mlm_forward, init_bert_params, mlm_loss
from outeffhop_tpu.parallel import make_adamw, make_mesh, make_mlm_train_step, shard_params
from outeffhop_tpu.parallel.mesh import batch_pspec, put_batch
from outeffhop_tpu.parallel.train import init_train_state
from outeffhop_tpu.utils.checkpoint import (
    latest_checkpoint,
    prune_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for add in (A.add_model_args, A.add_softmax_args, A.add_quant_args,
                A.add_training_args, A.add_data_args, A.add_tpu_args):
        add(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    A.setup_platform(args)
    from jax.sharding import NamedSharding

    cfg = bert_config_from_args(args)
    # bert_config_from_args zeroes dropout for the *eval* drivers; training
    # uses the HF bert-base defaults (0.1/0.1, reference run_mlm.py builds
    # AutoConfig) unless the override flags are given.
    cfg = dataclasses.replace(
        cfg,
        hidden_dropout_prob=(
            args.hidden_dropout if args.hidden_dropout is not None else 0.1
        ),
        attention_probs_dropout_prob=(
            args.attn_dropout if args.attn_dropout is not None else 0.1
        ),
    )
    params = init_bert_params(jax.random.PRNGKey(args.seed), cfg)
    params = cast_params(params, args.dtype)

    n_dev = jax.device_count()
    pipeline = args.pipeline_stages and args.pipeline_stages > 1
    if pipeline:
        if args.learn_ranges or args.mesh_model > 1:
            raise ValueError(
                "--pipeline_stages is incompatible with --learn_ranges / "
                "--mesh_model (see parallel/pipeline.py)"
            )
        from outeffhop_tpu.drivers.common import build_pipeline_mesh
        from outeffhop_tpu.parallel import to_bert_pipeline_params

        pmesh = build_pipeline_mesh(args)
        mesh = None
        params = to_bert_pipeline_params(params, pmesh)
    else:
        n_model = args.mesh_model if n_dev % max(args.mesh_model, 1) == 0 else 1
        mesh = make_mesh(n_model=max(n_model, 1))
        params = shard_params(params, mesh)

    train_batches = make_batches(args, cfg, split_seed=args.seed)
    eval_batches = make_batches(args, cfg, split_seed=1234)[:16]
    steps_per_epoch = max(len(train_batches) // args.gradient_accumulation_steps, 1)
    total_steps = args.max_train_steps or steps_per_epoch * args.num_train_epochs

    # learned-ranges QAT (`--quantize --learn_ranges`): calibrate once on the
    # first est_num_batches, then train with quantizer ranges as parameters
    # (quantization_manager.py:80-87 learn_ranges; LSQ grad scaling)
    qat_config = None
    trainable = params
    if args.quantize and args.learn_ranges:
        from outeffhop_tpu.drivers.common import build_quant_ctx
        from outeffhop_tpu.quant.learn_ranges import make_ranges_trainable

        qat_config = A.quant_config_from_args(args)

        def calib_fwd(batch, qctx):
            bert_mlm_forward(
                params, cfg,
                jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
                q=qctx, deterministic=True,
            )

        calib = train_batches[: args.est_num_batches]
        qctx0 = build_quant_ctx(calib_fwd, qat_config, calib)
        ranges = make_ranges_trainable(
            qctx0._ctx.weight_qparams, qctx0._ctx.act_qparams
        )
        trainable = {"model": params, "ranges": ranges}

    tx = make_adamw(
        trainable,
        lr=args.learning_rate,
        betas=(args.adam_beta1, args.adam_beta2),
        weight_decay=args.weight_decay,
        warmup_steps=args.num_warmup_steps,
        total_steps=total_steps,
        clip_norm=args.max_grad_norm,
        accum_steps=args.gradient_accumulation_steps,
        scheduler=args.lr_scheduler_type,
        grad_norm_type=args.grad_norm_type,
        fused=args.optimizer_impl == "fused",
        flat=args.optimizer_impl == "flat",
    )
    state = init_train_state(trainable, tx)
    from outeffhop_tpu.drivers.common import resolve_train_use_flash

    use_flash = resolve_train_use_flash(
        args.use_flash, causal=False, n_layers=cfg.num_hidden_layers,
        batch=args.per_device_train_batch_size, seq=args.block_size_mlm,
        n_heads=cfg.num_attention_heads,
    )
    if pipeline:
        from outeffhop_tpu.parallel import make_pipeline_mlm_train_step

        step_fn = make_pipeline_mlm_train_step(
            cfg, tx, pmesh, n_micro=args.pipeline_microbatches,
            use_flash=use_flash,
            remat=args.remat_policy if args.remat else False,
        )
    else:
        step_fn = make_mlm_train_step(
            cfg, tx, mesh=mesh, use_flash=use_flash,
            qat_config=qat_config, grad_scaling=not args.no_range_grad_scaling,
            remat=args.remat_policy if args.remat else False,
        )

    start_step = 0
    if args.resume_from_checkpoint:
        found = latest_checkpoint(args.resume_from_checkpoint)
        if found:
            path, _, idx = found
            state = restore_checkpoint(path, like=state)
            start_step = idx
            print(f"resumed from {path} at step {idx}")

    ckpt_every = None
    if args.checkpointing_steps and args.checkpointing_steps != "epoch":
        ckpt_every = int(args.checkpointing_steps)

    from outeffhop_tpu.utils.tracking import init_tracker

    tracker = init_tracker(args, config=vars(args))
    from outeffhop_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler(
        args.profile_dir, args.profile_start_step, args.profile_steps
    )
    try:
        rng = dropout_key(args.seed + 7, args.rng_impl, args.dropout_rng_bits)
        completed = start_step
        losses = []
        done = False
        for epoch in range(args.num_train_epochs):
            if done:
                break
            for b_idx, batch in enumerate(train_batches):
                global_micro = epoch * len(train_batches) + b_idx
                if global_micro < start_step * args.gradient_accumulation_steps:
                    continue  # resume skip (run_mlm.py:561-566)
                if pipeline:
                    jb = {k: jnp.asarray(v) for k, v in batch.items()}
                else:
                    jb = put_batch(mesh, dict(batch))
                state, loss = step_fn(state, jb, rng)
                profiler.tick(global_micro, fence_on=loss)
                losses.append(float(loss))
                if (global_micro + 1) % args.gradient_accumulation_steps == 0:
                    completed += 1
                    if (
                        args.tb_scalar_log_interval
                        and completed % args.tb_scalar_log_interval == 0
                    ):
                        tracker.log({"train/loss": losses[-1]}, completed)
                    if (
                        args.tb_hist_log_interval
                        and completed % args.tb_hist_log_interval == 0
                    ):
                        # weight histograms + inf-norms (run_mlm_ddp.py:617-641)
                        model_params = (
                            state.params["model"] if qat_config is not None else state.params
                        )
                        flat = jax.tree_util.tree_flatten_with_path(
                            model_params, is_leaf=lambda x: x is None
                        )[0]
                        for path, leaf in flat:
                            if leaf is None or leaf.ndim < 2:
                                continue
                            name = "/".join(
                                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
                            )
                            tracker.log_histogram(
                                f"weights/{name}", jax.device_get(leaf), completed
                            )
                    if ckpt_every and args.output_dir and completed % ckpt_every == 0:
                        save_checkpoint(args.output_dir, f"step_{completed}", state)
                        if args.max_checkpointing_number:
                            prune_checkpoints(args.output_dir, args.max_checkpointing_number)
                    if completed >= total_steps:
                        done = True
                        break
            if args.checkpointing_steps == "epoch" and args.output_dir:
                save_checkpoint(args.output_dir, f"epoch_{epoch}", state)

    finally:
        profiler.close()
    # QAT: split the trained bundle back into model params + a frozen
    # run-mode ctx over the LEARNED ranges (learn→fix transition)
    final_params = state.params
    if pipeline:
        # unstack back to the sequential layout so eval / save_pretrained /
        # the serving stack see the standard param tree
        from outeffhop_tpu.parallel import from_bert_pipeline_params

        final_params = from_bert_pipeline_params(
            state.params, cfg.num_hidden_layers
        )
    eval_qctx = None
    if qat_config is not None:
        from outeffhop_tpu.quant.calibrate import QuantCtx, ScopedQuantCtx
        from outeffhop_tpu.quant.learn_ranges import freeze_learned_ranges

        final_params = state.params["model"]
        learned = jax.tree.map(
            lambda x: jnp.asarray(jax.device_get(x)) if x is not None else None,
            state.params["ranges"],
            is_leaf=lambda x: x is None,
        )
        wq_l, aq_l = freeze_learned_ranges(learned)
        eval_qctx = ScopedQuantCtx(QuantCtx.run(qat_config, wq_l, aq_l), "")

    # eval with telemetry (run_mlm.py:676-729). Params are gathered off the
    # mesh first: the probe-taped eval path runs eagerly, and eager per-op
    # collectives over TP-sharded params deadlock on the CPU backend.
    eval_params = jax.tree.map(
        lambda x: jnp.asarray(jax.device_get(x)) if x is not None else None,
        final_params,
        is_leaf=lambda x: x is None,
    )

    def loss_and_count(batch, qctx, tape):
        logits = bert_mlm_forward(
            eval_params, cfg,
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            q=qctx, tape=tape, deterministic=True,
        )
        labels = jnp.asarray(batch["labels"])
        return token_nll(logits, labels)

    if eval_qctx is not None:
        eval_loss, telem = eval_loop(loss_and_count, eval_batches, qctx=eval_qctx)
    else:
        eval_loss, telem = eval_loop(loss_and_count, eval_batches)
    results = {
        "train_loss": float(np.mean(losses[-50:])) if losses else None,
        "perplexity": math.exp(eval_loss),
        "completed_steps": completed,
        "learned_ranges": qat_config is not None,
        **telem,
    }
    if args.output_dir:
        save_checkpoint(args.output_dir, f"step_{completed}", state)
        with open(os.path.join(args.output_dir, "config.json"), "w") as f:
            json.dump({k: v for k, v in vars(args).items()}, f, indent=2, default=str)
    tracker.log({"eval/perplexity": results["perplexity"]}, completed)
    tracker.finish()
    write_results(args.output_dir, results)
    return results


if __name__ == "__main__":
    main()
