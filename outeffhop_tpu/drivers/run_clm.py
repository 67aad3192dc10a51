"""OPT CLM pretraining driver.

Reproduces `run_clm.py` / `run_clm_ddp.py`: OPT config + surgery → block-
packed corpus with labels = input_ids → AdamW betas (0.9, 0.95) per the OPT
paper (`run_clm.py:460-462`) → linear schedule with the warmup/total-step
stretch for `--final_lr_fraction` (`a = 1/(1-(1-w)·eps)`, :470-480) → sharded
train step → checkpoints → eval perplexity + telemetry.
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
from outeffhop_tpu.drivers.validate_clm import make_batches, opt_config_from_args
from outeffhop_tpu.models.opt import init_opt_params, opt_forward
from outeffhop_tpu.parallel import make_adamw, make_clm_train_step, make_mesh, shard_params
from outeffhop_tpu.parallel.mesh import batch_pspec
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
    p.add_argument("--ffn_dim", type=int, default=None)
    p.add_argument("--word_embed_proj_dim", type=int, default=None)
    p.add_argument("--no_layer_norm_before", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # OPT paper defaults (run_clm.py:460-462, submit_outlier_opt.sh)
    if args.adam_beta2 == 0.999:
        args.adam_beta2 = 0.95
    A.setup_platform(args)
    from jax.sharding import NamedSharding

    cfg = opt_config_from_args(args)
    # opt_config_from_args zeroes dropout for the *eval* driver; training uses
    # the HF opt-125m default (dropout 0.1; attention_dropout stays 0.0)
    # unless --hidden_dropout is given.
    if args.hidden_dropout is None:
        cfg = dataclasses.replace(cfg, dropout=0.1)
    params = cast_params(init_opt_params(jax.random.PRNGKey(args.seed), cfg), args.dtype)
    pipeline = args.pipeline_stages and args.pipeline_stages > 1
    if pipeline:
        if args.mesh_model > 1:
            raise ValueError("--pipeline_stages is incompatible with --mesh_model")
        from outeffhop_tpu.drivers.common import build_pipeline_mesh
        from outeffhop_tpu.parallel import to_opt_pipeline_params

        pmesh = build_pipeline_mesh(args)
        mesh = None
        params = to_opt_pipeline_params(params, pmesh)
    else:
        mesh = make_mesh(n_model=max(args.mesh_model, 1))
        params = shard_params(params, mesh)

    block = min(args.block_size, cfg.max_position_embeddings)
    train_batches = make_batches(args, cfg, args.seed, block)
    eval_batches = make_batches(args, cfg, 1234, block)[:8]
    steps_per_epoch = max(len(train_batches) // args.gradient_accumulation_steps, 1)
    total_steps = args.max_train_steps or steps_per_epoch * args.num_train_epochs

    tx = make_adamw(
        params,
        lr=args.learning_rate,
        betas=(args.adam_beta1, args.adam_beta2),
        weight_decay=args.weight_decay,
        warmup_steps=args.num_warmup_steps,
        total_steps=total_steps,
        final_lr_fraction=args.final_lr_fraction,
        clip_norm=args.max_grad_norm,
        accum_steps=args.gradient_accumulation_steps,
        scheduler=args.lr_scheduler_type,
        grad_norm_type=args.grad_norm_type,
        fused=args.optimizer_impl == "fused",
        flat=args.optimizer_impl == "flat",
    )
    state = init_train_state(params, tx)
    from outeffhop_tpu.drivers.common import resolve_train_use_flash

    use_flash = resolve_train_use_flash(
        args.use_flash, causal=True, n_layers=cfg.num_hidden_layers,
        batch=args.per_device_train_batch_size,
        seq=block,  # the ACTUAL training block (clamped to max_position_embeddings)
        n_heads=cfg.num_attention_heads,
    )
    if pipeline:
        from outeffhop_tpu.parallel import make_pipeline_clm_train_step

        step_fn = make_pipeline_clm_train_step(
            cfg, tx, pmesh, n_micro=args.pipeline_microbatches,
            use_flash=use_flash,
            remat=args.remat_policy if args.remat else False,
        )
    else:
        step_fn = make_clm_train_step(cfg, tx, mesh=mesh, use_flash=use_flash,
                                      remat=args.remat_policy if args.remat else False)

    start_step = 0
    if args.resume_from_checkpoint:
        found = latest_checkpoint(args.resume_from_checkpoint)
        if found:
            path, _, idx = found
            state = restore_checkpoint(path, like=state)
            start_step = idx

    ckpt_every = None
    if args.checkpointing_steps and args.checkpointing_steps != "epoch":
        ckpt_every = int(args.checkpointing_steps)

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
                    continue
                if pipeline:
                    jb = {k: jnp.asarray(v) for k, v in batch.items()}
                else:
                    jb = jax.tree.map(
                        lambda x: jax.device_put(
                            jnp.asarray(x), NamedSharding(mesh, batch_pspec())
                        ),
                        dict(batch),
                    )
                state, loss = step_fn(state, jb, rng)
                profiler.tick(global_micro, fence_on=loss)
                losses.append(float(loss))
                if (global_micro + 1) % args.gradient_accumulation_steps == 0:
                    completed += 1
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
    # gather params off the mesh for the eager telemetry eval (see run_mlm)
    final_params = state.params
    if pipeline:
        from outeffhop_tpu.parallel import from_opt_pipeline_params

        final_params = from_opt_pipeline_params(state.params, cfg.num_hidden_layers)
    eval_params = jax.tree.map(
        lambda x: jnp.asarray(jax.device_get(x)) if x is not None else None,
        final_params,
        is_leaf=lambda x: x is None,
    )

    def loss_and_count(batch, qctx, tape):
        logits, _ = opt_forward(
            eval_params, cfg,
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            q=qctx, tape=tape, deterministic=True,
        )
        labels = jnp.asarray(batch["labels"])
        return token_nll(logits, labels, shift=True)

    eval_loss, telem = eval_loop(loss_and_count, eval_batches)
    results = {
        "train_loss": float(np.mean(losses[-50:])) if losses else None,
        "perplexity": math.exp(eval_loss),
        "completed_steps": completed,
        **telem,
    }
    if args.output_dir:
        save_checkpoint(args.output_dir, f"step_{completed}", state)
        with open(os.path.join(args.output_dir, "config.json"), "w") as f:
            json.dump(vars(args), f, indent=2, default=str)
    write_results(args.output_dir, results)
    return results


if __name__ == "__main__":
    main()
