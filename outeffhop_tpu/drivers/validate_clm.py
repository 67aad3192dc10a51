"""OPT CLM FP / INT8 validation driver.

Reproduces `validate_clm.py`: OPT model with attention surgery → block-packed
eval set → optional W8A8 PTQ with `--quant_setup` head policies (range
estimation on the TRAIN stream, `validate_clm.py:489-494`) → perplexity +
telemetry over the OPT ACT_KEYS probes (fc2, ffn_res, final_ln;
`validate_clm.py:540-547`) → `all_results.json`.

Reference INT8 config (README.md:131-160):
    --quant_setup fp32_head --ranges_acts running_minmax \
    --qmethod_acts asymmetric_uniform --percentile 99.999 --est_num_batches 4
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp

from outeffhop_tpu.drivers import args as A
from outeffhop_tpu.drivers.common import (
    build_quant_ctx,
    cast_params,
    eval_loop,
    token_nll,
    write_results,
)
from outeffhop_tpu.models.opt import OPTConfig, init_opt_params, opt_forward


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for add in (A.add_model_args, A.add_softmax_args, A.add_quant_args,
                A.add_training_args, A.add_data_args, A.add_tpu_args):
        add(p)
    p.add_argument("--ffn_dim", type=int, default=None)
    p.add_argument("--word_embed_proj_dim", type=int, default=None)
    p.add_argument("--no_layer_norm_before", action="store_true")
    return p


def opt_config_from_args(args) -> OPTConfig:
    kw = dict(
        attn_softmax=args.attn_softmax,
        alpha=args.alpha,
        max_seq_length=args.block_size,
        skip_attn=args.skip_attn,
        attn_gate_type=args.attn_gate_type,
        attn_gate_init=args.attn_gate_init,
        attn_gate_mlp=args.attn_gate_mlp,
        attn_gate_mlp2=args.attn_gate_mlp2,
        attn_gate_linear_all_features=args.attn_gate_linear_all_features,
        fine_tuning=args.fine_tuning,
        dropout=args.hidden_dropout if args.hidden_dropout is not None else 0.0,
        attention_dropout=args.attn_dropout if args.attn_dropout is not None else 0.0,
        do_layer_norm_before=not args.no_layer_norm_before,
    )
    if args.config_yaml:
        import yaml

        with open(args.config_yaml) as f:
            kw.update(yaml.safe_load(f))
    for src, dst in [("hidden_size", "hidden_size"), ("num_hidden_layers", "num_hidden_layers"),
                     ("num_attention_heads", "num_attention_heads"), ("vocab_size", "vocab_size"),
                     ("ffn_dim", "ffn_dim"), ("word_embed_proj_dim", "word_embed_proj_dim")]:
        v = getattr(args, src)
        if v is not None:
            kw[dst] = v
    if args.dataset_setup == "synthetic":
        kw.setdefault("vocab_size", 1000)
        kw.setdefault("hidden_size", 64)
        kw.setdefault("num_hidden_layers", 4)
        kw.setdefault("num_attention_heads", 4)
        kw.setdefault("ffn_dim", 128)
        kw.setdefault("max_position_embeddings", 512)
    return OPTConfig(**kw)


def load_params(args, cfg: OPTConfig):
    if args.model_name_or_path:
        from outeffhop_tpu.utils.hf_convert import (
            load_torch_state_dict,
            opt_params_from_state_dict,
        )

        sd_path = args.model_name_or_path
        if os.path.isdir(sd_path):
            sd_path = os.path.join(sd_path, "pytorch_model.bin")
        return opt_params_from_state_dict(load_torch_state_dict(sd_path), cfg)
    return init_opt_params(jax.random.PRNGKey(args.seed), cfg)


def make_batches(args, cfg: OPTConfig, split_seed: int, block_size: int):
    from outeffhop_tpu.data.text import clm_batches, group_texts, synthetic_token_stream

    if args.dataset_setup != "synthetic":
        from outeffhop_tpu.data.corpus import load_corpus

        corpora = load_corpus(
            args.dataset_setup,
            args.tokenizer_name or args.model_name_or_path or "facebook/opt-125m",
            block_size,
            data_cache_dir=args.data_cache_dir or "~/.hf_data",
            train_percentage=args.train_percentage,
            validation_percentage=args.validation_percentage,
            overwrite_cache=args.overwrite_cache,
        )
        blocks = corpora["train" if split_seed == args.seed else "validation"]
    else:
        stream = synthetic_token_stream(
            args.synthetic_tokens, cfg.vocab_size, seed=split_seed
        )
        blocks = group_texts(stream, block_size)
    return list(clm_batches(blocks, args.per_device_eval_batch_size))


def main(argv=None):
    args = build_parser().parse_args(argv)
    A.setup_platform(args)

    cfg = opt_config_from_args(args)
    params = cast_params(load_params(args, cfg), args.dtype)
    use_flash = (
        args.use_flash if args.use_flash is not None else jax.default_backend() == "tpu"
    )
    block = min(args.block_size, cfg.max_position_embeddings)

    eval_batches = make_batches(args, cfg, 1234, block)[:32]
    # range estimation runs on the TRAIN stream (validate_clm.py:489-494)
    calib_batches = make_batches(args, cfg, args.seed, block)[: args.est_num_batches]

    def fwd(batch, qctx, tape=None):
        from outeffhop_tpu.ops.telemetry import NULL_TAPE

        logits, _ = opt_forward(
            params,
            cfg,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            q=qctx,
            tape=tape if tape is not None else NULL_TAPE,
            deterministic=True,
            use_flash=use_flash and (tape is None or not tape.enabled),
        )
        return logits

    def loss_and_count(batch, qctx, tape):
        logits = fwd(batch, qctx, tape)
        labels = jnp.asarray(batch["labels"])
        return token_nll(logits, labels, shift=True)

    results = {}
    if args.profile_dir:
        from outeffhop_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            fp_loss, fp_telem = eval_loop(
                loss_and_count, eval_batches, max_telemetry_batches=100
            )
    else:
        fp_loss, fp_telem = eval_loop(
            loss_and_count, eval_batches, max_telemetry_batches=100
        )
    results["perplexity"] = math.exp(fp_loss)
    results.update({f"fp_{k}": v for k, v in fp_telem.items()})

    if args.quantize:
        if args.load_quantized_dir:
            # recalibration-free reload (base_quantized_model.py:34-82 parity)
            from outeffhop_tpu.quant.checkpoint import quant_ctx_from_ckpt

            qctx = quant_ctx_from_ckpt(args.load_quantized_dir)
        else:
            config = A.quant_config_from_args(args)
            qctx = build_quant_ctx(lambda b, q: fwd(b, q), config, calib_batches)
        q_loss, q_telem = eval_loop(
            loss_and_count, eval_batches, qctx=qctx, max_telemetry_batches=100
        )
        results["int8_perplexity"] = math.exp(q_loss)
        results["delta_perplexity"] = results["int8_perplexity"] - results["perplexity"]
        results.update({f"int8_{k}": v for k, v in q_telem.items()})
        xctx = None
        if args.execute_int8:
            if args.load_quantized_dir and qctx._ctx.int8_dense:
                xctx = qctx  # checkpoint already carries the int8 weights
            else:
                xctx = build_quant_ctx(
                    lambda b, q: fwd(b, q), config, calib_batches, execute_int8=True
                )
            x_loss, _ = eval_loop(
                loss_and_count, eval_batches, qctx=xctx, collect_telemetry=False
            )
            results["int8exec_perplexity"] = math.exp(x_loss)
        if args.save_quantized_dir:
            # full quantized-state save: qparams (+ int8 weights when the
            # integer-execution ctx exists) — validate_clm.py:501-512
            from outeffhop_tpu.quant.checkpoint import save_quantized_ckpt

            save_quantized_ckpt(args.save_quantized_dir, xctx or qctx)

    write_results(args.output_dir, results)
    return results


if __name__ == "__main__":
    main()
