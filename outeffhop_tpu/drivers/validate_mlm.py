"""BERT MLM FP / INT8 validation driver.

Reproduces `validate_mlm_config.py` (and its near-twin `validate_mlm.py`):
build model with attention surgery knobs → eval dataset → optional W8A8 PTQ
(quantize block :408-478: config overrides, calibration passes,
`fix_ranges`) → eval loop with activation hooks → perplexity +
∞-norm/kurtosis telemetry → `all_results.json` (:577-580).

Hermetic by default (`--dataset_setup synthetic`); pass `--model_name_or_path`
at a directory containing `pytorch_model.bin` to evaluate a converted HF/
surgery checkpoint.

Example (reference command shape, README.md:66-103):
    python -m outeffhop_tpu.drivers.validate_mlm \
        --attn_softmax softmax1 --quantize --est_num_batches 16 \
        --ranges_acts running_minmax --qmethod_acts asymmetric_uniform
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.drivers import args as A
from outeffhop_tpu.drivers.common import (
    build_quant_ctx,
    cast_params,
    eval_loop,
    token_nll,
    write_results,
)
from outeffhop_tpu.models.bert import BertConfig, bert_mlm_forward, init_bert_params
from outeffhop_tpu.quant.calibrate import NULL_QCTX


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for add in (A.add_model_args, A.add_softmax_args, A.add_quant_args,
                A.add_training_args, A.add_data_args, A.add_tpu_args):
        add(p)
    return p


def bert_config_from_args(args) -> BertConfig:
    kw = dict(
        attn_softmax=args.attn_softmax,
        alpha=args.alpha,
        max_seq_length=args.max_seq_length,
        skip_attn=args.skip_attn,
        attn_gate_type=args.attn_gate_type,
        attn_gate_init=args.attn_gate_init,
        attn_gate_mlp=args.attn_gate_mlp,
        attn_gate_mlp2=args.attn_gate_mlp2,
        attn_gate_linear_all_features=args.attn_gate_linear_all_features,
        fine_tuning=args.fine_tuning,
        hidden_dropout_prob=(
            args.hidden_dropout if args.hidden_dropout is not None else 0.0
        ),
        attention_probs_dropout_prob=(
            args.attn_dropout if args.attn_dropout is not None else 0.0
        ),
    )
    if args.config_yaml:
        import yaml

        with open(args.config_yaml) as f:
            kw.update(yaml.safe_load(f))
    for name in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                 "intermediate_size", "vocab_size"):
        v = getattr(args, name)
        if v is not None:
            kw[name] = v
    if args.dataset_setup == "synthetic":
        kw.setdefault("vocab_size", 1000)
        kw.setdefault("hidden_size", 64)
        kw.setdefault("num_hidden_layers", 4)
        kw.setdefault("num_attention_heads", 4)
        kw.setdefault("intermediate_size", 128)
        kw.setdefault("max_position_embeddings", 128)
    return BertConfig(**kw)


def load_params(args, cfg: BertConfig):
    if args.model_name_or_path:
        from outeffhop_tpu.utils.hf_convert import (
            bert_params_from_state_dict,
            load_torch_state_dict,
        )

        sd_path = args.model_name_or_path
        if os.path.isdir(sd_path):
            sd_path = os.path.join(sd_path, "pytorch_model.bin")
        return bert_params_from_state_dict(load_torch_state_dict(sd_path), cfg)
    return init_bert_params(jax.random.PRNGKey(args.seed), cfg)


def make_batches(args, cfg: BertConfig, split_seed: int):
    """split_seed == args.seed selects the train stream (calibration runs on
    train data, validate_clm.py:489-494); any other seed → validation."""
    from outeffhop_tpu.data.text import group_texts, mlm_batches, synthetic_token_stream

    mask_token_id = cfg.vocab_size - 1
    if args.dataset_setup != "synthetic":
        # real corpus: HF datasets → tokenize → group_texts cache
        # (data/corpus.py; reference run_mlm.py:253-395). Needs network or a
        # pre-built tokenized_*_{seqlen} cache under --data_cache_dir.
        from outeffhop_tpu.data.corpus import load_corpus

        corpora = load_corpus(
            args.dataset_setup,
            args.tokenizer_name or args.model_name_or_path or "bert-base-uncased",
            args.block_size_mlm,
            data_cache_dir=args.data_cache_dir or "~/.hf_data",
            train_percentage=args.train_percentage,
            validation_percentage=args.validation_percentage,
            overwrite_cache=args.overwrite_cache,
        )
        blocks = corpora["train" if split_seed == args.seed else "validation"]
        mask_token_id = args.mask_token_id if args.mask_token_id is not None else 103
    else:
        stream = synthetic_token_stream(
            args.synthetic_tokens, cfg.vocab_size, seed=split_seed
        )
        blocks = group_texts(stream, args.block_size_mlm)
    return list(
        mlm_batches(
            blocks,
            args.per_device_eval_batch_size,
            cfg.vocab_size,
            mask_token_id=mask_token_id,
            mlm_probability=args.mlm_probability,
            seed=split_seed,
            shuffle=False,
        )
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    A.setup_platform(args)

    cfg = bert_config_from_args(args)
    params = cast_params(load_params(args, cfg), args.dtype)
    use_flash = (
        args.use_flash
        if args.use_flash is not None
        else jax.default_backend() == "tpu"
    )

    eval_batches = make_batches(args, cfg, split_seed=1234)[:64]
    calib_batches = make_batches(args, cfg, split_seed=args.seed)[: args.est_num_batches]

    def fwd(batch, qctx, tape=None):
        from outeffhop_tpu.ops.telemetry import NULL_TAPE

        return bert_mlm_forward(
            params,
            cfg,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            q=qctx,
            tape=tape if tape is not None else NULL_TAPE,
            deterministic=True,
            use_flash=use_flash and (tape is None or not tape.enabled),
        )

    def loss_and_count(batch, qctx, tape):
        logits = fwd(batch, qctx, tape)
        labels = jnp.asarray(batch["labels"])
        return token_nll(logits, labels)

    results = {}
    if args.profile_dir:
        # trace the FP eval loop (jitted per-batch programs incl. telemetry)
        from outeffhop_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            fp_loss, fp_telem = eval_loop(loss_and_count, eval_batches)
    else:
        fp_loss, fp_telem = eval_loop(loss_and_count, eval_batches)
    results["perplexity"] = math.exp(fp_loss)
    results.update({f"fp_{k}": v for k, v in fp_telem.items()})

    if args.quantize:
        if args.load_quantized_dir:
            # recalibration-free reload of a saved quantized state
            from outeffhop_tpu.quant.checkpoint import quant_ctx_from_ckpt

            qctx = quant_ctx_from_ckpt(args.load_quantized_dir)
        else:
            config = A.quant_config_from_args(args)
            qctx = build_quant_ctx(lambda b, q: fwd(b, q), config, calib_batches)
        q_loss, q_telem = eval_loop(loss_and_count, eval_batches, qctx=qctx)
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
            from outeffhop_tpu.quant.checkpoint import save_quantized_ckpt

            save_quantized_ckpt(args.save_quantized_dir, xctx or qctx)

    write_results(args.output_dir, results)
    return results


if __name__ == "__main__":
    main()
