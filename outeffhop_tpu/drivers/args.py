"""Shared CLI surface for the train/validate drivers.

Mirrors the reference's one giant parser (`transformers_language/args.py:14-409`)
— same flag names for data/model/training/quantization/softmax/gating so
reference run commands translate 1:1 — plus TPU-native additions
(`--mesh_model`, `--use_flash`, `--dtype`).
"""

from __future__ import annotations

import argparse

from outeffhop_tpu.quant.config import QUANT_SETUPS, QuantizedModelConfig


def add_model_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("model")
    g.add_argument("--model_name_or_path", type=str, default=None,
                   help="HF checkpoint dir (pytorch_model.bin) to convert, or None for random init")
    g.add_argument("--config_yaml", type=str, default=None,
                   help="model-shape YAML overlay (model_configs/*.yaml equivalent)")
    g.add_argument("--hidden_size", type=int, default=None)
    g.add_argument("--num_hidden_layers", type=int, default=None)
    g.add_argument("--num_attention_heads", type=int, default=None)
    g.add_argument("--intermediate_size", type=int, default=None)
    g.add_argument("--vocab_size", type=int, default=None)
    g.add_argument("--attn_dropout", type=float, default=None,
                   help="override attention-probs dropout (reference args.py "
                        "surgery knob)")
    g.add_argument("--hidden_dropout", type=float, default=None,
                   help="override hidden dropout")


def add_softmax_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("attention extras (args.py:337-385)")
    g.add_argument("--attn_softmax", type=str, default="vanilla")
    g.add_argument("--alpha", type=float, default=None)
    g.add_argument("--max_seq_length", type=int, default=128)
    g.add_argument("--skip_attn", action="store_true")
    g.add_argument("--attn_gate_type", type=str, default="none",
                   choices=["none", "unconditional_per_head", "conditional_per_head",
                            "conditional_per_token"])
    g.add_argument("--attn_gate_init", type=float, default=None)
    g.add_argument("--attn_gate_mlp", action="store_true")
    g.add_argument("--attn_gate_mlp2", action="store_true")
    g.add_argument("--attn_gate_linear_all_features", action="store_true")
    g.add_argument("--fine_tuning", action="store_true")


def add_quant_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("quantization (args.py:389-401)")
    g.add_argument("--quantize", action="store_true")
    g.add_argument("--n_bits", type=int, default=8)
    g.add_argument("--n_bits_act", type=int, default=8)
    g.add_argument("--qmethod", type=str, default="symmetric_uniform",
                   choices=["symmetric_uniform", "asymmetric_uniform"])
    g.add_argument("--qmethod_acts", type=str, default="asymmetric_uniform",
                   choices=["symmetric_uniform", "asymmetric_uniform"])
    g.add_argument("--ranges_weights", type=str, default="current_minmax",
                   choices=["current_minmax", "running_minmax", "MSE"])
    g.add_argument("--ranges_acts", type=str, default="running_minmax",
                   choices=["current_minmax", "running_minmax", "MSE"])
    g.add_argument("--percentile", type=float, default=None)
    g.add_argument("--percentile_impl", type=str, default="exact",
                   choices=["exact", "histogram"],
                   help="exact = full-sort jnp.percentile (reference "
                        "np.percentile semantics); histogram = fixed-bin CDF "
                        "quantile, O(n) instead of a per-batch sort "
                        "(error <= range/8192)")
    g.add_argument("--est_num_batches", type=int, default=16)
    g.add_argument("--quant_setup", type=str, default="all", choices=list(QUANT_SETUPS))
    g.add_argument("--per_channel", action="store_true", help="per-channel weight scales")
    g.add_argument("--no_weight_quant", action="store_true")
    g.add_argument("--no_act_quant", action="store_true")
    g.add_argument("--execute_int8", action="store_true",
                   help="run dense matmuls as real int8 MXU ops (deployment "
                        "path) in addition to the fake-quant simulation")
    g.add_argument("--save_quantized_dir", type=str, default=None,
                   help="save the calibrated quantization state (weight/act "
                        "qparams + int8 weights if --execute_int8) for "
                        "recalibration-free reload (validate_clm.py:501-512)")
    g.add_argument("--load_quantized_dir", type=str, default=None,
                   help="load a saved quantized checkpoint and eval WITHOUT "
                        "recalibration (base_quantized_model.py:34-82 "
                        "load_state_dict equivalent)")
    g.add_argument("--learn_ranges", action="store_true",
                   help="learned-ranges QAT: after calibration, train with "
                        "quantizer scales/zero-points as parameters "
                        "(quantization_manager.py:80-87, qstates learn_ranges)")
    g.add_argument("--no_range_grad_scaling", action="store_true",
                   help="disable LSQ 1/sqrt(Qp*N) gradient scaling on learned "
                        "ranges (uniform_quantizers.py:150-157)")


def add_training_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("training")
    g.add_argument("--learning_rate", type=float, default=1e-4)
    g.add_argument("--weight_decay", type=float, default=0.01)
    g.add_argument("--adam_beta1", type=float, default=0.9)
    g.add_argument("--adam_beta2", type=float, default=0.999)
    g.add_argument("--max_train_steps", type=int, default=None)
    g.add_argument("--num_train_epochs", type=int, default=1)
    g.add_argument("--num_warmup_steps", type=int, default=0)
    g.add_argument("--final_lr_fraction", type=float, default=0.0)
    g.add_argument("--gradient_accumulation_steps", type=int, default=1)
    g.add_argument("--max_grad_norm", type=float, default=1.0)
    g.add_argument("--grad_norm_type", type=float, default=2.0,
                   help="2.0 (L2, default) or inf — torch clip_grad_norm_'s "
                        "norm_type")
    g.add_argument("--lr_scheduler_type", type=str, default="linear",
                   choices=["linear", "cosine", "constant"])
    g.add_argument("--per_device_train_batch_size", type=int, default=8)
    g.add_argument("--per_device_eval_batch_size", type=int, default=8)
    g.add_argument("--checkpointing_steps", type=str, default=None,
                   help='int steps or "epoch"')
    g.add_argument("--resume_from_checkpoint", type=str, default=None)
    g.add_argument("--output_dir", type=str, default=None)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--remat", action="store_true",
                   help="per-layer jax.checkpoint in the train forward: "
                        "recompute activations in the backward instead of "
                        "saving them (larger per-chip batches at ~1/3 extra "
                        "forward FLOPs)")
    g.add_argument("--remat_policy", choices=["full", "dots"], default="full",
                   help="remat recompute policy: full = save only layer "
                        "inputs; dots = XLA dots_with_no_batch_dims_saveable "
                        "(matmul outputs saved, only elementwise recomputes "
                        "- lower recompute tax, smaller memory saving)")
    g.add_argument("--rng_impl", type=str, default="auto",
                   choices=["auto", "threefry", "rbg"],
                   help="dropout PRNG. auto = rbg on TPU, threefry elsewhere. "
                        "threefry (counter-based) is reproducible across "
                        "backends but costs a long VPU instruction sequence "
                        "per random bit — probe25 measured it at 34%% of the "
                        "BERT train step; rbg (TPU hardware RNG via "
                        "lax.rng_bit_generator) recovers +46%% train "
                        "throughput (89.5k -> 130.6k tok/s)")
    g.add_argument("--optimizer_impl", type=str, default="chain",
                   choices=["chain", "fused", "flat"],
                   help="clip+adamw assembly: chain = optax.chain(clip, "
                        "adamw); fused = clip scale folded into the per-leaf "
                        "adam update (one elementwise pass per grad leaf); "
                        "flat = one flattened buffer (measured slower e2e, "
                        "kept for reproduction). All three are numerically "
                        "equivalent (tested); opt-state structures differ, "
                        "so checkpoints are per-impl")
    g.add_argument("--dropout_rng_bits", type=int, default=32, choices=[8, 32],
                   help="random-bit width per dropout element. 8 bitcasts "
                        "each generated 32-bit word into four uint8 "
                        "thresholds (4x less PRNG traffic; survivor rescale "
                        "stays exactly unbiased, keep prob rounds to "
                        "nearest 1/256)")
    g.add_argument("--with_tracking", action="store_true",
                   help="log scalars to JSONL/TB/wandb (args.py:201-220)")
    g.add_argument("--report_to", type=str, default="jsonl",
                   help="comma list: jsonl,tensorboard,wandb,all")
    g.add_argument("--run_name", type=str, default=None)
    g.add_argument("--tb_hist_log_interval", type=int, default=0,
                   help="log weight histograms + per-layer inf-norms every N "
                        "steps (0 = off; run_mlm_ddp.py:617-641)")
    g.add_argument("--tb_scalar_log_interval", type=int, default=10,
                   help="log train loss/lr scalars every N optimizer steps")
    g.add_argument("--max_checkpointing_number", type=int, default=None,
                   help="keep only the newest N checkpoints "
                        "(accelerate total_limit, run_mlm.py:108-109)")
    g.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a window of train "
                        "steps into this directory (tensorboard/xprof "
                        "viewable). The reference has no profiler subsystem "
                        "(SURVEY.md par.5); this is the TPU equivalent")
    g.add_argument("--profile_start_step", type=int, default=2,
                   help="trace window start: the capture is fenced after this "
                        "micro-step's dispatch, so it covers steps "
                        "start+1..start+steps (default 2 keeps compile + "
                        "first dispatches out of the capture)")
    g.add_argument("--profile_steps", type=int, default=3,
                   help="number of micro-steps to capture")


def add_data_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("data")
    g.add_argument("--dataset_setup", type=str, default="synthetic",
                   help="synthetic | bookcorpus_and_wiki | wikitext (HF cache required)")
    g.add_argument("--data_cache_dir", type=str, default=None)
    g.add_argument("--max_seq_len", type=int, default=128, dest="block_size_mlm")
    g.add_argument("--block_size", type=int, default=512)
    g.add_argument("--mlm_probability", type=float, default=0.15)
    g.add_argument("--train_percentage", type=int, default=None)
    g.add_argument("--validation_percentage", type=int, default=None)
    g.add_argument("--synthetic_tokens", type=int, default=200_000)
    g.add_argument("--tokenizer_name", type=str, default=None,
                   help="HF tokenizer for real-corpus ingestion "
                        "(data/corpus.py; run_mlm.py:345-351)")
    g.add_argument("--mask_token_id", type=int, default=None,
                   help="[MASK] id for real corpora (default: 103, BERT)")
    g.add_argument("--overwrite_cache", action="store_true")


def add_tpu_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("tpu")
    g.add_argument("--mesh_model", type=int, default=1, help="tensor-parallel axis size")
    g.add_argument("--pipeline_stages", type=int, default=0,
                   help="GPipe pipeline parallelism: number of stages (>1 "
                        "switches run_mlm/run_clm to the ('pipe','data') "
                        "mesh of parallel/pipeline.py; layers must divide "
                        "evenly; incompatible with --learn_ranges / "
                        "--mesh_model)")
    g.add_argument("--pipeline_microbatches", type=int, default=2,
                   help="GPipe microbatches per step (bubble fraction "
                        "(S-1)/(M+S-1))")
    g.add_argument("--pipeline_data", type=int, default=0,
                   help="data-parallel replicas inside the pipeline mesh "
                        "(0 = device_count // pipeline_stages)")
    g.add_argument("--use_flash", action="store_true", default=None,
                   help="fused Pallas attention in the TRAIN step. Default "
                        "(neither flag): AUTO — the measured-regime policy "
                        "(drivers/common.py:resolve_train_use_flash): on for "
                        "bidirectional models on TPU (packed backward won "
                        "+10% on ViT-base; per-shape dispatch still gates), "
                        "on for causal models only past the ~3.5 GB "
                        "attention-residual threshold where the streaming "
                        "backward wins (probe45b: 2.28x at T4096, only "
                        "trainable path at T8192); off below it (probe45: "
                        "XLA's saved-probs backward wins ~9% at T2048)")
    g.add_argument("--no_flash", dest="use_flash", action="store_false")
    g.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    g.add_argument("--platform", type=str, default=None,
                   help="force jax platform (cpu for local runs)")
    g.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() (pod slices / SLURM env)")


def quant_config_from_args(args) -> QuantizedModelConfig:
    """`get_quant_config()` + click-style CLI overrides + `val_qparams`
    (`quant_configs.py:7-33`, `transformers_language/utils.py:27-47`)."""
    return QuantizedModelConfig(
        n_bits=args.n_bits,
        n_bits_act=args.n_bits_act,
        weight_method=args.qmethod,
        weight_range_method=args.ranges_weights,
        per_channel_weights=args.per_channel,
        act_method=args.qmethod_acts,
        act_range_method=args.ranges_acts,
        act_range_options=(
            {"percentile_impl": "histogram"}
            if args.percentile_impl == "histogram"
            else {}
        ),
        percentile=args.percentile,
        quant_setup=args.quant_setup,
        est_num_batches=args.est_num_batches,
        quantize_weights=not args.no_weight_quant,
        quantize_acts=not args.no_act_quant,
    )


def setup_platform(args):
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "multihost", False):
        from outeffhop_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()
