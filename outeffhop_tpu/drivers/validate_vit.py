"""ViT classification FP / INT8 validation driver.

Reproduces `validate_vit1.py`: timm-style model (+ attention surgery) →
image eval set → optional INT8 PTQ (`QuantizedVisionTransformer` quantize
block :475-548) → top-1/top-5 accuracy loop (:560-640) + telemetry →
`all_results.json`. (`validate_vit.py`, the quanto-qfloat8 variant, ships
broken imports in the reference and is intentionally not reproduced.)

Hermetic by default: synthetic images + a random-init model produce a
deterministic accuracy figure; point `--model_name_or_path` at a timm
state_dict to evaluate a real checkpoint (ImageNet loading is the caller's
responsibility via `--image_dir` of .npy batches).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from outeffhop_tpu.drivers import args as A
from outeffhop_tpu.drivers.common import (
    build_quant_ctx,
    cast_params,
    write_results,
)
from outeffhop_tpu.models.vit import (
    ViTConfig,
    accuracy_topk,
    init_vit_params,
    vit_config,
    vit_forward,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for add in (A.add_model_args, A.add_softmax_args, A.add_quant_args,
                A.add_training_args, A.add_data_args, A.add_tpu_args):
        add(p)
    p.add_argument("--model", type=str, default=None,
                   help="timm preset name (vit_base_patch16_224 …)")
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--patch_size", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--image_dir", type=str, default=None,
                   help="dir of {images,labels}.npy; synthetic if absent")
    p.add_argument("--weights_fp8", action="store_true",
                   help="also evaluate with float8(e4m3) weights — the "
                        "capability of the reference's quanto-qfloat8 "
                        "validate_vit.py variant (quant/fp8.py)")
    return p


def vit_config_from_args(args) -> ViTConfig:
    extras = dict(
        attn_softmax=args.attn_softmax,
        attn_gate_type=args.attn_gate_type,
        attn_gate_init=args.attn_gate_init,
        attn_gate_mlp=args.attn_gate_mlp,
        attn_gate_mlp2=args.attn_gate_mlp2,
        attn_gate_linear_all_features=args.attn_gate_linear_all_features,
        fine_tuning=args.fine_tuning,
    )
    if args.model:
        return vit_config(args.model, num_classes=args.num_classes, **extras)
    return ViTConfig(
        img_size=args.img_size,
        patch_size=args.patch_size,
        num_classes=args.num_classes,
        embed_dim=args.hidden_size or 64,
        depth=args.num_hidden_layers or 4,
        num_heads=args.num_attention_heads or 4,
        **extras,
    )


def load_params(args, cfg: ViTConfig):
    if args.model_name_or_path:
        from outeffhop_tpu.utils.hf_convert import (
            load_torch_state_dict,
            vit_params_from_state_dict,
        )

        sd_path = args.model_name_or_path
        if os.path.isdir(sd_path):
            sd_path = os.path.join(sd_path, "pytorch_model.bin")
        return vit_params_from_state_dict(load_torch_state_dict(sd_path), cfg)
    return init_vit_params(jax.random.PRNGKey(args.seed), cfg)


def load_images(args, cfg: ViTConfig, n_batches: int, seed: int):
    bs = args.per_device_eval_batch_size
    if args.image_dir:
        images = np.load(os.path.join(args.image_dir, "images.npy"))
        labels = np.load(os.path.join(args.image_dir, "labels.npy"))
    else:
        rs = np.random.RandomState(seed)
        n = n_batches * bs
        images = rs.rand(n, cfg.img_size, cfg.img_size, cfg.in_chans).astype(np.float32)
        labels = rs.randint(0, cfg.num_classes, n)
    for s in range(0, min(len(images), n_batches * bs), bs):
        yield images[s : s + bs], labels[s : s + bs]


def main(argv=None):
    args = build_parser().parse_args(argv)
    A.setup_platform(args)

    cfg = vit_config_from_args(args)
    params = cast_params(load_params(args, cfg), args.dtype)
    use_flash = (
        args.use_flash if args.use_flash is not None else jax.default_backend() == "tpu"
    )

    def fwd(images, qctx, p=params):
        return vit_forward(
            p, cfg, jnp.asarray(images), q=qctx, deterministic=True,
            use_flash=use_flash and not qctx.enabled,
        )

    def evaluate(qctx, p=params):
        top1s, top5s = [], []
        for images, labels in load_images(args, cfg, n_batches=16, seed=1234):
            logits = fwd(images, qctx, p)
            lab = jnp.asarray(labels)
            top1s.append(float(accuracy_topk(logits, lab, k=1)))
            top5s.append(float(accuracy_topk(logits, lab, k=min(5, cfg.num_classes))))
        return float(np.mean(top1s)), float(np.mean(top5s))

    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    results = {}
    if args.profile_dir:
        from outeffhop_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            results["top1"], results["top5"] = evaluate(NULL_QCTX)
    else:
        results["top1"], results["top5"] = evaluate(NULL_QCTX)

    if args.quantize:
        config = A.quant_config_from_args(args)
        calib = [img for img, _ in load_images(args, cfg, args.est_num_batches, args.seed)]
        qctx = build_quant_ctx(lambda b, q: fwd(b, q), config, calib)
        results["int8_top1"], results["int8_top5"] = evaluate(qctx)
        results["delta_top1"] = results["int8_top1"] - results["top1"]

    if args.weights_fp8:
        from outeffhop_tpu.quant.fp8 import fp8_cast_params

        results["fp8_top1"], results["fp8_top5"] = evaluate(
            NULL_QCTX, fp8_cast_params(params)
        )
        results["fp8_delta_top1"] = results["fp8_top1"] - results["top1"]

    write_results(args.output_dir, results)
    return results


if __name__ == "__main__":
    main()
