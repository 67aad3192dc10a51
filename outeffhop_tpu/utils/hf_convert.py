"""HF/torch checkpoint → param-pytree converters.

Replaces the reference's load path: HF `from_pretrained` + per-layer attention
surgery with `load_state_dict(strict=False)` (`run_mlm.py:201-220`) + the
second pass that recovers gate-α params straight from `pytorch_model.bin`
(`validate_mlm_config.py:194-200`). Here conversion is a single explicit name
mapping; gate parameters (unconditional α vector, per-head Linear/MLP stacks,
or the all-features Linear) are stacked into the einsum-ready layout of
`ops/attention.attention_extras_params`.

Input is a mapping name → numpy array (call `.numpy()` on a torch state_dict,
or use `load_torch_state_dict`); torch itself is only needed to read .bin files.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np


def _j(a) -> jnp.ndarray:
    return jnp.asarray(np.asarray(a), dtype=jnp.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _dense(sd: Mapping, prefix: str):
    return {"weight": _j(sd[f"{prefix}.weight"]), "bias": _j(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str):
    return {"weight": _j(sd[f"{prefix}.weight"]), "bias": _j(sd[f"{prefix}.bias"])}


def _gate_params(sd: Mapping, prefix: str, num_heads: int) -> Optional[dict]:
    """Recover gate parameters from surgery checkpoints
    (bert_attention.py:119-162 layouts)."""
    if f"{prefix}.alpha" in sd:  # unconditional per-head vector
        return {"alpha": _j(sd[f"{prefix}.alpha"])}
    if f"{prefix}.alpha.weight" in sd:  # single Linear(d_model, H)
        return _dense(sd, f"{prefix}.alpha")
    if f"{prefix}.alpha.0.weight" in sd:  # ModuleList of per-head predictors
        first = np.asarray(sd[f"{prefix}.alpha.0.weight"])
        if first.shape[0] == 1:  # plain Linear(d_head, 1) per head
            w = np.stack(
                [np.asarray(sd[f"{prefix}.alpha.{h}.weight"]).T for h in range(num_heads)]
            )  # (H, d_head, 1)
            b = np.stack(
                [np.asarray(sd[f"{prefix}.alpha.{h}.bias"]) for h in range(num_heads)]
            )  # (H, 1)
            return {"w": _j(w), "b": _j(b)}
        # MLP per head: Sequential(Linear, ReLU, Linear) → keys .0 and .2
        w1 = np.stack(
            [np.asarray(sd[f"{prefix}.alpha.{h}.0.weight"]).T for h in range(num_heads)]
        )
        b1 = np.stack([np.asarray(sd[f"{prefix}.alpha.{h}.0.bias"]) for h in range(num_heads)])
        w2 = np.stack(
            [np.asarray(sd[f"{prefix}.alpha.{h}.2.weight"]).T for h in range(num_heads)]
        )
        b2 = np.stack([np.asarray(sd[f"{prefix}.alpha.{h}.2.bias"]) for h in range(num_heads)])
        return {"w1": _j(w1), "b1": _j(b1), "w2": _j(w2), "b2": _j(b2)}
    return None


def bert_params_from_state_dict(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """HF BertForMaskedLM (optionally surgery-modified) state_dict → pytree."""
    sd = dict(sd)
    # tolerate both "bert.encoder..." (ForMaskedLM) and bare "encoder..." keys
    if not any(k.startswith("bert.") for k in sd) and any(
        k.startswith("encoder.") for k in sd
    ):
        sd = {("bert." + k if not k.startswith("cls.") else k): v for k, v in sd.items()}

    e = "bert.embeddings"
    params = {
        "embeddings": {
            "word": {"weight": _j(sd[f"{e}.word_embeddings.weight"])},
            "position": {"weight": _j(sd[f"{e}.position_embeddings.weight"])},
            "token_type": {"weight": _j(sd[f"{e}.token_type_embeddings.weight"])},
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"bert.encoder.layer.{i}"
        attn = {
            "query": _dense(sd, f"{p}.attention.self.query"),
            "key": _dense(sd, f"{p}.attention.self.key"),
            "value": _dense(sd, f"{p}.attention.self.value"),
        }
        if f"{p}.attention.self.distance_embedding.weight" in sd:
            attn["distance_embedding"] = {
                "weight": _j(sd[f"{p}.attention.self.distance_embedding.weight"])
            }
        gate = _gate_params(sd, f"{p}.attention.self", cfg.num_attention_heads)
        if gate is not None:
            attn["gate"] = gate
        params["layers"].append(
            {
                "attention": attn,
                "attention_output": {
                    "dense": _dense(sd, f"{p}.attention.output.dense"),
                    "ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
                },
                "intermediate": _dense(sd, f"{p}.intermediate.dense"),
                "output": {
                    "dense": _dense(sd, f"{p}.output.dense"),
                    "ln": _ln(sd, f"{p}.output.LayerNorm"),
                },
            }
        )
    if "bert.pooler.dense.weight" in sd:
        params["pooler"] = _dense(sd, "bert.pooler.dense")
    # MLM head; decoder weight tied to word embeddings when absent
    dec_w = sd.get("cls.predictions.decoder.weight", sd[f"{e}.word_embeddings.weight"])
    dec_b = sd.get("cls.predictions.decoder.bias", sd.get("cls.predictions.bias"))
    params["head"] = {
        "transform": _dense(sd, "cls.predictions.transform.dense"),
        "transform_ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
        "decoder": {"weight": _j(dec_w), "bias": _j(dec_b)},
    }
    return params


def opt_params_from_state_dict(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """HF OPTForCausalLM (optionally surgery-modified) state_dict → pytree.

    Handles project_in/out (350m), tied/untied lm_head, and surgery gate
    params under `model.decoder.layers.{i}.self_attn.alpha*`."""
    sd = dict(sd)
    d = "model.decoder"
    if f"{d}.embed_tokens.weight" not in sd and "decoder.embed_tokens.weight" in sd:
        sd = {f"model.{k}" if k.startswith("decoder.") else k: v for k, v in sd.items()}
    params = {
        "embed_tokens": {"weight": _j(sd[f"{d}.embed_tokens.weight"])},
        "embed_positions": {"weight": _j(sd[f"{d}.embed_positions.weight"])},
        "final_ln": _ln(sd, f"{d}.final_layer_norm"),
        "layers": [],
    }
    if f"{d}.project_in.weight" in sd:
        params["project_in"] = {"weight": _j(sd[f"{d}.project_in.weight"]), "bias": None}
        params["project_out"] = {"weight": _j(sd[f"{d}.project_out.weight"]), "bias": None}
    for i in range(cfg.num_hidden_layers):
        p = f"{d}.layers.{i}"
        attn = {
            "q_proj": _dense(sd, f"{p}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{p}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{p}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
        }
        gate = _gate_params(sd, f"{p}.self_attn", cfg.num_attention_heads)
        if gate is not None:
            attn["gate"] = gate
        params["layers"].append(
            {
                "self_attn": attn,
                "self_attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _dense(sd, f"{p}.fc1"),
                "fc2": _dense(sd, f"{p}.fc2"),
                "final_ln": _ln(sd, f"{p}.final_layer_norm"),
            }
        )
    lm_w = sd.get("lm_head.weight")
    tied = lm_w is None or np.array_equal(
        np.asarray(lm_w), np.asarray(sd[f"{d}.embed_tokens.weight"])
    )
    params["head"] = {"lm": {"weight": None if tied else _j(lm_w)}}
    return params


def vit_params_from_state_dict(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """timm VisionTransformer (optionally surgery-modified) state_dict → pytree.

    Handles: patch_embed conv kernel → matmul layout (O,C,P,P) → (P·P·C, O)
    matching `models/vit.patch_embed`'s space-to-depth order (p_h, p_w, c);
    fused qkv; LayerScale gamma; surgery gate params under `blocks.{i}.attn.*`
    (`run_vit.py:633-658` replaces blocks[i].attn)."""
    sd = dict(sd)
    conv_w = np.asarray(sd["patch_embed.proj.weight"])  # (D, C, P, P)
    d, c, p, _ = conv_w.shape
    params = {
        "patch_embed": {
            # (D,C,Ph,Pw) → (Ph,Pw,C,D) → (Ph·Pw·C, D): rows ordered like the
            # unfolded patches (p_h major, p_w, then channel)
            "weight": _j(conv_w.transpose(2, 3, 1, 0).reshape(p * p * c, d)),
            "bias": _j(sd["patch_embed.proj.bias"]),
        },
        "pos_embed": _j(sd["pos_embed"]),
        "blocks": [],
        "norm": _ln(sd, "norm"),
    }
    if "cls_token" in sd:
        params["cls_token"] = _j(sd["cls_token"])
    for i in range(cfg.depth):
        pfx = f"blocks.{i}"
        attn = {
            "qkv": {
                "weight": _j(sd[f"{pfx}.attn.qkv.weight"]),
                "bias": _j(sd[f"{pfx}.attn.qkv.bias"])
                if f"{pfx}.attn.qkv.bias" in sd
                else None,
            },
            "proj": _dense(sd, f"{pfx}.attn.proj"),
        }
        gate = _gate_params(sd, f"{pfx}.attn", cfg.num_heads)
        if gate is not None:
            attn["gate"] = gate
        block = {
            "ln1": _ln(sd, f"{pfx}.norm1"),
            "attn": attn,
            "ln2": _ln(sd, f"{pfx}.norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{pfx}.mlp.fc1"),
                "fc2": _dense(sd, f"{pfx}.mlp.fc2"),
            },
        }
        if f"{pfx}.ls1.gamma" in sd:
            block["ls1"] = {"gamma": _j(sd[f"{pfx}.ls1.gamma"])}
            block["ls2"] = {"gamma": _j(sd[f"{pfx}.ls2.gamma"])}
        params["blocks"].append(block)
    if "head.weight" in sd:
        params["head"] = _dense(sd, "head")
    return params
