"""BERT-base-scale `pytorch_model.bin` round trip (VERDICT r4 missing #1 /
next-step 7): construct a real-shape HF surgery checkpoint with torch
(110M params, incl. per-head gate alphas), convert via utils/hf_convert, and
drive it through the validate_mlm CLI — verifying the converter at the exact
tensor shapes a user's checkpoint has, not just the tiny synthetic configs.

Reference parity points: gate-alpha reload (`validate_mlm_config.py:194-200`),
tied MLM decoder weights, HF naming (`bert.encoder.layer.{i}...`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch


BASE = dict(vocab_size=30522, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=512)


def _build_base_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    H, L, V, I, P = (BASE["hidden_size"], BASE["num_hidden_layers"],
                     BASE["vocab_size"], BASE["intermediate_size"],
                     BASE["max_position_embeddings"])
    sd = {
        "bert.embeddings.word_embeddings.weight": t(V, H),
        "bert.embeddings.position_embeddings.weight": t(P, H),
        "bert.embeddings.token_type_embeddings.weight": t(2, H),
        "bert.embeddings.LayerNorm.weight": torch.ones(H),
        "bert.embeddings.LayerNorm.bias": torch.zeros(H),
        "cls.predictions.transform.dense.weight": t(H, H),
        "cls.predictions.transform.dense.bias": torch.zeros(H),
        "cls.predictions.transform.LayerNorm.weight": torch.ones(H),
        "cls.predictions.transform.LayerNorm.bias": torch.zeros(H),
        # decoder tied to word embeddings (weight key absent), bias present
        "cls.predictions.bias": torch.zeros(V),
    }
    for i in range(L):
        p = f"bert.encoder.layer.{i}"
        for name, shp in [
            ("attention.self.query", (H, H)), ("attention.self.key", (H, H)),
            ("attention.self.value", (H, H)),
            ("attention.output.dense", (H, H)),
            ("intermediate.dense", (I, H)), ("output.dense", (H, I)),
        ]:
            sd[f"{p}.{name}.weight"] = t(*shp)
            sd[f"{p}.{name}.bias"] = torch.zeros(shp[0])
        for ln in ["attention.output.LayerNorm", "output.LayerNorm"]:
            sd[f"{p}.{ln}.weight"] = torch.ones(H)
            sd[f"{p}.{ln}.bias"] = torch.zeros(H)
        # surgery: unconditional per-head gate alpha (bert_attention.py:119-131)
        sd[f"{p}.attention.self.alpha"] = torch.randn(
            BASE["num_attention_heads"], generator=g)
    return sd


@pytest.fixture(scope="module")
def base_ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bert_base_hf")
    torch.save(_build_base_state_dict(), os.path.join(d, "pytorch_model.bin"))
    return str(d)


def test_converter_recovers_base_scale_tensors(base_ckpt_dir):
    from outeffhop_tpu.models.bert import BertConfig
    from outeffhop_tpu.utils.hf_convert import (
        bert_params_from_state_dict, load_torch_state_dict,
    )

    sd = load_torch_state_dict(os.path.join(base_ckpt_dir, "pytorch_model.bin"))
    cfg = BertConfig(**BASE, attn_softmax="softmax1",
                     attn_gate_type="unconditional_per_head")
    params = bert_params_from_state_dict(sd, cfg)
    assert len(params["layers"]) == 12
    # exact tensor recovery at real shapes, incl. the gate alphas
    np.testing.assert_array_equal(
        np.asarray(params["layers"][3]["attention"]["gate"]["alpha"]),
        sd["bert.encoder.layer.3.attention.self.alpha"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"][7]["attention"]["query"]["weight"]),
        sd["bert.encoder.layer.7.attention.self.query.weight"],
    )
    # tied decoder: weight == word embeddings
    np.testing.assert_array_equal(
        np.asarray(params["head"]["decoder"]["weight"]),
        sd["bert.embeddings.word_embeddings.weight"],
    )
    assert params["layers"][0]["attention"]["gate"]["alpha"].shape == (12,)


def test_validate_mlm_runs_base_scale_checkpoint(base_ckpt_dir):
    """The full CLI path: --model_name_or_path <dir> at BERT-base scale with
    gated softmax1 attention; FP eval must produce a finite perplexity and
    the telemetry probes must populate."""
    from outeffhop_tpu.drivers.validate_mlm import main

    res = main([
        "--model_name_or_path", base_ckpt_dir,
        "--attn_softmax", "softmax1",
        "--attn_gate_type", "unconditional_per_head",
        "--vocab_size", str(BASE["vocab_size"]),
        "--hidden_size", str(BASE["hidden_size"]),
        "--num_hidden_layers", str(BASE["num_hidden_layers"]),
        "--num_attention_heads", str(BASE["num_attention_heads"]),
        "--intermediate_size", str(BASE["intermediate_size"]),
        "--synthetic_tokens", "8000",
        "--per_device_eval_batch_size", "4",
    ])
    assert np.isfinite(res["perplexity"]) and res["perplexity"] > 1
    telem = [k for k in res if k.endswith("inf_norm") or k.endswith("kurtosis")]
    assert telem and all(np.isfinite(res[k]) for k in telem), sorted(res)
