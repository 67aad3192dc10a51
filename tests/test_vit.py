"""ViT family tests: patch-embed ≡ stride-P conv, parity vs a torch
reference implementation with timm naming (exercising the checkpoint
converter), quant-site discovery, and softmax/gate extras."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from outeffhop_tpu.models.vit import (
    ViTConfig,
    accuracy_topk,
    init_vit_params,
    vit_config,
    vit_forward,
)
from outeffhop_tpu.utils.hf_convert import state_dict_to_numpy, vit_params_from_state_dict

CFG = ViTConfig(
    img_size=32,
    patch_size=8,
    in_chans=3,
    num_classes=10,
    embed_dim=32,
    depth=2,
    num_heads=2,
    mlp_ratio=2.0,
    attn_softmax="softmax1",
)


def _images(b=2, size=32):
    return jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3), jnp.float32)


def test_patch_embed_equals_conv():
    from outeffhop_tpu.models.vit import patch_embed
    from outeffhop_tpu.quant.calibrate import NULL_QCTX

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    imgs = _images()
    ours = patch_embed(params["patch_embed"], CFG, imgs, NULL_QCTX)

    p, d = CFG.patch_size, CFG.embed_dim
    # our matmul kernel rows are (p_h, p_w, c)-ordered → conv kernel (D,C,P,P)
    w = np.asarray(params["patch_embed"]["weight"]).reshape(p, p, 3, d)
    conv_w = torch.tensor(w.transpose(3, 2, 0, 1))
    x_t = torch.tensor(np.asarray(imgs).transpose(0, 3, 1, 2))
    ref = torch.nn.functional.conv2d(
        x_t, conv_w, torch.tensor(np.asarray(params["patch_embed"]["bias"])), stride=p
    )
    ref = ref.flatten(2).transpose(1, 2).numpy()  # (B, N, D)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TorchMiniViT(nn.Module):
    """timm-vision_transformer semantics + naming, with softmax_1
    (`vision_transformer.py` Block/Attention structure, vit_attention.py sdpa)."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d, p = cfg.embed_dim, cfg.patch_size
        self.cfg = cfg
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(cfg.in_chans, d, p, stride=p)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.randn(1, cfg.seq_len, d) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(cfg.depth):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
            blk.attn = nn.Module()
            blk.attn.qkv = nn.Linear(d, 3 * d)
            blk.attn.proj = nn.Linear(d, d)
            blk.norm2 = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
            blk.mlp = nn.Module()
            blk.mlp.fc1 = nn.Linear(d, cfg.mlp_hidden)
            blk.mlp.fc2 = nn.Linear(cfg.mlp_hidden, d)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.head = nn.Linear(d, cfg.num_classes)

    @staticmethod
    def _softmax1(x):
        m = x.max(dim=-1, keepdim=True).values
        e = torch.exp(x - m)
        return e / (torch.exp(-m) + e.sum(dim=-1, keepdim=True))

    def forward(self, x):
        cfg = self.cfg
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos_embed
        H, dh = cfg.num_heads, cfg.head_dim
        for blk in self.blocks:
            h = blk.norm1(x)
            b, n, d = h.shape
            qkv = blk.attn.qkv(h).reshape(b, n, 3, H, dh).permute(2, 0, 3, 1, 4)
            qs, ks, vs = qkv.unbind(0)
            s = qs @ ks.transpose(-2, -1) / math.sqrt(dh)
            p = self._softmax1(s)
            ctx = (p @ vs).transpose(1, 2).reshape(b, n, d)
            x = x + blk.attn.proj(ctx)
            f = blk.norm2(x)
            f = blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(f)))
            x = x + f
        x = self.norm(x)
        return self.head(x[:, 0])


def test_parity_with_torch_reference():
    torch.manual_seed(0)
    model = TorchMiniViT(CFG).eval()
    sd = state_dict_to_numpy(model.state_dict())
    # flatten the nested module names to timm's flat layout
    sd = {k.replace("patch_embed.proj", "patch_embed.proj"): v for k, v in sd.items()}
    params = vit_params_from_state_dict(sd, CFG)
    imgs = _images(b=3)
    ours = vit_forward(params, CFG, imgs)
    with torch.no_grad():
        ref = model(torch.tensor(np.asarray(imgs).transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_quant_sites_discovered():
    from outeffhop_tpu.quant import QuantCtx, QuantizedModelConfig, ScopedQuantCtx

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    config = QuantizedModelConfig()
    ctx = QuantCtx.discover(config)
    vit_forward(params, CFG, _images(), q=ScopedQuantCtx(ctx, ""))
    weights = set(ctx.discovered_weights)
    assert "patch_embed.patch_embed.proj|w" in weights
    assert "block0.attn.qkv|w" in weights
    assert "head.fc|w" in weights  # head quantized when num_classes>0 (:650)
    acts = set(ctx.discovered_acts)
    assert "block0.res1|a" in acts and "block0.res2|a" in acts
    assert "block0.attn.attn_scores|a" in acts and "block0.attn.attn_probs|a" in acts


def test_gating_and_layerscale_run():
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=2,
        num_classes=10, init_scale=1e-5,
        attn_gate_type="conditional_per_token", attn_gate_init=0.5,
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    out = vit_forward(params, cfg, _images())
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()
    # LayerScale at 1e-5 → output ≈ head(norm(pos_embed path)); finite & tiny spread
    cfg2 = ViTConfig(**{**cfg.__dict__, "attn_gate_type": "unconditional_per_head"})
    params2 = init_vit_params(jax.random.PRNGKey(0), cfg2)
    out2 = vit_forward(params2, cfg2, _images())
    assert out2.shape == (2, 10)


def test_presets_and_accuracy():
    cfg = vit_config("vit_tiny_patch16_224")
    assert cfg.embed_dim == 192 and cfg.seq_len == 197
    with pytest.raises(KeyError):
        vit_config("vit_nope")
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.15, 0.05]])
    labels = jnp.asarray([1, 2])
    assert float(accuracy_topk(logits, labels, k=1)) == 50.0
    assert float(accuracy_topk(logits, labels, k=2)) == 50.0
    assert float(accuracy_topk(logits, labels, k=3)) == 100.0


def test_global_pool_avg():
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=2,
        num_classes=0, global_pool="avg",
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    feats = vit_forward(params, cfg, _images())
    assert feats.shape == (2, 32)


def test_attention_pool_latent_map_pooling():
    """global_pool='map' runs AttentionPoolLatent (quantized_vit.py:278):
    FP shape + quantized execution both work."""
    import jax, jax.numpy as jnp, numpy as np
    from outeffhop_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from outeffhop_tpu.quant import (
        QuantizedModelConfig, QuantCtx, ScopedQuantCtx,
        compute_weight_qparams, freeze_act_qparams, run_calibration,
    )

    cfg = ViTConfig(img_size=16, patch_size=4, num_classes=10, embed_dim=32,
                    depth=1, num_heads=2, global_pool="map", class_token=False,
                    attn_softmax="softmax1")
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    logits = vit_forward(params, cfg, imgs)
    assert logits.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))

    qcfg = QuantizedModelConfig(est_num_batches=1)
    ctx = QuantCtx.discover(qcfg)
    vit_forward(params, cfg, imgs, q=ScopedQuantCtx(ctx, ""))
    assert any("attn_pool" in n for n in ctx.discovered_acts)
    wq = compute_weight_qparams(ctx.discovered_weights, qcfg)
    est = run_calibration(
        lambda b, q: vit_forward(params, cfg, b, q=q), qcfg, wq, [imgs]
    )
    aq = freeze_act_qparams(est, qcfg)
    ql = vit_forward(params, cfg, imgs,
                     q=ScopedQuantCtx(QuantCtx.run(qcfg, wq, aq), ""))
    assert ql.shape == (2, 10)
    rel = float(jnp.linalg.norm(ql - logits) / jnp.linalg.norm(logits))
    assert rel < 0.2


def test_vit_presets_extended():
    from outeffhop_tpu.models.vit import vit_config

    c = vit_config("vit_base_patch32_224")
    assert c.patch_size == 32 and c.num_patches == 49
    c = vit_config("vit_base_patch16_384")
    assert c.img_size == 384 and c.num_patches == 576
    c = vit_config("vit_huge_patch14_224")
    assert c.embed_dim == 1280 and c.depth == 32
