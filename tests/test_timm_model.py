"""timm-ViT vision tower: torch-oracle parity + config dispatch.

The oracle builds a timm-layout ViT in plain torch (pre-norm blocks with
packed qkv, biased patch conv, CLS token, final norm — the architecture
timm's vision_transformer.py produces), exports its state dict in timm
key layout, converts via models.timm_model.convert_timm_vit, and checks
the flax trunk forward matches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from cosmos_tpu.models.factory import create_model, init_model_params
from cosmos_tpu.models.timm_model import (
    TimmModel,
    convert_timm_vit,
    infer_timm_vit_name,
    register_timm_vit,
)

W, LAYERS, HEADS, P, IMG = 64, 2, 2, 8, 32

register_timm_vit(
    "vit_test_patch8_32", patch_size=P, width=W, layers=LAYERS, heads=HEADS,
    image_size=IMG,
)


class TorchTimmBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(W)
        self.qkv = nn.Linear(W, 3 * W)
        self.proj = nn.Linear(W, W)
        self.norm2 = nn.LayerNorm(W)
        self.fc1 = nn.Linear(W, 4 * W)
        self.fc2 = nn.Linear(4 * W, W)

    def forward(self, x):
        h = self.norm1(x)
        B, L, _ = h.shape
        qkv = self.qkv(h).reshape(B, L, 3, HEADS, W // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(B, L, W)
        x = x + self.proj(att)
        h = self.norm2(x)
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x


class TorchTimmViT(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch = nn.Conv2d(3, W, P, stride=P)
        self.cls_token = nn.Parameter(torch.randn(1, 1, W) * 0.02)
        n = (IMG // P) ** 2 + 1
        self.pos_embed = nn.Parameter(torch.randn(1, n, W) * 0.02)
        self.blocks = nn.ModuleList([TorchTimmBlock() for _ in range(LAYERS)])
        self.norm = nn.LayerNorm(W)

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)   # [B, N, W]
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        # avg pool over patch tokens; patch tokens (the flax tower's
        # `tokens` output excludes the CLS prefix)
        return x[:, 1:].mean(dim=1), x[:, 1:]


def timm_state_dict(m: TorchTimmViT):
    sd = {
        "cls_token": m.cls_token.detach().numpy(),
        "pos_embed": m.pos_embed.detach().numpy(),
        "patch_embed.proj.weight": m.patch.weight.detach().numpy(),
        "patch_embed.proj.bias": m.patch.bias.detach().numpy(),
        "norm.weight": m.norm.weight.detach().numpy(),
        "norm.bias": m.norm.bias.detach().numpy(),
    }
    for i, blk in enumerate(m.blocks):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": blk.norm1.weight.detach().numpy(),
            f"{p}.norm1.bias": blk.norm1.bias.detach().numpy(),
            f"{p}.attn.qkv.weight": blk.qkv.weight.detach().numpy(),
            f"{p}.attn.qkv.bias": blk.qkv.bias.detach().numpy(),
            f"{p}.attn.proj.weight": blk.proj.weight.detach().numpy(),
            f"{p}.attn.proj.bias": blk.proj.bias.detach().numpy(),
            f"{p}.norm2.weight": blk.norm2.weight.detach().numpy(),
            f"{p}.norm2.bias": blk.norm2.bias.detach().numpy(),
            f"{p}.mlp.fc1.weight": blk.fc1.weight.detach().numpy(),
            f"{p}.mlp.fc1.bias": blk.fc1.bias.detach().numpy(),
            f"{p}.mlp.fc2.weight": blk.fc2.weight.detach().numpy(),
            f"{p}.mlp.fc2.bias": blk.fc2.bias.detach().numpy(),
        })
    return sd


def test_convert_timm_vit_forward_parity():
    torch.manual_seed(0)
    oracle = TorchTimmViT().eval()
    sd = timm_state_dict(oracle)
    assert infer_timm_vit_name(sd) == "vit_test_patch8_32"

    tower = TimmModel(
        model_name="vit_test_patch8_32", embed_dim=32, image_size=IMG,
        pool="avg", proj="none",
    )
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, IMG, IMG, 3)).astype(np.float32)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    params = dict(params)
    params["trunk"] = convert_timm_vit(sd, "vit_test_patch8_32")

    pooled, tokens = tower.apply({"params": params}, jnp.asarray(imgs))
    with torch.no_grad():
        ref_pooled, ref_tokens = oracle(
            torch.from_numpy(imgs).permute(0, 3, 1, 2)
        )
    np.testing.assert_allclose(
        np.asarray(pooled), ref_pooled.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), atol=2e-5, rtol=1e-4
    )


def test_timm_config_dispatch_builds_clip():
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="vit_test_patch8_32",
        vision_timm_pool="avg",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    texts = jnp.zeros((2, 16), jnp.int32)
    out = model.apply({"params": params}, imgs, texts)
    assert out["image_features"].shape == out["text_features"].shape
    assert np.isfinite(np.asarray(out["image_features"])).all()


def test_unsupported_trunk_raises():
    # ConvNeXt and EVA02 became native trunk families (models/convnext.py,
    # models/eva.py); FastViT remains out of scope and must fail at
    # construction
    tower = TimmModel(model_name="fastvit_t8", embed_dim=32)
    with pytest.raises(NotImplementedError):
        tower.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))


def test_timm_with_cosmos_heads_raises():
    """COSMOS needs the native tower's cross-pooler; the timm adapter must
    fail at construction, not KeyError mid-trace."""
    with pytest.raises(ValueError, match="timm vision towers"):
        create_model(
            "ViT-Tiny-Test", cosmos=True, output_all=True,
            attentional_pool=True, add_zero_attn=True,
            vision_timm_model_name="vit_test_patch8_32",
            vision_image_size=IMG,
        )


def test_bare_timm_ckpt_into_non_timm_model_raises():
    from cosmos_tpu.models.convert import convert_state_dict

    torch.manual_seed(0)
    sd = timm_state_dict(TorchTimmViT())
    model, params = create_model("ViT-Tiny-Test")
    with pytest.raises(ValueError, match="timm_model_name"):
        convert_state_dict(model, params, sd)
