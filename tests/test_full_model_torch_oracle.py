"""Full-model numerics parity vs an independently assembled torch CLIP.

Builds the reference ARCHITECTURE from stock torch primitives (Conv2d,
MultiheadAttention, LayerNorm, GELU — no reference code), loads OUR
exported state dict into it, and compares encode_image / encode_text
against the flax model end-to-end.  This is the checkpoint-parity
guarantee: any torch-format COSMOS/OpenCLIP weights produce the same
embeddings here as in a torch runtime.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from cosmos_tpu.models.checkpoint import params_to_torch_state_dict
from cosmos_tpu.models.factory import create_model

TINY = {
    "embed_dim": 32,
    "vision_image_size": 32,
    "vision_patch_size": 8,
    "vision_width": 32,
    "vision_layers": 3,
    "vision_head_width": 16,
    "text_context_length": 12,
    "text_vocab_size": 128,
    "text_width": 32,
    "text_heads": 2,
    "text_layers": 3,
}


class TorchBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            nn.Linear(d, 4 * d), nn.GELU(), nn.Linear(4 * d, d)
        )

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class TorchVision(nn.Module):
    def __init__(self, d=32, patch=8, image=32, heads=2, layers=3, out=32):
        super().__init__()
        grid = image // patch
        self.conv1 = nn.Conv2d(3, d, patch, patch, bias=False)
        self.class_embedding = nn.Parameter(torch.zeros(d))
        self.positional_embedding = nn.Parameter(torch.zeros(grid * grid + 1, d))
        self.ln_pre = nn.LayerNorm(d)
        self.blocks = nn.ModuleList(TorchBlock(d, heads) for _ in range(layers))
        self.ln_post = nn.LayerNorm(d)
        self.proj = nn.Parameter(torch.zeros(d, out))

    def forward(self, x):
        x = self.conv1(x)                       # [B, d, g, g]
        x = x.flatten(2).transpose(1, 2)        # [B, N, d]
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], 1) + self.positional_embedding
        x = self.ln_pre(x)
        for b in self.blocks:
            x = b(x)
        x = self.ln_post(x)
        return x[:, 0] @ self.proj


class TorchText(nn.Module):
    def __init__(self, d=32, vocab=128, ctx=12, heads=2, layers=3, out=32):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, d)
        self.positional_embedding = nn.Parameter(torch.zeros(ctx, d))
        self.blocks = nn.ModuleList(TorchBlock(d, heads) for _ in range(layers))
        self.ln_final = nn.LayerNorm(d)
        self.text_projection = nn.Parameter(torch.zeros(d, out))
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("mask", mask)

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        for b in self.blocks:
            x = b(x, attn_mask=self.mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(-1)]
        return pooled @ self.text_projection


def _load_tower(torch_mod, sd, prefix, text=False):
    own = {}
    n_blocks = len(torch_mod.blocks)
    for i in range(n_blocks):
        t = f"{prefix}transformer.resblocks.{i}" if not text else f"transformer.resblocks.{i}"
        own[f"blocks.{i}.ln_1.weight"] = sd[f"{t}.ln_1.weight"]
        own[f"blocks.{i}.ln_1.bias"] = sd[f"{t}.ln_1.bias"]
        own[f"blocks.{i}.attn.in_proj_weight"] = sd[f"{t}.attn.in_proj_weight"]
        own[f"blocks.{i}.attn.in_proj_bias"] = sd[f"{t}.attn.in_proj_bias"]
        own[f"blocks.{i}.attn.out_proj.weight"] = sd[f"{t}.attn.out_proj.weight"]
        own[f"blocks.{i}.attn.out_proj.bias"] = sd[f"{t}.attn.out_proj.bias"]
        own[f"blocks.{i}.ln_2.weight"] = sd[f"{t}.ln_2.weight"]
        own[f"blocks.{i}.ln_2.bias"] = sd[f"{t}.ln_2.bias"]
        own[f"blocks.{i}.mlp.0.weight"] = sd[f"{t}.mlp.c_fc.weight"]
        own[f"blocks.{i}.mlp.0.bias"] = sd[f"{t}.mlp.c_fc.bias"]
        own[f"blocks.{i}.mlp.2.weight"] = sd[f"{t}.mlp.c_proj.weight"]
        own[f"blocks.{i}.mlp.2.bias"] = sd[f"{t}.mlp.c_proj.bias"]
    if text:
        own["token_embedding.weight"] = sd["token_embedding.weight"]
        own["positional_embedding"] = sd["positional_embedding"]
        own["ln_final.weight"] = sd["ln_final.weight"]
        own["ln_final.bias"] = sd["ln_final.bias"]
        own["text_projection"] = sd["text_projection"]
    else:
        own["conv1.weight"] = sd["visual.conv1.weight"]
        own["class_embedding"] = sd["visual.class_embedding"]
        own["positional_embedding"] = sd["visual.positional_embedding"]
        own["ln_pre.weight"] = sd["visual.ln_pre.weight"]
        own["ln_pre.bias"] = sd["visual.ln_pre.bias"]
        own["ln_post.weight"] = sd["visual.ln_post.weight"]
        own["ln_post.bias"] = sd["visual.ln_post.bias"]
        own["proj"] = sd["visual.proj"]
    torch_mod.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in own.items()},
        strict=False,  # the registered causal-mask buffer isn't in sd
    )


def test_full_towers_match_torch():
    model, params = create_model("ViT-B-16", seed=3, **TINY)
    sd = params_to_torch_state_dict(params)

    tv = TorchVision()
    _load_tower(tv, sd, "visual.")
    tt = TorchText()
    _load_tower(tt, sd, "", text=True)
    tv.eval(), tt.eval()

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    toks = rng.integers(1, 127, size=(4, 12)).astype(np.int64)
    toks[:, -1] = 127  # EOT at the end

    with torch.no_grad():
        torch_img = tv(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        torch_txt = tt(torch.from_numpy(toks)).numpy()

    flax_img = np.asarray(
        model.apply({"params": params}, jnp.asarray(imgs),
                    method=model.encode_image)["image_features"]
    )
    flax_txt = np.asarray(
        model.apply({"params": params}, jnp.asarray(toks.astype(np.int32)),
                    method=model.encode_text)["text_features"]
    )
    np.testing.assert_allclose(flax_img, torch_img, atol=2e-4)
    np.testing.assert_allclose(flax_txt, torch_txt, atol=2e-4)


def test_real_geometry_vit_b16_matches_torch():
    """The SAME oracle at the actual ViT-B-16 geometry (embed 512; vision
    224px/16, 12x768, 12 heads; text ctx 77, vocab 49408, 12x512, 8
    heads): closes the risk that the production configuration hits a
    different code path (e.g. fused-kernel head-dim edges) than the
    32-wide test models.  Runs in f32 on CPU (VERDICT r2 item 6)."""
    model, params = create_model("ViT-B-16", seed=5)
    sd = params_to_torch_state_dict(params)

    tv = TorchVision(d=768, patch=16, image=224, heads=12, layers=12, out=512)
    _load_tower(tv, sd, "visual.")
    tt = TorchText(d=512, vocab=49408, ctx=77, heads=8, layers=12, out=512)
    _load_tower(tt, sd, "", text=True)
    tv.eval(), tt.eval()

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    toks = rng.integers(1, 49407, size=(2, 77)).astype(np.int64)
    toks[:, -1] = 49407  # EOT argmax pool target

    with torch.no_grad():
        torch_img = tv(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        torch_txt = tt(torch.from_numpy(toks)).numpy()

    flax_img = np.asarray(
        model.apply({"params": params}, jnp.asarray(imgs),
                    method=model.encode_image)["image_features"]
    )
    flax_txt = np.asarray(
        model.apply({"params": params}, jnp.asarray(toks.astype(np.int32)),
                    method=model.encode_text)["text_features"]
    )
    # 12 layers of f32 accumulation at width 768: slightly looser than the
    # tiny-geometry bound, far tighter than any bf16 effect
    np.testing.assert_allclose(flax_img, torch_img, atol=2e-3)
    np.testing.assert_allclose(flax_txt, torch_txt, atol=2e-3)
