"""MobileCLIP-B hybrid-ViT trunk: torch-oracle parity + conversion.

The oracle hand-builds the TRAIN-FORM CVNets ViT in plain torch (3-conv
MCi stem with BatchNorm on all but the last conv, patch-only positional
table added BEFORE the CLS token, pre-norm transformer blocks in the
CVNets ``pre_norm_mha``/``pre_norm_ffn`` layout, ``post_transformer_norm``,
bare ``classifier.proj`` projection), exports its state dict in the Apple
``image_encoder.model.*`` key layout — the fingerprint the reference
dispatches on for the B model (/root/reference/src/open_clip/convert.py:
187-189, ``patch_emb.0.block.conv.weight`` -> fastvit=False branch) —
converts via the BN-fusing converter, and asserts the deploy-form Flax
trunk reproduces the torch forward, validating the stem-fusion math, the
no_embed_class ordering, and the key mapping at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.models.timm_model import (
    TimmModel,
    convert_mobileclip_vit,
    infer_mci_vit_name,
    register_timm_vit,
)

WIDTH, LAYERS, HEADS, EMBED, IMG = 48, 2, 2, 32, 32
STEM = (12, 24, 48)

register_timm_vit("vit_mci_test", patch_size=16, width=WIDTH, layers=LAYERS,
                  heads=HEADS, image_size=IMG, stem_channels=STEM,
                  no_embed_class=True)


class TorchHybridViT(nn.Module):
    """Train-form CVNets/Apple hybrid ViT (MobileCLIP-B image tower)."""

    def __init__(self, width=WIDTH, layers=LAYERS, heads=HEADS, embed=EMBED,
                 stem=STEM, img=IMG):
        super().__init__()
        mods = []
        cin = 3
        for i, (k, cout) in enumerate(zip((4, 2, 2), stem)):
            last = i == len(stem) - 1
            layer = nn.Module()
            block = nn.Sequential()
            block.add_module("conv", nn.Conv2d(cin, cout, k, k, 0, bias=last))
            if not last:
                block.add_module("norm", nn.BatchNorm2d(cout))
                block.add_module("act", nn.GELU())
            layer.block = block
            mods.append(layer)
            cin = cout
        self.patch_emb = nn.ModuleList(mods)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, width))
        n_patches = (img // 16) ** 2
        pos = nn.Module()
        inner = nn.Module()
        inner.pos_embed = nn.Parameter(torch.zeros(1, n_patches, width))
        pos.pos_embed = inner
        self.pos_embed = pos
        self.transformer = nn.ModuleList()
        for _ in range(layers):
            blk = nn.Module()
            blk.pre_norm_mha = nn.ModuleList([
                nn.LayerNorm(width),
                nn.MultiheadAttention(width, heads, batch_first=True),
            ])
            blk.pre_norm_ffn = nn.ModuleList([
                nn.LayerNorm(width),
                nn.Linear(width, 4 * width),
                nn.GELU(),
                nn.Dropout(0.0),
                nn.Linear(4 * width, width),
            ])
            self.transformer.append(blk)
        self.post_transformer_norm = nn.LayerNorm(width)
        # torch-Linear orientation [out, in]: exercises the converter's
        # shape-based re-orientation of the bare classifier matrix
        clf = nn.Module()
        clf.proj = nn.Parameter(torch.zeros(embed, width))
        self.classifier = clf

    def forward(self, x):                       # NCHW
        for m in self.patch_emb:
            x = m.block(x)
        x = x.flatten(2).transpose(1, 2)        # [B, N, W]
        x = x + self.pos_embed.pos_embed.pos_embed
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.transformer:
            ln1, attn = blk.pre_norm_mha
            h = ln1(x)
            x = x + attn(h, h, h, need_weights=False)[0]
            ffn = blk.pre_norm_ffn
            x = x + ffn[4](ffn[2](ffn[1](ffn[0](x))))
        x = self.post_transformer_norm(x)
        return x[:, 0] @ self.classifier.proj.T


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()


def apple_sd(m: nn.Module, prefix="image_encoder.model."):
    sd = {}
    for k, v in m.state_dict().items():
        k = k.replace("pre_norm_mha.1.in_proj_", "pre_norm_mha.1.qkv_proj.")
        sd[prefix + k] = v.detach().numpy()
    return sd


def test_hybrid_vit_fused_forward_matches_oracle():
    oracle = TorchHybridViT()
    _randomize(oracle, 0)
    sd = apple_sd(oracle, prefix="")
    assert infer_mci_vit_name(sd) == "vit_mci_test"

    trunk_params = convert_mobileclip_vit(sd, "vit_mci_test")
    tower = TimmModel(model_name="vit_mci_test", embed_dim=EMBED,
                      image_size=IMG, pool="token", proj="linear")
    # converted classifier.proj [out, in] -> head kernel [in, out]
    head = {"kernel": jnp.asarray(
        np.ascontiguousarray(sd["classifier.proj"].T))}
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    pooled, tokens = tower.apply(
        {"params": {"trunk": trunk_params, "head": head}}, jnp.asarray(imgs))

    with torch.no_grad():
        ref = oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(pooled), ref.numpy(),
                               atol=5e-5, rtol=1e-4)
    # tokens are the post-norm patch tokens
    assert tokens.shape == (2, (IMG // 16) ** 2, WIDTH)


def test_hybrid_vit_param_tree_matches_converter():
    oracle = TorchHybridViT()
    _randomize(oracle, 1)
    params = convert_mobileclip_vit(apple_sd(oracle, prefix=""),
                                    "vit_mci_test")
    tower = TimmModel(model_name="vit_mci_test", embed_dim=EMBED,
                      image_size=IMG, pool="token", proj="linear")
    init = tower.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, IMG, IMG, 3)))["params"]["trunk"]
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    i_flat = jax.tree_util.tree_flatten_with_path(init)[0]
    assert [k for k, _ in p_flat] == [k for k, _ in i_flat]
    for (k, a), (_, b) in zip(p_flat, i_flat):
        assert a.shape == b.shape, (k, a.shape, b.shape)


class _TorchText(nn.Module):
    """Apple-layout base text tower (same as the S1/S2 text map)."""

    def __init__(self, vocab=49408, ctx=16, dim=32, layers=2, embed=EMBED):
        super().__init__()
        self.embedding_layer = nn.Embedding(vocab, dim)
        pos = nn.Module()
        inner = nn.Module()
        inner.pos_embed = nn.Parameter(torch.randn(1, ctx, dim) * 0.02)
        pos.pos_embed = inner
        self.positional_embedding = pos
        self.transformer = nn.ModuleList()
        for _ in range(layers):
            blk = nn.Module()
            blk.pre_norm_mha = nn.ModuleList([
                nn.LayerNorm(dim),
                nn.MultiheadAttention(dim, 2, batch_first=True),
            ])
            blk.pre_norm_ffn = nn.ModuleList([
                nn.LayerNorm(dim),
                nn.Linear(dim, 4 * dim),
                nn.GELU(),
                nn.Dropout(0.0),
                nn.Linear(4 * dim, dim),
            ])
            self.transformer.append(blk)
        self.final_layer_norm = nn.LayerNorm(dim)
        self.projection_layer = nn.Parameter(torch.randn(dim, embed) * 0.02)

    def forward(self, tokens):
        x = (self.embedding_layer(tokens)
             + self.positional_embedding.pos_embed.pos_embed)
        L = x.shape[1]
        mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        for blk in self.transformer:
            ln1, attn = blk.pre_norm_mha
            h = ln1(x)
            x = x + attn(h, h, h, attn_mask=mask, need_weights=False)[0]
            ffn = blk.pre_norm_ffn
            x = x + ffn[4](ffn[2](ffn[1](ffn[0](x))))
        x = self.final_layer_norm(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.projection_layer


def test_mobileclip_b_full_convert_and_forward():
    torch.manual_seed(5)
    img_oracle = TorchHybridViT()
    _randomize(img_oracle, 2)
    txt_oracle = _TorchText()
    for p in txt_oracle.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape) * 0.05)
    txt_oracle.eval()

    sd = apple_sd(img_oracle)
    for k, v in txt_oracle.state_dict().items():
        k = k.replace("pre_norm_mha.1.in_proj_", "pre_norm_mha.1.qkv_proj.")
        sd["text_encoder." + k] = v.detach().numpy()
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)

    from cosmos_tpu.models.convert import convert_state_dict, detect_format

    assert detect_format(sd) == "mobileclip"
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="vit_mci_test",
        vision_timm_pool="token",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    params = convert_state_dict(model, params, sd)
    assert float(params["logit_scale"]) == pytest.approx(np.log(1 / 0.07))

    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    tokens = np.zeros((2, 16), np.int64)
    tokens[:, 0] = 49406
    tokens[0, 1:5] = [320, 1125, 539, 49407]
    tokens[1, 1:3] = [777, 49407]

    out = model.apply({"params": params}, jnp.asarray(imgs),
                      jnp.asarray(tokens.astype(np.int32)))
    with torch.no_grad():
        ref_img = img_oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2))
        ref_txt = txt_oracle(torch.from_numpy(tokens))
    ref_img = ref_img / ref_img.norm(dim=-1, keepdim=True)
    ref_txt = ref_txt / ref_txt.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               ref_img.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["text_features"]),
                               ref_txt.numpy(), atol=1e-4, rtol=1e-3)


def test_hybrid_pos_embed_with_cls_row_refused():
    """A pos table with a CLS row is a different tower variant — the
    converter must refuse rather than silently misalign."""
    oracle = TorchHybridViT()
    _randomize(oracle, 3)
    sd = apple_sd(oracle, prefix="")
    pe = sd["pos_embed.pos_embed.pos_embed"]
    sd["pos_embed.pos_embed.pos_embed"] = np.concatenate(
        [np.zeros((1, 1, WIDTH), pe.dtype), pe], axis=1)
    with pytest.raises(ValueError, match="patch-only"):
        convert_mobileclip_vit(sd, "vit_mci_test")


def test_mobileclip_b_config_builds():
    """The shipped MobileCLIP-B config constructs (init_params=False keeps
    this cheap — vit_base_mci_224 at 224px is the real geometry)."""
    model, params = create_model("MobileCLIP-B", init_params=False)
    assert params is None
    assert model.cfg.vision_cfg.timm_model_name == "vit_base_mci_224"
    assert model.cfg.vision_cfg.image_size == 224
    assert model.cfg.embed_dim == 512


def test_mobileclip_b_pretrained_entries():
    from cosmos_tpu.models.pretrained import get_pretrained_cfg

    for tag, fname in (("datacompdr", "mobileclip_b.pt"),
                       ("datacompdr_lt", "mobileclip_blt.pt")):
        cfg = get_pretrained_cfg("MobileCLIP-B", tag)
        assert cfg["url"].endswith(fname)
        assert cfg["mean"] == (0.0, 0.0, 0.0)
