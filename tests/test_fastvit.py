"""FastViT/MCi trunk (models/fastvit.py): torch-oracle parity + MobileCLIP
conversion.

The oracle hand-builds the TRAIN-FORM architecture in plain torch
following Apple ml-fastvit / ml-mobileclip semantics (multi-branch
MobileOne blocks with conv+BN / 1x1-scale / BN-identity branches,
RepMixer ``x + ls*(mixer(x) - norm(x))``, ReparamLargeKernelConv 7x7+3x3
downsampling, RepCPE, BN-normed MHSA stage, ConvFFN with layer scales,
SE'd conv_exp), exports its state dict in the Apple
``image_encoder.model.*`` key layout (the fingerprint the reference
dispatches on, /root/reference/src/open_clip/convert.py:183-190),
converts via the fusing converter, and asserts the deploy-form Flax
trunk reproduces the branched torch forward — which simultaneously
validates the reparameterization math and the key mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.models.fastvit import (
    FastVit,
    convert_mobileclip_image,
    infer_fastvit_name,
    register_fastvit,
)

LAYERS, DIMS, IMG = (1, 1, 2, 1), (8, 16, 32, 64), 64
RATIO = 3
HEAD_DIM = 32

register_fastvit("fastvit_test", layers=LAYERS, dims=DIMS)


def conv_bn(in_ch, out_ch, k, stride=1, groups=1):
    m = nn.Sequential()
    m.add_module("conv", nn.Conv2d(in_ch, out_ch, k, stride, k // 2,
                                   groups=groups, bias=False))
    m.add_module("bn", nn.BatchNorm2d(out_ch))
    return m


class SEBlock(nn.Module):
    def __init__(self, ch, rd_ratio=1.0 / 16):
        super().__init__()
        rd = max(1, int(ch * rd_ratio))
        self.reduce = nn.Conv2d(ch, rd, 1, bias=True)
        self.expand = nn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        w = F.avg_pool2d(x, kernel_size=x.shape[2:])
        w = torch.sigmoid(self.expand(F.relu(self.reduce(w))))
        return x * w


class MobileOneBlock(nn.Module):
    """Train-form MobileOne block (ml-fastvit mobileone.py naming)."""

    def __init__(self, in_ch, out_ch, k, stride=1, groups=1, use_se=False,
                 use_act=True, use_scale_branch=True, num_conv_branches=1):
        super().__init__()
        self.se = SEBlock(out_ch) if use_se else nn.Identity()
        self.activation = nn.GELU() if use_act else nn.Identity()
        self.rbr_skip = (nn.BatchNorm2d(in_ch)
                         if out_ch == in_ch and stride == 1 else None)
        if num_conv_branches > 0:
            self.rbr_conv = nn.ModuleList(
                [conv_bn(in_ch, out_ch, k, stride, groups)
                 for _ in range(num_conv_branches)])
        else:
            self.rbr_conv = None
        self.rbr_scale = (conv_bn(in_ch, out_ch, 1, stride, groups)
                          if k > 1 and use_scale_branch else None)

    def forward(self, x):
        out = 0.0
        if self.rbr_skip is not None:
            out = self.rbr_skip(x)
        if self.rbr_scale is not None:
            out = out + self.rbr_scale(x)
        if self.rbr_conv is not None:
            for branch in self.rbr_conv:
                out = out + branch(x)
        return self.activation(self.se(out))


class ReparamLargeKernelConv(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride, groups, small_kernel,
                 use_act=True):
        super().__init__()
        self.lkb_origin = conv_bn(in_ch, out_ch, k, stride, groups)
        self.small_conv = conv_bn(in_ch, out_ch, small_kernel, stride, groups)
        self.activation = nn.GELU() if use_act else nn.Identity()

    def forward(self, x):
        return self.activation(self.lkb_origin(x) + self.small_conv(x))


class RepMixer(nn.Module):
    def __init__(self, dim, k=3):
        super().__init__()
        self.norm = MobileOneBlock(dim, dim, k, groups=dim, use_act=False,
                                   use_scale_branch=False, num_conv_branches=0)
        self.mixer = MobileOneBlock(dim, dim, k, groups=dim, use_act=False)
        self.layer_scale = nn.Parameter(1e-5 * torch.ones(dim, 1, 1))

    def forward(self, x):
        return x + self.layer_scale * (self.mixer(x) - self.norm(x))


class ConvFFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.conv = conv_bn(dim, dim, 7, 1, dim)
        self.fc1 = nn.Conv2d(dim, hidden, 1)
        self.fc2 = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(self.conv(x))))


class RepMixerBlock(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.token_mixer = RepMixer(dim)
        self.convffn = ConvFFN(dim, hidden)
        self.layer_scale = nn.Parameter(1e-5 * torch.ones(dim, 1, 1))

    def forward(self, x):
        x = self.token_mixer(x)
        return x + self.layer_scale * self.convffn(x)


class MHSA(nn.Module):
    def __init__(self, dim, head_dim=HEAD_DIM):
        super().__init__()
        self.heads, self.head_dim = dim // head_dim, head_dim
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):                      # NCHW
        B, C, H, W = x.shape
        t = x.flatten(2).transpose(1, 2)       # [B, N, C]
        qkv = self.qkv(t).reshape(B, H * W, 3, self.heads, self.head_dim)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        o = (att.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, H * W, C)
        return self.proj(o).transpose(1, 2).reshape(B, C, H, W)


class AttentionBlock(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.BatchNorm2d(dim)
        self.token_mixer = MHSA(dim)
        self.convffn = ConvFFN(dim, hidden)
        self.layer_scale_1 = nn.Parameter(1e-5 * torch.ones(dim, 1, 1))
        self.layer_scale_2 = nn.Parameter(1e-5 * torch.ones(dim, 1, 1))

    def forward(self, x):
        x = x + self.layer_scale_1 * self.token_mixer(self.norm(x))
        return x + self.layer_scale_2 * self.convffn(x)


class RepCPE(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.pe = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim, bias=True)

    def forward(self, x):
        return self.pe(x) + x


class PatchEmbed(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.proj = nn.Sequential(
            ReparamLargeKernelConv(in_ch, out_ch, 7, 2, in_ch, 3),
            MobileOneBlock(out_ch, out_ch, 1),
        )

    def forward(self, x):
        return self.proj(x)


class GlobalPool2D(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.proj = nn.Parameter(in_dim ** -0.5 * torch.randn(in_dim, out_dim))

    def forward(self, x):                      # NCHW
        return x.mean(dim=(2, 3)) @ self.proj


class TorchMCi(nn.Module):
    """Apple-layout MCi trunk (ml-fastvit FastViT assembly)."""

    def __init__(self, embed_dim=None):
        super().__init__()
        d0 = DIMS[0]
        self.patch_embed = nn.Sequential(
            MobileOneBlock(3, d0, 3, stride=2),
            MobileOneBlock(d0, d0, 3, stride=2, groups=d0),
            MobileOneBlock(d0, d0, 1),
        )
        net = []
        for s, (depth, dim) in enumerate(zip(LAYERS, DIMS)):
            if s == 3:
                net.append(RepCPE(dim))
            blk = RepMixerBlock if s < 3 else AttentionBlock
            net.append(nn.Sequential(
                *[blk(dim, dim * RATIO) for _ in range(depth)]))
            if s < 3:
                net.append(PatchEmbed(dim, DIMS[s + 1]))
        self.network = nn.ModuleList(net)
        final = DIMS[-1] * 2
        self.conv_exp = MobileOneBlock(DIMS[-1], final, 3, groups=DIMS[-1],
                                       use_se=True)
        self.head = GlobalPool2D(final, embed_dim) if embed_dim else None

    def forward(self, x):
        x = self.patch_embed(x)
        for m in self.network:
            x = m(x)
        x = self.conv_exp(x)
        tokens = x.flatten(2).transpose(1, 2)
        pooled = tokens.mean(dim=1)
        if self.head is not None:
            pooled = self.head(x)
        return pooled, tokens


def _randomize(model: nn.Module, seed: int) -> None:
    """Random weights AND random BatchNorm running stats, so the fusion
    math is exercised away from init (gamma=1, var=1 would hide errors)."""
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.3)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()


def apple_state_dict(m: nn.Module, prefix="image_encoder.model."):
    return {prefix + k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_fastvit_fused_forward_matches_branched_oracle():
    oracle = TorchMCi()
    _randomize(oracle, 0)
    sd = apple_state_dict(oracle, prefix="")
    assert infer_fastvit_name(sd) == "fastvit_test"

    trunk = FastVit(model_name="fastvit_test")
    params = convert_mobileclip_image(sd, "fastvit_test")
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    pooled, tokens = trunk.apply({"params": params}, jnp.asarray(imgs))

    with torch.no_grad():
        ref_pooled, ref_tokens = oracle(
            torch.from_numpy(imgs).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pooled), ref_pooled.numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), atol=5e-5, rtol=1e-4)


def test_fastvit_param_tree_matches_converter():
    """Converted tree == init tree structurally (every slot filled)."""
    oracle = TorchMCi()
    _randomize(oracle, 1)
    params = convert_mobileclip_image(apple_state_dict(oracle, prefix=""),
                                      "fastvit_test")
    init = FastVit(model_name="fastvit_test").init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    i_flat = jax.tree_util.tree_flatten_with_path(init)[0]
    assert [k for k, _ in p_flat] == [k for k, _ in i_flat]
    for (k, a), (_, b) in zip(p_flat, i_flat):
        assert a.shape == b.shape, (k, a.shape, b.shape)


class TorchMCText(nn.Module):
    """Apple-layout base text tower (the reference's text key map,
    convert.py:154-180: pre_norm_mha.{0,1}, pre_norm_ffn.{0,1,4})."""

    def __init__(self, vocab, ctx, dim, layers, embed_dim):
        super().__init__()
        self.embedding_layer = nn.Embedding(vocab, dim)
        pos = nn.Module()
        pos_inner = nn.Module()
        pos_inner.pos_embed = nn.Parameter(torch.randn(1, ctx, dim) * 0.02)
        pos.pos_embed = pos_inner
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
        self.projection_layer = nn.Parameter(torch.randn(dim, embed_dim) * 0.02)

    def forward(self, tokens):
        x = self.embedding_layer(tokens) + self.positional_embedding.pos_embed.pos_embed
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


def _mobileclip_checkpoint():
    """Tiny full MobileCLIP checkpoint in Apple key layout."""
    img = TorchMCi(embed_dim=32)
    _randomize(img, 2)
    txt = TorchMCText(vocab=49408, ctx=16, dim=32, layers=2, embed_dim=32)
    for p in txt.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape) * 0.05)
    txt.eval()
    sd = apple_state_dict(img)
    # nn.MultiheadAttention stores packed in_proj_weight/bias — rename to
    # Apple's qkv_proj/out_proj naming
    for k, v in txt.state_dict().items():
        k = k.replace("pre_norm_mha.1.in_proj_", "pre_norm_mha.1.qkv_proj.")
        sd["text_encoder." + k] = v.detach().numpy()
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)
    return img, txt, sd


def test_mobileclip_full_convert_and_forward():
    torch.manual_seed(3)
    img_oracle, txt_oracle, sd = _mobileclip_checkpoint()

    from cosmos_tpu.models.convert import convert_state_dict, detect_format

    assert detect_format(sd) == "mobileclip"
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="fastvit_test",
        vision_timm_pool="avg",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    params = convert_state_dict(model, params, sd)
    assert float(params["logit_scale"]) == pytest.approx(np.log(1 / 0.07))

    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    tokens = np.zeros((2, 16), np.int64)
    tokens[:, 0] = 49406
    tokens[0, 1:5] = [320, 1125, 539, 49407]
    tokens[1, 1:3] = [777, 49407]

    out = model.apply({"params": params}, jnp.asarray(imgs),
                      jnp.asarray(tokens.astype(np.int32)))
    with torch.no_grad():
        ref_img, _ = img_oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2))
        ref_txt = txt_oracle(torch.from_numpy(tokens))
    ref_img = ref_img / ref_img.norm(dim=-1, keepdim=True)
    ref_txt = ref_txt / ref_txt.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               ref_img.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["text_features"]),
                               ref_txt.numpy(), atol=1e-4, rtol=1e-3)


def test_mobileclip_wrong_tower_and_s0_refused_with_actionable_errors():
    from cosmos_tpu.models.convert import convert_mobileclip

    # a B (hybrid-ViT) checkpoint against a FastViT-configured model:
    # actionable redirect to the MobileCLIP-B config (the B trunk itself
    # is supported — tests/test_mobileclip_b.py)
    params = {"visual": {"trunk": {}}, "text": {"transformer": {}}}
    with pytest.raises(ValueError, match="MobileCLIP-B"):
        convert_mobileclip(params, {
            "image_encoder.model.patch_emb.0.block.conv.weight": np.zeros(1)})
    # S0-style: MCi image tower but a non-transformer (MCt) text layout
    img = TorchMCi()
    _randomize(img, 4)
    sd = apple_state_dict(img)
    sd["text_encoder.some_conv_thing.weight"] = np.zeros(1)
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="fastvit_test",
        vision_timm_pool="avg",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    with pytest.raises((NotImplementedError, KeyError)):
        convert_mobileclip(params, sd)


def test_mobileclip_config_files_build():
    """The shipped MobileCLIP-S1/S2 configs construct (init_params=False
    keeps this cheap — mci1/mci2 at 256px are real geometries)."""
    for name, trunk in (("MobileCLIP-S1", "fastvit_mci1"),
                        ("MobileCLIP-S2", "fastvit_mci2")):
        model, params = create_model(name, init_params=False)
        assert params is None
        assert model.cfg.vision_cfg.timm_model_name == trunk
        assert model.cfg.vision_cfg.image_size == 256
        assert model.cfg.embed_dim == 512


def test_mobileclip_preprocess_defaults_merge():
    """The factory merges the pretrained tag's preprocess cfg into the
    transforms (reference factory.py:329-330 merge_preprocess_dict):
    MobileCLIP checkpoints carry identity mean/std + bilinear resize —
    silently applying OpenAI normalization would corrupt every eval."""
    from cosmos_tpu.data.constants import OPENAI_DATASET_MEAN
    from cosmos_tpu.models.factory import pretrained_preprocess_defaults

    pp = pretrained_preprocess_defaults("MobileCLIP-S1", "datacompdr")
    assert pp["mean"] == (0.0, 0.0, 0.0)
    assert pp["std"] == (1.0, 1.0, 1.0)
    assert pp["interpolation"] == "bilinear"
    assert pp["resize_mode"] == "shortest"
    # explicit arguments win over the registry entry
    pp = pretrained_preprocess_defaults(
        "MobileCLIP-S1", "datacompdr", image_mean=(0.5, 0.5, 0.5))
    assert pp["mean"] == (0.5, 0.5, 0.5)
    assert pp["std"] == (1.0, 1.0, 1.0)
    # a local checkpoint path (not a registry tag) keeps OpenAI defaults
    pp = pretrained_preprocess_defaults("ViT-B-16", "/tmp/ckpt.pt")
    assert pp["mean"] == tuple(OPENAI_DATASET_MEAN)
    assert pp["interpolation"] == "bicubic"


def test_eval_transform_interpolation_plumbs():
    import numpy as np
    from PIL import Image

    from cosmos_tpu.data.transforms import image_transform_eval

    img = Image.fromarray(
        (np.random.RandomState(0).rand(80, 96, 3) * 255).astype("uint8"))
    tf_bl = image_transform_eval(64, mean=(0.0, 0.0, 0.0),
                                 std=(1.0, 1.0, 1.0),
                                 interpolation="bilinear")
    out = tf_bl(img)
    assert out.shape[:2] == (64, 64)
    # identity normalization keeps raw [0, 1] pixel values
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # bilinear actually differs from the bicubic default
    tf_bc = image_transform_eval(64, mean=(0.0, 0.0, 0.0),
                                 std=(1.0, 1.0, 1.0))
    assert not np.allclose(out, tf_bc(img))


def test_fastvit_remat_matches_unrematted():
    """--grad-checkpointing on a FastViT/MCi trunk (round 5): rematted
    forward AND gradients equal the plain trunk's."""
    import jax
    import jax.numpy as jnp

    from cosmos_tpu.models.fastvit import FastVit

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    plain = FastVit(model_name="fastvit_test")
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    remat = FastVit(model_name="fastvit_test", remat=True)

    def loss(m, p):
        pooled, _ = m.apply({"params": p}, x)
        return jnp.sum(pooled ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-5),
        g1, g2)
