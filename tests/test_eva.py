"""EVA02 trunk (models/eva.py): torch-oracle parity + converter + dispatch.

The oracle hand-builds an EVA02 block stack in plain torch following
timm eva.py semantics (separate q/k/v with bias-free k, 2-D axial rope
per the EVA-02 repo's VisionRotaryEmbeddingFast — repeat_interleaved
angle pairs, row half then column half — sub-LN before the attention and
MLP output projections, SwiGLU MLP), exports its state dict in timm key
layout, converts via convert_timm_eva, and asserts forward parity.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from cosmos_tpu.models.eva import (
    Eva,
    EVA_CONFIGS,
    convert_timm_eva,
    infer_timm_eva_name,
    register_eva,
    rope_2d_tables,
)
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.models.timm_model import TimmModel

IMG, PATCH, W, LAYERS, HEADS = 32, 8, 32, 2, 2
HD = W // HEADS

register_eva("eva02_test_patch8_32", patch_size=PATCH, width=W,
             layers=LAYERS, heads=HEADS, scale_mlp=True, scale_attn=True,
             image_size=IMG)


def torch_rope_tables(grid: int, hd: int, theta: float = 10000.0):
    """Independent torch build of the EVA-02 2-D axial rope tables."""
    dim = hd // 2
    freqs = 1.0 / theta ** (
        torch.arange(0, dim, 2, dtype=torch.float64) / dim)
    t = torch.arange(grid, dtype=torch.float64)  # ft == pt at native res
    ang = torch.einsum("i,j->ij", t, freqs)
    ang = torch.repeat_interleave(ang, 2, dim=-1)           # [g, dim]
    row = ang[:, None, :].expand(grid, grid, dim)
    col = ang[None, :, :].expand(grid, grid, dim)
    full = torch.cat([row, col], dim=-1).reshape(grid * grid, hd)
    return full.cos().float(), full.sin().float()


def torch_rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    return torch.stack([-x[..., 1], x[..., 0]], dim=-1).reshape(
        *x.shape[:-2], -1)


class TorchEvaBlock(nn.Module):
    def __init__(self):
        super().__init__()
        hidden = int(W * 4 * 2 / 3)
        self.norm1 = nn.LayerNorm(W, eps=1e-6)
        self.q_proj = nn.Linear(W, W)
        self.k_proj = nn.Linear(W, W, bias=False)
        self.v_proj = nn.Linear(W, W)
        self.attn_norm = nn.LayerNorm(W, eps=1e-6)
        self.proj = nn.Linear(W, W)
        self.norm2 = nn.LayerNorm(W, eps=1e-6)
        self.fc1_g = nn.Linear(W, hidden)
        self.fc1_x = nn.Linear(W, hidden)
        self.mlp_norm = nn.LayerNorm(hidden, eps=1e-6)
        self.fc2 = nn.Linear(hidden, W)

    def forward(self, x, cos, sin):
        b, l, _ = x.shape
        h = self.norm1(x)
        q = self.q_proj(h).reshape(b, l, HEADS, HD).transpose(1, 2)
        k = self.k_proj(h).reshape(b, l, HEADS, HD).transpose(1, 2)
        v = self.v_proj(h).reshape(b, l, HEADS, HD).transpose(1, 2)

        def rope(t):
            pre, pat = t[:, :, :1], t[:, :, 1:]
            pat = pat * cos + torch_rotate_half(pat) * sin
            return torch.cat([pre, pat], dim=2)

        q, k = rope(q), rope(k)
        att = torch.softmax(
            q @ k.transpose(-2, -1) / math.sqrt(HD), dim=-1) @ v
        att = att.transpose(1, 2).reshape(b, l, W)
        x = x + self.proj(self.attn_norm(att))
        h = self.norm2(x)
        m = self.mlp_norm(torch.nn.functional.silu(self.fc1_g(h))
                          * self.fc1_x(h))
        return x + self.fc2(m)


class TorchEva(nn.Module):
    def __init__(self):
        super().__init__()
        grid = IMG // PATCH
        n = grid * grid + 1
        self.patch = nn.Conv2d(3, W, PATCH, stride=PATCH)
        self.cls_token = nn.Parameter(torch.randn(1, 1, W) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n, W) * 0.02)
        self.blocks = nn.ModuleList(TorchEvaBlock() for _ in range(LAYERS))
        self.norm = nn.LayerNorm(W, eps=1e-6)
        cos, sin = torch_rope_tables(grid, HD)
        self.register_buffer("rope_cos", cos)
        self.register_buffer("rope_sin", sin)

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x, self.rope_cos, self.rope_sin)
        x = self.norm(x)
        return x[:, 0], x


def timm_state_dict(m: TorchEva):
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
        pairs = {
            f"{p}.norm1": blk.norm1, f"{p}.norm2": blk.norm2,
            f"{p}.attn.norm": blk.attn_norm, f"{p}.mlp.norm": blk.mlp_norm,
        }
        for key, mod in pairs.items():
            sd[f"{key}.weight"] = mod.weight.detach().numpy()
            sd[f"{key}.bias"] = mod.bias.detach().numpy()
        for key, mod in {
            f"{p}.attn.q_proj": blk.q_proj, f"{p}.attn.v_proj": blk.v_proj,
            f"{p}.attn.proj": blk.proj, f"{p}.mlp.fc1_g": blk.fc1_g,
            f"{p}.mlp.fc1_x": blk.fc1_x, f"{p}.mlp.fc2": blk.fc2,
        }.items():
            sd[f"{key}.weight"] = mod.weight.detach().numpy()
            sd[f"{key}.bias"] = mod.bias.detach().numpy()
        sd[f"{p}.attn.k_proj.weight"] = blk.k_proj.weight.detach().numpy()
    return sd


def test_rope_tables_match_torch():
    cos, sin = rope_2d_tables(4, 4, 16)
    tcos, tsin = torch_rope_tables(4, 16)
    np.testing.assert_allclose(cos, tcos.numpy(), atol=1e-6)
    np.testing.assert_allclose(sin, tsin.numpy(), atol=1e-6)


def test_convert_timm_eva_forward_parity():
    torch.manual_seed(0)
    oracle = TorchEva().eval()
    sd = timm_state_dict(oracle)
    assert infer_timm_eva_name(sd) == "eva02_test_patch8_32"

    trunk = Eva(model_name="eva02_test_patch8_32", image_size=IMG)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, IMG, IMG, 3)).astype(np.float32)
    params = convert_timm_eva(sd, "eva02_test_patch8_32")
    pooled, tokens = trunk.apply({"params": params}, jnp.asarray(imgs))
    with torch.no_grad():
        ref_pooled, ref_tokens = oracle(
            torch.from_numpy(imgs).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pooled), ref_pooled.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), atol=2e-5, rtol=1e-4)


def test_converted_params_match_init_structure():
    """The converter must produce exactly the param tree Eva.init builds."""
    torch.manual_seed(1)
    sd = timm_state_dict(TorchEva())
    conv = convert_timm_eva(sd, "eva02_test_patch8_32")
    trunk = Eva(model_name="eva02_test_patch8_32", image_size=IMG)
    init = trunk.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, IMG, IMG, 3)))["params"]
    flat_c = jax.tree_util.tree_leaves_with_path(conv)
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    assert paths_c == paths_i


def test_eva_dispatch_through_timm_model():
    tower = TimmModel(
        model_name="eva02_test_patch8_32", embed_dim=16, image_size=IMG,
        pool="token", proj="linear",
    )
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), imgs)["params"]
    pooled, tokens = tower.apply({"params": params}, imgs)
    assert pooled.shape == (2, 16)
    assert tokens.shape == (2, 1 + (IMG // PATCH) ** 2, W)


def test_eva_config_dispatch_builds_clip():
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="eva02_test_patch8_32",
        vision_timm_pool="token",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    texts = jnp.zeros((2, 16), jnp.int32)
    out = model.apply({"params": params}, imgs, texts)
    assert out["image_features"].shape == out["text_features"].shape
    assert np.isfinite(np.asarray(out["image_features"])).all()


def test_bare_eva_ckpt_loads_into_timm_tower():
    from cosmos_tpu.models.convert import convert_state_dict, detect_format

    torch.manual_seed(2)
    sd = timm_state_dict(TorchEva())
    assert detect_format(sd) == "timm_eva"
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="eva02_test_patch8_32",
        vision_timm_pool="token",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    out = convert_state_dict(model, params, sd)
    got = np.asarray(out["visual"]["trunk"]["resblocks_0"]["attn"]
                     ["k_proj"]["kernel"])
    np.testing.assert_allclose(
        got, np.asarray(sd["blocks.0.attn.k_proj.weight"]).T, atol=0)


def test_clip_head_loads_classifier_head_ignored():
    """timm *_clip_* checkpoints carry the CLIP projection as the
    classifier head: a shape-matching head must load into visual/head;
    an in1k classifier head (wrong out-dim) must be ignored."""
    from cosmos_tpu.models.convert import convert_state_dict

    torch.manual_seed(3)
    sd = timm_state_dict(TorchEva())
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="eva02_test_patch8_32",
        vision_timm_pool="token",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    # CLIP projection head: [embed_dim, width] (shape-matching) -> loads
    embed_dim = params["visual"]["head"]["kernel"].shape[1]
    head_w = np.random.default_rng(0).normal(
        size=(embed_dim, W)).astype(np.float32)
    out = convert_state_dict(model, params, {**sd, "head.weight": head_w})
    np.testing.assert_allclose(
        np.asarray(out["visual"]["head"]["kernel"]), head_w.T, atol=0)

    # in1k classifier head: [1000, width] -> ignored, head keeps its init
    out = convert_state_dict(
        model, params,
        {**sd, "head.weight": np.zeros((1000, W), np.float32)})
    np.testing.assert_array_equal(
        np.asarray(out["visual"]["head"]["kernel"]),
        np.asarray(params["visual"]["head"]["kernel"]))


def test_fused_qkv_eva_raises():
    sd = {"cls_token": np.zeros((1, 1, W)),
          "pos_embed": np.zeros((1, 17, W)),
          "patch_embed.proj.weight": np.zeros((W, 3, PATCH, PATCH)),
          "patch_embed.proj.bias": np.zeros((W,)),
          "blocks.0.attn.qkv.weight": np.zeros((3 * W, W))}
    with pytest.raises(NotImplementedError, match="fused-qkv"):
        convert_timm_eva(sd, "eva02_test_patch8_32")


def test_eva_tower_trains():
    """An EVA02-trunk CLIP runs the full jitted train step (fwd, bwd
    through rope/SwiGLU/sub-LN, AdamW, EMA) — the reference trains timm
    towers through the same generic loop (timm_model.py + train.py)."""
    from cosmos_tpu.parallel.mesh import create_mesh
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="eva02_test_patch8_32",
        vision_timm_pool="token",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    mesh = create_mesh(1)
    optimizer = create_optimizer(cosine_lr(1e-3, 0, 10))
    step_fn = make_train_step(model, optimizer, mesh,
                              TrainStepConfig(cosmos=False,
                                              log_grad_norm=True))
    state = create_train_state(params, optimizer)
    key = jax.random.PRNGKey(0)
    batch = {
        "global_images": jax.random.normal(key, (2, 4, IMG, IMG, 3)),
        "texts": jax.random.randint(key, (1, 4, 16), 1, 127),
    }
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0.0


def test_eva_non_native_resolution():
    """At a non-native input size the pos embed interpolates bicubically
    and the rope coordinates rescale to the pretraining grid
    (t = arange(grid)/grid * native_grid) — same params, finite output."""
    trunk = Eva(model_name="eva02_test_patch8_32")
    params = trunk.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)))["params"]
    big = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    pooled, tokens = trunk.apply({"params": params}, big)
    assert pooled.shape == (2, W)
    assert tokens.shape == (2, 1 + (48 // PATCH) ** 2, W)
    assert np.isfinite(np.asarray(pooled)).all()
    # rope rescaling: grid 6 reuses the native-grid-4 frequency range
    cos6, _ = rope_2d_tables(6, 4, HD)
    cos4, _ = rope_2d_tables(4, 4, HD)
    # first row (t=0) identical; max coordinate approaches but does not
    # exceed the pretraining range
    np.testing.assert_allclose(cos6[0], cos4[0], atol=1e-7)
    assert cos6.shape == (36, HD)


def test_real_geometries_registered():
    # the released EVA02-CLIP towers the reference can load via timm
    for name in ("eva02_base_patch16_clip_224",
                 "eva02_large_patch14_clip_224",
                 "eva02_large_patch14_clip_336"):
        assert name in EVA_CONFIGS


def test_antialias_pos_embed_matrix_matches_torch():
    """_torch_bicubic_aa_matrix reproduces F.interpolate(mode='bicubic',
    antialias=True) elementwise, up- AND down-scaling — the kernel timm's
    EVA checkpoint filter uses for abs-pos-embed resampling."""
    import torch
    import torch.nn.functional as F

    from cosmos_tpu.models.vit import _torch_bicubic_aa_matrix

    rs = np.random.RandomState(0)
    for src, dst in [(14, 7), (14, 24), (16, 14), (7, 14)]:
        x = rs.randn(1, 2, src, src)
        ref = F.interpolate(
            torch.tensor(x), size=(dst, dst), mode="bicubic",
            align_corners=False, antialias=True,
        ).numpy()
        m = _torch_bicubic_aa_matrix(src, dst)
        mine = np.einsum("ah,nchw,bw->ncab", m, x, m)
        np.testing.assert_allclose(mine, ref, atol=1e-12)
