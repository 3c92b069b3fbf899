"""ConvNeXt trunk: torch-oracle parity, converter dispatch, CLIP wiring.

The oracle hand-builds a timm-layout ConvNeXt in plain torch (stem
conv4x4/s4 + LN, stages of dwconv7x7 -> LN -> 4x MLP -> gamma blocks with
LN + conv2x2/s2 downsampling, global avg pool + head norm — the
architecture timm's convnext.py produces for conv_mlp=False), exports its
state dict in timm key layout, converts via convert_timm_convnext, and
checks the flax trunk forward matches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from cosmos_tpu.models.convnext import (
    ConvNeXt,
    convert_timm_convnext,
    infer_timm_convnext_name,
    register_convnext,
)
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.models.timm_model import TimmModel

DEPTHS, DIMS, IMG = (1, 1, 2, 1), (8, 16, 32, 64), 64

register_convnext("convnext_test", depths=DEPTHS, dims=DIMS)


class TorchBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):                     # NCHW
        h = self.conv_dw(x).permute(0, 2, 3, 1)   # -> NHWC
        h = self.norm(h)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        h = (h * self.gamma).permute(0, 3, 1, 2)
        return x + h


class TorchConvNeXt(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Conv2d(3, DIMS[0], 4, stride=4)
        self.stem_norm = nn.LayerNorm(DIMS[0], eps=1e-6)
        self.down_norms = nn.ModuleList()
        self.down_convs = nn.ModuleList()
        self.stages = nn.ModuleList()
        for s, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
            if s > 0:
                self.down_norms.append(nn.LayerNorm(DIMS[s - 1], eps=1e-6))
                self.down_convs.append(nn.Conv2d(DIMS[s - 1], dim, 2, stride=2))
            self.stages.append(
                nn.ModuleList([TorchBlock(dim) for _ in range(depth)]))
        self.head_norm = nn.LayerNorm(DIMS[-1], eps=1e-6)

    @staticmethod
    def _ln_nchw(ln, x):
        return ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    def forward(self, x):                     # NCHW in
        x = self._ln_nchw(self.stem_norm, self.stem(x))
        for s, blocks in enumerate(self.stages):
            if s > 0:
                x = self.down_convs[s - 1](
                    self._ln_nchw(self.down_norms[s - 1], x))
            for blk in blocks:
                x = blk(x)
        tokens = x.flatten(2).transpose(1, 2)          # [B, N, C]
        pooled = self.head_norm(tokens.mean(dim=1))
        return pooled, self.head_norm(tokens)


def timm_state_dict(m: TorchConvNeXt):
    sd = {
        "stem.0.weight": m.stem.weight.detach().numpy(),
        "stem.0.bias": m.stem.bias.detach().numpy(),
        "stem.1.weight": m.stem_norm.weight.detach().numpy(),
        "stem.1.bias": m.stem_norm.bias.detach().numpy(),
        "head.norm.weight": m.head_norm.weight.detach().numpy(),
        "head.norm.bias": m.head_norm.bias.detach().numpy(),
    }
    for s, blocks in enumerate(m.stages):
        if s > 0:
            dn, dc = m.down_norms[s - 1], m.down_convs[s - 1]
            sd[f"stages.{s}.downsample.0.weight"] = dn.weight.detach().numpy()
            sd[f"stages.{s}.downsample.0.bias"] = dn.bias.detach().numpy()
            sd[f"stages.{s}.downsample.1.weight"] = dc.weight.detach().numpy()
            sd[f"stages.{s}.downsample.1.bias"] = dc.bias.detach().numpy()
        for b, blk in enumerate(blocks):
            p = f"stages.{s}.blocks.{b}"
            sd.update({
                f"{p}.conv_dw.weight": blk.conv_dw.weight.detach().numpy(),
                f"{p}.conv_dw.bias": blk.conv_dw.bias.detach().numpy(),
                f"{p}.norm.weight": blk.norm.weight.detach().numpy(),
                f"{p}.norm.bias": blk.norm.bias.detach().numpy(),
                f"{p}.mlp.fc1.weight": blk.fc1.weight.detach().numpy(),
                f"{p}.mlp.fc1.bias": blk.fc1.bias.detach().numpy(),
                f"{p}.mlp.fc2.weight": blk.fc2.weight.detach().numpy(),
                f"{p}.mlp.fc2.bias": blk.fc2.bias.detach().numpy(),
                f"{p}.gamma": blk.gamma.detach().numpy(),
            })
    return sd


def test_convert_timm_convnext_forward_parity():
    torch.manual_seed(0)
    oracle = TorchConvNeXt().eval()
    sd = timm_state_dict(oracle)
    assert infer_timm_convnext_name(sd) == "convnext_test"

    trunk = ConvNeXt(model_name="convnext_test")
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, IMG, IMG, 3)).astype(np.float32)
    params = convert_timm_convnext(sd, "convnext_test")
    pooled, tokens = trunk.apply({"params": params}, jnp.asarray(imgs))

    with torch.no_grad():
        ref_pooled, ref_tokens = oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pooled), ref_pooled.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), atol=3e-5, rtol=1e-4)


def test_convnext_clip_dispatch_and_convert():
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="convnext_test",
        vision_timm_pool="avg",
        vision_timm_proj="linear",
        vision_image_size=IMG,
    )
    imgs = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    texts = jnp.zeros((2, 16), jnp.int32)
    out = model.apply({"params": params}, imgs, texts)
    assert out["image_features"].shape == out["text_features"].shape
    assert np.isfinite(np.asarray(out["image_features"])).all()

    # bare timm ConvNeXt checkpoint fills the trunk via format dispatch
    from cosmos_tpu.models.convert import convert_state_dict, detect_format

    torch.manual_seed(1)
    sd = timm_state_dict(TorchConvNeXt())
    assert detect_format(sd) == "timm_convnext"
    params2 = convert_state_dict(model, params, sd)
    leaves_a = jax.tree.leaves(params["visual"]["trunk"])
    leaves_b = jax.tree.leaves(params2["visual"]["trunk"])
    assert len(leaves_a) == len(leaves_b)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_a, leaves_b)
    )


def test_convnext_drop_path_rng_gated():
    trunk = ConvNeXt(model_name="convnext_test", drop_path_rate=0.5)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, IMG, IMG, 3)), jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), imgs)["params"]
    # no drop_path rng -> deterministic eval path (identical calls)
    p1, _ = trunk.apply({"params": params}, imgs)
    p2, _ = trunk.apply({"params": params}, imgs)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # with the rng collection, stochastic depth kicks in
    p3, _ = trunk.apply(
        {"params": params}, imgs,
        rngs={"drop_path": jax.random.PRNGKey(7)},
    )
    assert not np.allclose(np.asarray(p1), np.asarray(p3))


def test_convnext_token_pool_raises():
    tower = TimmModel(model_name="convnext_test", embed_dim=32, pool="token")
    with pytest.raises(ValueError, match="no CLS token"):
        tower.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))


def test_convnext_tower_trains():
    """A ConvNeXt-trunk CLIP runs the full jitted train step (fwd, bwd,
    AdamW, EMA) — the reference trains timm towers through the same
    generic loop (timm_model.py + train.py)."""
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
        vision_timm_model_name="convnext_test",
        vision_timm_pool="avg",
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
    assert np.isfinite(float(metrics["grad_norm"]))


def test_convnext_remat_matches_unrematted():
    """--grad-checkpointing on a ConvNeXt trunk (round 5): rematted
    forward AND gradients equal the plain trunk's — remat changes
    memory, not math (timm set_grad_checkpointing analog)."""
    import jax
    import jax.numpy as jnp

    from cosmos_tpu.models.convnext import ConvNeXt

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    plain = ConvNeXt(model_name="convnext_test")
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    remat = ConvNeXt(model_name="convnext_test", remat=True)

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
