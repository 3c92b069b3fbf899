"""ModifiedResNet (OpenAI RN tower) parity vs an independently assembled
torch oracle built from stock primitives (Conv2d/BatchNorm2d/functional
MHA — no reference code), plus the OpenAI-RN checkpoint load path.

Parity targets: /root/reference/src/open_clip/modified_resnet.py (3-conv
stem, avgpool-antialiased bottlenecks, AttentionPool2d) and
openai.py:24-90 / model.py:575-610 (RN shape probing + load).
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---- torch oracle (stock primitives, independent composition) ----------

class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride) if stride > 1 else nn.Identity()),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class TorchAttnPool(nn.Module):
    def __init__(self, spacial, dim, heads, out_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial * spacial + 1, dim) / dim ** 0.5
        )
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.c_proj = nn.Linear(dim, out_dim)
        self.heads = heads

    def forward(self, x):
        x = x.flatten(2).permute(2, 0, 1)                     # (HW) N C
        x = torch.cat([x.mean(0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
        return out[0]


class TorchRN(nn.Module):
    def __init__(self, layers=(1, 1, 1, 1), width=16, image=64, out_dim=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        inplanes, planes = width, width
        for s, n in enumerate(layers):
            blocks = []
            for b in range(n):
                stride = (2 if s else 1) if b == 0 else 1
                blocks.append(TorchBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
            planes *= 2
        heads = width * 32 // 64
        self.attnpool = TorchAttnPool(image // 32, inplanes, heads, out_dim)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for s in (1, 2, 3, 4):
            x = getattr(self, f"layer{s}")(x)
        return self.attnpool(x)


def _randomize_bn_stats(module, gen):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.1
            )
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=gen) * 0.5 + 0.75
            )


@pytest.fixture(scope="module")
def rn_pair():
    from cosmos_tpu.models.factory import create_model

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    oracle = TorchRN()
    with torch.no_grad():
        _randomize_bn_stats(oracle, gen)
    oracle.eval()

    model, params = create_model(
        "ViT-B-16",
        embed_dim=32,
        vision_image_size=64,
        vision_width=16,
        vision_layers=(1, 1, 1, 1),
        text_context_length=12,
        text_vocab_size=128,
        text_width=32,
        text_heads=2,
        text_layers=2,
    )
    sd = {f"visual.{k}": v for k, v in oracle.state_dict().items()}
    from cosmos_tpu.models.checkpoint import torch_state_dict_to_params

    params = torch_state_dict_to_params(sd, params)
    return oracle, model, params


def test_rn_vision_tower_matches_torch_oracle(rn_pair):
    oracle, model, params = rn_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = model.apply(
        {"params": params}, jnp.asarray(x), method=model.encode_image
    )["image_features"]
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_frozen_bn_matches_torch_eval_bn():
    from cosmos_tpu.models.modified_resnet import FrozenBatchNorm

    torch.manual_seed(2)
    bn = nn.BatchNorm2d(8)
    with torch.no_grad():
        bn.weight.copy_(torch.randn(8))
        bn.bias.copy_(torch.randn(8))
        bn.running_mean.copy_(torch.randn(8) * 0.2)
        bn.running_var.copy_(torch.rand(8) + 0.5)
    bn.eval()
    x = torch.randn(2, 8, 4, 4)
    with torch.no_grad():
        ref = bn(x).permute(0, 2, 3, 1).numpy()

    fbn = FrozenBatchNorm()
    params = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }
    got = fbn.apply(
        {"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_openai_rn_config_inference(rn_pair):
    """RN state dict -> config probing (model.py:583-592 semantics)."""
    oracle, _, _ = rn_pair
    from cosmos_tpu.models.openai import config_from_openai_state_dict

    sd = {f"visual.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    # minimal text keys for the probe
    sd["text_projection"] = np.zeros((32, 32), np.float32)
    sd["positional_embedding"] = np.zeros((12, 32), np.float32)
    sd["token_embedding.weight"] = np.zeros((128, 32), np.float32)
    sd["ln_final.weight"] = np.zeros((32,), np.float32)
    cfg = config_from_openai_state_dict(sd)
    assert cfg["vision_cfg"]["layers"] == (1, 1, 1, 1)
    assert cfg["vision_cfg"]["width"] == 16
    assert cfg["vision_cfg"]["image_size"] == 64
    assert cfg["embed_dim"] == 32
