"""Native FastViT (MCi) vision trunk: MobileCLIP's image towers, no timm.

Parity target: the reference's MobileCLIP converter
(/root/reference/src/open_clip/convert.py:142-190) maps Apple MobileCLIP
S1/S2 checkpoints onto a timm ``fastvit_mci1``/``fastvit_mci2`` trunk.
This module implements that trunk natively in Flax — in the
**reparameterized (deploy) form**: the train-time multi-branch
MobileOne / RepMixer / large-kernel blocks are exactly equivalent, at
inference, to single fused convolutions (conv+BN fusion, branch
summation, identity-as-dirac-kernel — the MobileOne/FastViT
reparameterization), and the converter performs that fusion while
loading, so the compiled TPU graph carries one conv per block instead
of three branches plus BatchNorm.

Architecture (Apple ml-fastvit / ml-mobileclip `fastvit.py` semantics):
  - convolutional stem: 3 MobileOne blocks (3x3/s2, depthwise 3x3/s2,
    1x1), GELU;
  - 4 stages of blocks: stages 0-2 use RepMixer token mixing
    (x + ls*(mixer(x) - norm(x)) -> one fused depthwise 3x3) + ConvFFN
    (depthwise 7x7 + BN, then 1x1 -> GELU -> 1x1, layer-scaled);
    stage 3 uses BN-normed multi-head self-attention over the flattened
    16x16 grid + the same ConvFFN;
  - between stages: PatchEmbed downsampling = reparam large-kernel
    depthwise 7x7/s2 (7x7 + 3x3 branches fused) followed by a MobileOne
    1x1; GELU after both for the MCi variants (``lkc_use_act``);
  - stage 3 is preceded by RepCPE conditional position encoding
    (depthwise 7x7 conv + identity, fused to one conv);
  - final ``conv_exp``: grouped 3x3 expanding C -> 2C with an SE block,
    then global average pooling.

The head projection (pooled [B, 2C] -> embed) lives in the TimmModel
adapter (timm_model.py), matching the reference's trunk/head split.

TPU notes: everything is NHWC; depthwise convs are cheap VPU ops XLA
fuses with neighbours; the 1x1 ConvFFN convs ARE matmuls on the MXU;
the deploy-form graph is branch-free and static.  Fine-tuning the
fused form is the standard MobileOne deployment practice (the function
space of the fused conv contains the branch ensemble's); from-scratch
training of the deploy form trains plain convs (this framework makes
no from-scratch MCi training-recipe parity claim — the reference
cannot construct an MCi model at all: its model_configs/ ships only
ViT-B-16/32, so its MobileCLIP converter is unreachable there).

Checkpoints load via ``convert_mobileclip_image`` (Apple
``image_encoder.model.*`` train-form layout -> fused deploy params);
``models/convert.py`` dispatches full MobileCLIP checkpoints (image +
text + logit_scale).  Validation against real Apple checkpoints needs
network access — RUNBOOK.md step; the torch-oracle test
(tests/test_fastvit.py) hand-builds the train-form architecture and
asserts fused-vs-branched forward equality.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import convert_util as _cu
from .layers import gelu

Dtype = Any

# timm/Apple model name -> MCi geometry (apple/ml-mobileclip mci.py).
FASTVIT_CONFIGS: Dict[str, Dict[str, Any]] = {
    "fastvit_mci0": dict(layers=(2, 6, 10, 2), dims=(64, 128, 256, 512),
                         mlp_ratios=(3, 3, 3, 3)),
    "fastvit_mci1": dict(layers=(4, 12, 20, 4), dims=(64, 128, 256, 512),
                         mlp_ratios=(3, 3, 3, 3)),
    "fastvit_mci2": dict(layers=(4, 12, 24, 4), dims=(80, 160, 320, 640),
                         mlp_ratios=(3, 3, 3, 3)),
}

# geometry constants shared by the MCi family
_TOKEN_MIXERS = ("repmixer", "repmixer", "repmixer", "attention")
_POS_EMBS = (False, False, False, True)   # RepCPE before stage 3 only
_CLS_RATIO = 2.0                          # conv_exp: C -> 2C
_ATTN_HEAD_DIM = 32
_DOWN_KERNEL, _DOWN_STRIDE = 7, 2


def register_fastvit(name: str, *, layers: Sequence[int],
                     dims: Sequence[int],
                     mlp_ratios: Sequence[int] = (3, 3, 3, 3)) -> None:
    """Register an additional MCi/FastViT geometry."""
    FASTVIT_CONFIGS[name] = dict(layers=tuple(layers), dims=tuple(dims),
                                 mlp_ratios=tuple(mlp_ratios))


def _conv(x, features, kernel, *, stride=1, groups=1, name, dtype):
    """torch-Conv2d-aligned conv: explicit symmetric padding k//2."""
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], feature_group_count=groups,
        dtype=dtype, name=name,
    )(x)


class SqueezeExcite(nn.Module):
    """SE block (apple ml-fastvit mobileone.py SEBlock, rd_ratio=1/16)."""

    channels: int
    rd_ratio: float = 1.0 / 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rd = max(1, int(self.channels * self.rd_ratio))
        w = jnp.mean(x, axis=(1, 2))                      # [B, C]
        w = nn.Dense(rd, dtype=self.dtype, name="reduce")(w)
        w = jax.nn.relu(w)
        w = nn.Dense(self.channels, dtype=self.dtype, name="expand")(w)
        w = jax.nn.sigmoid(w)
        return x * w[:, None, None, :]


class MHSA(nn.Module):
    """Stage-3 token mixer: plain MHSA over the flattened grid
    (ml-fastvit fastvit.py MHSA: head_dim 32, bias-free qkv)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        heads = C // _ATTN_HEAD_DIM
        t = x.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                       name="qkv")(t)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3, heads,
                                        _ATTN_HEAD_DIM), 3, axis=2)
        q = q.squeeze(2).transpose(0, 2, 1, 3)            # [B, h, N, d]
        k = k.squeeze(2).transpose(0, 2, 1, 3)
        v = v.squeeze(2).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (_ATTN_HEAD_DIM ** -0.5)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        # train-form layer_scale_1 is folded into this projection
        o = nn.Dense(C, dtype=self.dtype, name="proj")(o)
        return o.reshape(B, H, W, C)


class ConvFFN(nn.Module):
    """depthwise 7x7 (+fused BN) -> 1x1 -> GELU -> 1x1.

    The block-level layer scale is folded into fc2 by the converter.
    """

    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _conv(x, self.dim, 7, groups=self.dim, name="conv",
                  dtype=self.dtype)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(h)
        h = gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class RepMixerBlock(nn.Module):
    """Deploy-form RepMixer block: one fused depthwise 3x3 (which
    already contains the residual identity + layer scale), then the
    layer-scaled ConvFFN residual."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _conv(x, self.dim, 3, groups=self.dim, name="mixer",
                  dtype=self.dtype)
        return x + ConvFFN(self.dim, self.hidden, dtype=self.dtype,
                           name="convffn")(x)


class AttentionBlock(nn.Module):
    """Deploy-form attention block: inference BatchNorm collapses to a
    per-channel affine; layer scales are folded into proj / fc2."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("norm_scale", nn.initializers.ones,
                           (self.dim,), jnp.float32)
        bias = self.param("norm_bias", nn.initializers.zeros,
                          (self.dim,), jnp.float32)
        h = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        x = x + MHSA(self.dim, dtype=self.dtype, name="attn")(h)
        return x + ConvFFN(self.dim, self.hidden, dtype=self.dtype,
                           name="convffn")(x)


class FastVit(nn.Module):
    """MCi/FastViT trunk; returns ``(pooled [B, 2*dims[-1]], tokens)``.

    ``pooled`` matches the Apple trunk's conv_exp -> global-average-pool
    output (the input to MobileCLIP's image projection); ``tokens`` are
    the flattened final feature map (dense/segmentation use).
    """

    model_name: str
    dtype: Dtype = jnp.float32
    remat: bool = False                 # --grad-checkpointing
    remat_policy: str = ""              # named jax.checkpoint policy

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        g = FASTVIT_CONFIGS[self.model_name]
        layers, dims, ratios = g["layers"], g["dims"], g["mlp_ratios"]
        x = x.astype(self.dtype)
        # convolutional stem (3 fused MobileOne blocks, GELU after each)
        x = gelu(_conv(x, dims[0], 3, stride=2, name="stem_0",
                       dtype=self.dtype))
        x = gelu(_conv(x, dims[0], 3, stride=2, groups=dims[0],
                       name="stem_1", dtype=self.dtype))
        x = gelu(_conv(x, dims[0], 1, name="stem_2", dtype=self.dtype))
        for s, (depth, dim, ratio) in enumerate(zip(layers, dims, ratios)):
            if s > 0:
                # PatchEmbed: fused large-kernel depthwise 7x7/s2 then a
                # fused MobileOne 1x1; MCi uses lkc_use_act=True -> GELU
                # after the large-kernel conv too
                x = gelu(_conv(x, dim, _DOWN_KERNEL, stride=_DOWN_STRIDE,
                               groups=dims[s - 1], name=f"down_lkb_{s}",
                               dtype=self.dtype))
                x = gelu(_conv(x, dim, 1, name=f"down_pw_{s}",
                               dtype=self.dtype))
            if _POS_EMBS[s]:
                # RepCPE: depthwise 7x7 with the +x identity folded in
                x = _conv(x, dim, 7, groups=dim, name=f"pos_emb_{s}",
                          dtype=self.dtype)
            block = (RepMixerBlock if _TOKEN_MIXERS[s] == "repmixer"
                     else AttentionBlock)
            if self.remat:
                # per-block activation checkpointing (timm's
                # set_grad_checkpointing analog)
                policy = (
                    getattr(jax.checkpoint_policies, self.remat_policy)
                    if self.remat_policy else None
                )
                block = nn.remat(block, prevent_cse=False, policy=policy)
            for b in range(depth):
                x = block(dim, dim * ratio, dtype=self.dtype,
                          name=f"net_{s}_blocks_{b}")(x)
        final = int(dims[-1] * _CLS_RATIO)
        x = _conv(x, final, 3, groups=dims[-1], name="conv_exp",
                  dtype=self.dtype)
        x = SqueezeExcite(final, dtype=self.dtype, name="conv_exp_se")(x)
        x = gelu(x)
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        return jnp.mean(tokens, axis=1), tokens


# --- Apple MobileCLIP checkpoint conversion (with reparameterization) ----


def _np(sd, k):
    return _cu.np_(sd[k])     # shared coercion: convert_util.np_


def _fuse_conv_bn(sd, prefix: str, eps: float = 1e-5, norm: str = "bn"):
    """conv(bias-free)+BN branch -> (kernel OIHW, bias).  ``norm`` names
    the BN child ('bn' in ml-fastvit's conv_bn, 'norm' in CVNets
    ConvLayer — the MobileCLIP-B stem, timm_model.convert_mobileclip_vit)."""
    w = _np(sd, f"{prefix}.conv.weight")
    g_ = _np(sd, f"{prefix}.{norm}.weight")
    b = _np(sd, f"{prefix}.{norm}.bias")
    mean = _np(sd, f"{prefix}.{norm}.running_mean")
    var = _np(sd, f"{prefix}.{norm}.running_var")
    t = g_ / np.sqrt(var + eps)
    return w * t[:, None, None, None], b - mean * t


def _dirac(channels: int, groups: int, k: int) -> np.ndarray:
    """Identity mapping as an OIHW conv kernel (RepVGG-style)."""
    in_per_group = channels // groups
    w = np.zeros((channels, in_per_group, k, k), np.float32)
    for i in range(channels):
        w[i, i % in_per_group, k // 2, k // 2] = 1.0
    return w


def _fuse_bn_identity(sd, prefix: str, channels: int, groups: int, k: int,
                      eps: float = 1e-5):
    """BatchNorm-only skip branch -> equivalent (kernel, bias)."""
    g_ = _np(sd, f"{prefix}.weight")
    b = _np(sd, f"{prefix}.bias")
    mean = _np(sd, f"{prefix}.running_mean")
    var = _np(sd, f"{prefix}.running_var")
    t = g_ / np.sqrt(var + eps)
    return _dirac(channels, groups, k) * t[:, None, None, None], b - mean * t


def _pad_to(w: np.ndarray, k: int) -> np.ndarray:
    """Pad a smaller (e.g. 1x1 scale / 3x3 small) kernel to k x k, centered."""
    ks = w.shape[-1]
    p = (k - ks) // 2
    if p == 0:
        return w
    return np.pad(w, ((0, 0), (0, 0), (p, p), (p, p)))


def _fuse_mobileone(sd, prefix: str, in_ch: int, out_ch: int, groups: int,
                    k: int, stride: int):
    """Train-form MobileOneBlock branches -> single (kernel OIHW, bias).

    Branches (ml-fastvit mobileone.py MobileOneBlock): ``rbr_conv.{j}``
    kxk conv+BN list, ``rbr_scale`` 1x1 conv+BN (k>1 only), ``rbr_skip``
    BatchNorm identity (in==out and stride==1 only).
    """
    w = np.zeros((out_ch, in_ch // groups, k, k), np.float32)
    b = np.zeros((out_ch,), np.float32)
    j = 0
    while f"{prefix}.rbr_conv.{j}.conv.weight" in sd:
        wj, bj = _fuse_conv_bn(sd, f"{prefix}.rbr_conv.{j}")
        w, b = w + wj, b + bj
        j += 1
    if f"{prefix}.rbr_scale.conv.weight" in sd:
        ws, bs = _fuse_conv_bn(sd, f"{prefix}.rbr_scale")
        w, b = w + _pad_to(ws, k), b + bs
    if f"{prefix}.rbr_skip.weight" in sd:
        wi, bi = _fuse_bn_identity(sd, f"{prefix}.rbr_skip", out_ch,
                                   groups, k)
        w, b = w + wi, b + bi
    return w, b


def _fuse_replk(sd, prefix: str, k: int):
    """ReparamLargeKernelConv: kxk + small(3x3) conv+BN branches."""
    w, b = _fuse_conv_bn(sd, f"{prefix}.lkb_origin")
    if f"{prefix}.small_conv.conv.weight" in sd:
        ws, bs = _fuse_conv_bn(sd, f"{prefix}.small_conv")
        w, b = w + _pad_to(ws, k), b + bs
    return w, b


def _hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv_tree(w, b) -> Dict[str, np.ndarray]:
    return {"kernel": _hwio(w), "bias": np.asarray(b)}


def _ls(sd, key) -> np.ndarray:
    return _np(sd, key).reshape(-1)           # [C,1,1] -> [C]


def _dense_t(sd, key) -> np.ndarray:
    return _cu.t_(sd[key])    # shared transpose: convert_util.t_


def infer_fastvit_name(sd: Dict[str, Any], prefix: str = "") -> str:
    """Match an Apple MCi state dict to a registered geometry."""
    dim0 = int(_np(sd, f"{prefix}patch_embed.0.rbr_conv.0.conv.weight").shape[0])
    # stage depths: network entries that are block-Sequentials hold
    # numbered blocks with token_mixer/convffn params
    depths = []
    for idx in range(16):
        head = f"{prefix}network.{idx}."
        bs = {int(k[len(head):].split(".")[0]) for k in sd
              if k.startswith(head) and ".convffn." in k}
        if bs:
            depths.append(1 + max(bs))
    depths = tuple(depths)
    for name, g in FASTVIT_CONFIGS.items():
        if g["dims"][0] == dim0 and g["layers"] == depths:
            return name
    raise KeyError(
        f"no registered FastViT/MCi geometry matches dims[0]={dim0} "
        f"stage depths={depths}; add one via register_fastvit"
    )


def convert_mobileclip_image(sd: Dict[str, Any], model_name: str,
                             prefix: str = "") -> Dict[str, Any]:
    """Apple MobileCLIP image-trunk state dict (train form, keys under
    ``image_encoder.model.`` stripped to ``prefix``) -> fused FastVit
    deploy param subtree.

    Reference analog: convert.py:145-152 routes the same keys through
    timm's fastvit checkpoint_filter_fn; here the branch fusion happens
    at load time instead (the deploy trunk carries no branches).
    """
    g = FASTVIT_CONFIGS[model_name]
    layers, dims, ratios = g["layers"], g["dims"], g["mlp_ratios"]
    d0 = dims[0]
    trunk: Dict[str, Any] = {
        "stem_0": _conv_tree(*_fuse_mobileone(
            sd, f"{prefix}patch_embed.0", 3, d0, 1, 3, 2)),
        "stem_1": _conv_tree(*_fuse_mobileone(
            sd, f"{prefix}patch_embed.1", d0, d0, d0, 3, 2)),
        "stem_2": _conv_tree(*_fuse_mobileone(
            sd, f"{prefix}patch_embed.2", d0, d0, 1, 1, 1)),
    }
    # network index layout (ml-fastvit FastViT.__init__): per stage —
    # optional RepCPE, then the block Sequential, then PatchEmbed
    # (except after the last stage)
    idx = 0
    for s, (depth, dim, ratio) in enumerate(zip(layers, dims, ratios)):
        if _POS_EMBS[s]:
            w = _np(sd, f"{prefix}network.{idx}.pe.weight")
            b = _np(sd, f"{prefix}network.{idx}.pe.bias")
            trunk[f"pos_emb_{s}"] = _conv_tree(w + _dirac(dim, dim, 7), b)
            idx += 1
        for blk in range(depth):
            p = f"{prefix}network.{idx}.{blk}"
            hidden = dim * ratio
            if _TOKEN_MIXERS[s] == "repmixer":
                # fused RepMixer: I + ls * (mixer - norm)
                wm, bm = _fuse_mobileone(sd, f"{p}.token_mixer.mixer",
                                         dim, dim, dim, 3, 1)
                wn, bn_ = _fuse_mobileone(sd, f"{p}.token_mixer.norm",
                                          dim, dim, dim, 3, 1)
                ls = _ls(sd, f"{p}.token_mixer.layer_scale")
                w = _dirac(dim, dim, 3) + ls[:, None, None, None] * (wm - wn)
                b = ls * (bm - bn_)
                blk_tree = {"mixer": _conv_tree(w, b)}
                ffn_ls = _ls(sd, f"{p}.layer_scale")
            else:
                # inference BatchNorm -> per-channel affine
                gm = _np(sd, f"{p}.norm.weight")
                bt = _np(sd, f"{p}.norm.bias")
                mean = _np(sd, f"{p}.norm.running_mean")
                var = _np(sd, f"{p}.norm.running_var")
                t = gm / np.sqrt(var + 1e-5)
                ls1 = _ls(sd, f"{p}.layer_scale_1")
                pw = _np(sd, f"{p}.token_mixer.proj.weight")  # [C, C]
                pb = _np(sd, f"{p}.token_mixer.proj.bias")
                blk_tree = {
                    "norm_scale": t,
                    "norm_bias": bt - mean * t,
                    "attn": {
                        "qkv": {"kernel": _dense_t(
                            sd, f"{p}.token_mixer.qkv.weight")},
                        # layer_scale_1 folds into the out projection
                        "proj": {
                            "kernel": np.ascontiguousarray(
                                (pw * ls1[:, None]).T),
                            "bias": pb * ls1,
                        },
                    },
                }
                ffn_ls = _ls(sd, f"{p}.layer_scale_2")
            wc, bc = _fuse_conv_bn(sd, f"{p}.convffn.conv")
            f2w = _np(sd, f"{p}.convffn.fc2.weight").reshape(dim, hidden)
            f2b = _np(sd, f"{p}.convffn.fc2.bias")
            blk_tree["convffn"] = {
                "conv": _conv_tree(wc, bc),
                "fc1": {"kernel": _dense_t(
                    sd, f"{p}.convffn.fc1.weight").reshape(dim, hidden),
                    "bias": _np(sd, f"{p}.convffn.fc1.bias")},
                # the ConvFFN layer scale folds into fc2
                "fc2": {"kernel": np.ascontiguousarray(
                    (f2w * ffn_ls[:, None]).T),
                    "bias": f2b * ffn_ls},
            }
            trunk[f"net_{s}_blocks_{blk}"] = blk_tree
        idx += 1
        if s < len(layers) - 1:
            p = f"{prefix}network.{idx}"
            trunk[f"down_lkb_{s + 1}"] = _conv_tree(
                *_fuse_replk(sd, f"{p}.proj.0", _DOWN_KERNEL))
            trunk[f"down_pw_{s + 1}"] = _conv_tree(*_fuse_mobileone(
                sd, f"{p}.proj.1", dims[s + 1], dims[s + 1], 1, 1, 1))
            idx += 1
    final = int(dims[-1] * _CLS_RATIO)
    trunk["conv_exp"] = _conv_tree(*_fuse_mobileone(
        sd, f"{prefix}conv_exp", dims[-1], final, dims[-1], 3, 1))
    trunk["conv_exp_se"] = {
        "reduce": {
            "kernel": _dense_t(sd, f"{prefix}conv_exp.se.reduce.weight"
                               ).reshape(final, -1),
            "bias": _np(sd, f"{prefix}conv_exp.se.reduce.bias")},
        "expand": {
            "kernel": _dense_t(sd, f"{prefix}conv_exp.se.expand.weight"
                               ).reshape(-1, final),
            "bias": _np(sd, f"{prefix}conv_exp.se.expand.bias")},
    }
    return jax.tree.map(jnp.asarray, trunk)
