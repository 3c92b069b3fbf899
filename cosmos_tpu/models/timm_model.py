"""timm-ViT vision tower: native trunk + pool/proj head, no timm dependency.

Parity target: /root/reference/src/open_clip/timm_model.py:28-152 — a timm
trunk plus 'avg'/'token' pooling and a 'linear'/'mlp' projection head,
selected through CLIPVisionCfg timm_* fields (reference model.py:53-62,
dispatch :132-141).

TPU-native design: timm's plain ViTs are architecturally the same
pre-norm transformer this package already implements, so instead of
porting timm, the trunk IS cosmos_tpu.models.vit.VisionTransformer built
in timm-ViT configuration (CLS token, biased patch embed, no pre-LN,
final norm over all tokens before pooling, no CLIP projection).  timm
checkpoints load through ``convert_timm_vit`` (a pure key/layout mapping:
OIHW patch conv -> HWIO unfold-matmul kernel, [3W, W] packed qkv ->
transposed [W, 3W] in_proj, blocks.N.* -> resblocks_N.*).

Non-ViT trunks: the ConvNeXt family is implemented natively in
models/convnext.py (the one non-ViT architecture the OpenCLIP config
family actually ships — convnext_base_w/large_d/xxlarge), the EVA02
family (rope + SwiGLU + sub-LN ViTs) in models/eva.py, and the
FastViT/MCi family (MobileCLIP's image towers, deploy/reparameterized
form) in models/fastvit.py; all dispatch through this adapter by name.
``TIMM_VIT_CONFIGS``/``CONVNEXT_CONFIGS``/``EVA_CONFIGS``/
``FASTVIT_CONFIGS`` list coverage and ``register_timm_vit``/
``register_convnext``/``register_eva``/``register_fastvit`` extend it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import gelu

Dtype = Any

# timm model name -> trunk geometry (timm vision_transformer.py defaults)
TIMM_VIT_CONFIGS: Dict[str, Dict[str, int]] = {
    "vit_small_patch16_224": dict(patch_size=16, width=384, layers=12, heads=6),
    "vit_small_patch32_224": dict(patch_size=32, width=384, layers=12, heads=6),
    "vit_base_patch16_224": dict(patch_size=16, width=768, layers=12, heads=12),
    "vit_base_patch32_224": dict(patch_size=32, width=768, layers=12, heads=12),
    "vit_base_patch16_384": dict(patch_size=16, width=768, layers=12, heads=12,
                                 image_size=384),
    "vit_large_patch16_224": dict(patch_size=16, width=1024, layers=24, heads=16),
    "vit_large_patch14_224": dict(patch_size=14, width=1024, layers=24, heads=16),
    "vit_huge_patch14_224": dict(patch_size=14, width=1280, layers=32, heads=16),
    # MobileCLIP-B image tower: ViT-B/16 with the CVNets MCi conv stem
    # (3 chained kernel==stride convs, channels W/4 -> W/2 -> W) and a
    # patch-only pos-embed table added before the CLS token
    # (timm vision_transformer_hybrid vit_base_mci_224)
    "vit_base_mci_224": dict(
        patch_size=16, width=768, layers=12, heads=12,
        stem_channels=(192, 384, 768), stem_kernels=(4, 2, 2),
        no_embed_class=True,
    ),
}


def register_timm_vit(name: str, *, patch_size: int, width: int, layers: int,
                      heads: int, image_size: int = 224,
                      stem_channels=None, stem_kernels=(4, 2, 2),
                      no_embed_class: bool = False) -> None:
    """Register an additional plain- or MCi-stem-ViT timm geometry."""
    TIMM_VIT_CONFIGS[name] = dict(
        patch_size=patch_size, width=width, layers=layers, heads=heads,
        image_size=image_size, no_embed_class=no_embed_class,
    )
    if stem_channels is not None:
        TIMM_VIT_CONFIGS[name].update(
            stem_channels=tuple(stem_channels),
            stem_kernels=tuple(stem_kernels),
        )


class TimmModel(nn.Module):
    """timm-ViT trunk + pool/proj adapter head (vision-tower interface).

    Returns ``(pooled [B, embed_dim], tokens [B, N, width])`` like the
    other vision towers; CSA segmentation needs the CLIP ViT tower.
    """

    model_name: str
    embed_dim: int
    image_size: int = 224
    pool: str = "avg"           # 'avg' (patch-token mean) | 'token' (CLS)
    proj: str = "linear"        # 'linear' | 'mlp' | 'none'
    proj_bias: bool = False
    drop: float = 0.0           # head dropout: must be 0 (see setup)
    drop_path: float = 0.0      # stochastic depth (ConvNeXt trunks only)
    dtype: Dtype = jnp.float32
    use_flash: Optional[bool] = None
    remat: bool = False                 # --grad-checkpointing
    remat_policy: str = ""

    def setup(self):
        from .convnext import CONVNEXT_CONFIGS
        from .eva import EVA_CONFIGS
        from .fastvit import FASTVIT_CONFIGS

        if (self.model_name not in TIMM_VIT_CONFIGS
                and self.model_name not in CONVNEXT_CONFIGS
                and self.model_name not in EVA_CONFIGS
                and self.model_name not in FASTVIT_CONFIGS):
            raise NotImplementedError(
                f"timm trunk {self.model_name!r}: plain ViTs "
                f"({sorted(TIMM_VIT_CONFIGS)}), the ConvNeXt family "
                f"({sorted(CONVNEXT_CONFIGS)}), the EVA02 family "
                f"({sorted(EVA_CONFIGS)}) and the FastViT/MCi family "
                f"({sorted(FASTVIT_CONFIGS)}) are supported natively; "
                "register additional geometries via register_timm_vit / "
                "register_convnext / register_eva / register_fastvit, "
                "or use the native ViT/ModifiedResNet towers."
            )
        if self.pool not in ("avg", "token", ""):
            raise ValueError(f"timm_pool {self.pool!r}: use 'avg' or 'token'")
        if self.drop:
            raise NotImplementedError(
                "timm_drop (head dropout) is not wired into the flax head; "
                "pass timm_drop=0 (dropout-free heads match the released "
                "CLIP configs, which train with drop=0)"
            )
        if self.model_name in CONVNEXT_CONFIGS:
            if self.pool == "token":
                raise ValueError(
                    "timm_pool 'token': ConvNeXt has no CLS token — use "
                    "'avg' (the trunk's global-average-pool + head norm)")
            from .convnext import ConvNeXt

            self.trunk = ConvNeXt(
                model_name=self.model_name,
                drop_path_rate=self.drop_path,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                name="trunk",
            )
            self._build_head()
            return
        if self.model_name in FASTVIT_CONFIGS:
            if self.pool == "token":
                raise ValueError(
                    "timm_pool 'token': FastViT/MCi has no CLS token — "
                    "use 'avg' (conv_exp + global average pool)")
            if self.drop_path:
                raise NotImplementedError(
                    "timm_drop_path on a FastViT trunk is not wired; the "
                    "deploy-form trunk targets inference/fine-tune loads")
            from .fastvit import FastVit

            self.trunk = FastVit(
                model_name=self.model_name,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                name="trunk",
            )
            self._build_head()
            return
        if self.model_name in EVA_CONFIGS:
            if self.drop_path:
                raise NotImplementedError(
                    "timm_drop_path on an EVA02 trunk is not wired; the "
                    "released EVA02-CLIP towers fine-tune with drop_path=0"
                )
            from .eva import Eva

            self.trunk = Eva(
                model_name=self.model_name,
                image_size=self.image_size,
                pool="avg" if self.pool == "avg" else "token",
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                name="trunk",
            )
            self._build_head()
            return
        g = TIMM_VIT_CONFIGS[self.model_name]
        if self.drop_path:
            raise NotImplementedError(
                "timm_drop_path on a plain-ViT trunk is not wired; the "
                "released ViT CLIP recipes train with drop_path=0"
            )
        from .vit import VisionTransformer

        self.trunk = VisionTransformer(
            image_size=g.get("image_size", self.image_size),
            patch_size=g["patch_size"],
            width=g["width"],
            layers=g["layers"],
            num_heads=g["heads"],
            output_dim=g["width"],
            # timm-ViT configuration: biased patch embed, CLS token,
            # learned pos embed, NO pre-LN, final norm over all tokens
            # before pooling, no CLIP projection
            patch_bias=True,
            class_token=True,
            stem_channels=g.get("stem_channels"),
            stem_kernels=g.get("stem_kernels", (4, 2, 2)),
            no_embed_class=g.get("no_embed_class", False),
            no_ln_pre=True,
            no_proj=True,
            final_ln_after_pool=False,
            pool_type="avg" if self.pool == "avg" else "tok",
            act_fn=gelu,
            dtype=self.dtype,
            use_flash=self.use_flash,
            remat=self.remat,
            remat_policy=self.remat_policy,
            name="trunk",
        )
        self._build_head()

    def _build_head(self):
        if self.proj == "linear":
            self.head = nn.Dense(self.embed_dim, use_bias=self.proj_bias,
                                 dtype=self.dtype, name="head")
        elif self.proj == "mlp":
            # reference timm_model.py:84-86: Mlp(width, 2*embed_dim,
            # embed_dim) with bias on the output layer
            self.head_fc1 = nn.Dense(2 * self.embed_dim, use_bias=True,
                                     dtype=self.dtype, name="head_fc1")
            self.head_fc2 = nn.Dense(self.embed_dim, use_bias=self.proj_bias,
                                     dtype=self.dtype, name="head_fc2")
            self.head = None
        elif self.proj in ("none", ""):
            self.head = None
        else:
            raise ValueError(f"timm_proj {self.proj!r}")

    def __call__(self, images: jax.Array, csa: bool = False,
                 patch_drop_rng=None):
        if csa:
            raise NotImplementedError("CSA segmentation needs the CLIP ViT tower")
        pooled, tokens = self.trunk(images)
        if self.proj == "linear":
            pooled = self.head(pooled)
        elif self.proj == "mlp":
            pooled = self.head_fc2(gelu(self.head_fc1(pooled)))
        return pooled, tokens


# --- timm checkpoint conversion ------------------------------------------

from .convert_util import ln_, t_ as _t


def infer_timm_vit_name(sd: Dict[str, Any]) -> str:
    """Match a timm ViT state dict to a registered geometry by its shapes."""
    w = int(np.asarray(sd["cls_token"]).reshape(-1).shape[0])
    p = int(np.asarray(sd["patch_embed.proj.weight"]).shape[-1])
    layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    for name, g in TIMM_VIT_CONFIGS.items():
        if "stem_channels" in g:
            continue    # MCi-stem hybrids have no patch_embed.proj
        if g["width"] == w and g["patch_size"] == p and g["layers"] == layers:
            return name
    raise KeyError(
        f"no registered timm ViT geometry matches width={w} patch={p} "
        f"layers={layers}; add one via register_timm_vit"
    )


def convert_timm_vit(sd: Dict[str, Any], model_name: str) -> Dict[str, Any]:
    """timm ViT state dict -> TimmModel 'trunk' param subtree.

    Accepts numpy-convertible tensors (torch CPU tensors work).  Mapping:
      cls_token [1,1,W]            -> class_embedding [W]
      pos_embed [1,1+N,W]          -> positional_embedding [1+N,W]
      patch_embed.proj.weight OIHW -> conv1_kernel HWIO (p,p,3,W)
      blocks.i.attn.qkv.weight [3W,W] -> attn/in_proj_kernel [W,3W]
      blocks.i.{norm1,norm2,attn.proj,mlp.fc1,mlp.fc2} -> resblocks_i/*
      norm.*                       -> ln_post/*
    This returns the TRUNK subtree only; in1k classifier heads are
    dropped, while a shape-matching CLIP-projection head (timm
    vit_*_clip_* checkpoints) is loaded by the convert.py dispatch
    (``_maybe_load_timm_head``).
    """
    g = TIMM_VIT_CONFIGS[model_name]
    w = g["width"]
    trunk: Dict[str, Any] = {
        "class_embedding": np.asarray(sd["cls_token"]).reshape(w),
        "positional_embedding": np.asarray(sd["pos_embed"]).reshape(-1, w),
        "conv1_kernel": np.ascontiguousarray(
            np.asarray(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)
        ),
        "conv1_bias": np.asarray(sd["patch_embed.proj.bias"]),
        "ln_post": ln_(sd, "norm"),
    }
    blocks: Dict[str, Any] = {}
    for i in range(g["layers"]):
        p = f"blocks.{i}"
        blocks[f"resblocks_{i}"] = {
            "ln_1": ln_(sd, f"{p}.norm1"),
            "ln_2": ln_(sd, f"{p}.norm2"),
            "attn": {
                "in_proj_kernel": _t(sd[f"{p}.attn.qkv.weight"]),
                "in_proj_bias": np.asarray(sd[f"{p}.attn.qkv.bias"]),
                "out_proj": {
                    "kernel": _t(sd[f"{p}.attn.proj.weight"]),
                    "bias": np.asarray(sd[f"{p}.attn.proj.bias"]),
                },
            },
            "mlp": {
                "c_fc": {"kernel": _t(sd[f"{p}.mlp.fc1.weight"]),
                         "bias": np.asarray(sd[f"{p}.mlp.fc1.bias"])},
                "c_proj": {"kernel": _t(sd[f"{p}.mlp.fc2.weight"]),
                           "bias": np.asarray(sd[f"{p}.mlp.fc2.bias"])},
            },
        }
    trunk["transformer"] = blocks
    return jax.tree.map(jnp.asarray, trunk)


def infer_mci_vit_name(sd: Dict[str, Any], prefix: str = "") -> str:
    """Match an Apple hybrid-ViT (CVNets) state dict to a registered
    MCi-stem geometry by width and block count."""
    w = int(np.asarray(sd[f"{prefix}cls_token"]).reshape(-1).shape[0])
    head = f"{prefix}transformer."
    layers = 1 + max(
        int(k[len(head):].split(".")[0]) for k in sd
        if k.startswith(head) and ".pre_norm_mha." in k
    )
    for name, g in TIMM_VIT_CONFIGS.items():
        if "stem_channels" in g and g["width"] == w and g["layers"] == layers:
            return name
    raise KeyError(
        f"no registered MCi-stem ViT geometry matches width={w} "
        f"layers={layers}; add one via register_timm_vit(stem_channels=...)"
    )


def convert_mobileclip_vit(sd: Dict[str, Any], model_name: str,
                           prefix: str = "") -> Dict[str, Any]:
    """Apple MobileCLIP-B hybrid-ViT image trunk (CVNets ViT layout, train
    form with BN'd conv-stem ``patch_emb.{i}.block.{conv,norm}``) ->
    TimmModel 'trunk' subtree in deploy form (stem BN fused into the conv
    kernels at load time, like the FastViT reparameterization).

    Reference analog: convert.py:187-189 routes these keys through timm's
    vision_transformer_hybrid checkpoint_filter_fn into vit_base_mci_224;
    here the CVNets keys map directly onto the native trunk:
      patch_emb.i.block.conv(+norm)      -> stem{i}_kernel/bias (BN fused)
      cls_token [1,1,W]                  -> class_embedding [W]
      pos_embed.pos_embed.pos_embed      -> positional_embedding [N,W]
                                            (patch-only table, no_embed_class)
      transformer.i.pre_norm_mha.{0,1}   -> resblocks_i ln_1 / attn
      transformer.i.pre_norm_ffn.{0,1,4} -> resblocks_i ln_2 / mlp
      post_transformer_norm              -> ln_post
    The classifier/head projection is handled by convert.convert_mobileclip
    (it lives outside the trunk, as the TimmModel 'head').
    """
    from .fastvit import _fuse_conv_bn, _np

    g = TIMM_VIT_CONFIGS[model_name]
    w = g["width"]
    stem_ch = (3,) + tuple(g["stem_channels"])
    trunk: Dict[str, Any] = {}
    for i, _k in enumerate(g.get("stem_kernels", (4, 2, 2))):
        p = f"{prefix}patch_emb.{i}.block"
        if f"{p}.norm.weight" in sd:
            # bias-free conv + BatchNorm -> fused deploy conv (the same
            # fusion math as the FastViT branches, fastvit._fuse_conv_bn)
            wt, bias = _fuse_conv_bn(sd, p, norm="norm")
        else:
            wt = _np(sd, f"{p}.conv.weight")      # OIHW
            bias = _np(sd, f"{p}.conv.bias")
        if wt.shape[0] != stem_ch[i + 1] or wt.shape[1] != stem_ch[i]:
            raise ValueError(
                f"MobileCLIP-B stem conv {i}: expected "
                f"[{stem_ch[i + 1]},{stem_ch[i]},k,k], got {wt.shape} — "
                f"geometry mismatch with {model_name}")
        trunk[f"stem{i}_kernel"] = np.ascontiguousarray(
            wt.transpose(2, 3, 1, 0))
        trunk[f"stem{i}_bias"] = np.asarray(bias)
    trunk["class_embedding"] = _np(sd, f"{prefix}cls_token").reshape(w)
    pe = None
    for k in ("pos_embed.pos_embed.pos_embed", "pos_embed.pos_embed",
              "pos_embed"):
        if f"{prefix}{k}" in sd:
            pe = _np(sd, f"{prefix}{k}").reshape(-1, w)
            break
    if pe is None:
        raise KeyError(
            "MobileCLIP-B positional embedding not found "
            f"({prefix}pos_embed[.pos_embed[.pos_embed]])")
    grid = g.get("image_size", 224) // g["patch_size"]
    if pe.shape[0] != grid * grid:
        raise ValueError(
            f"MobileCLIP-B pos embed has {pe.shape[0]} rows; expected a "
            f"patch-only table of {grid * grid} (CVNets ViT adds the pos "
            "embed before the CLS token — a row for CLS means a different "
            "tower variant)")
    trunk["positional_embedding"] = pe
    from .convert_util import cvnets_block

    blocks: Dict[str, Any] = {}
    for i in range(g["layers"]):
        b = f"{prefix}transformer.{i}"
        if f"{b}.pre_norm_mha.0.weight" not in sd:
            raise KeyError(
                f"MobileCLIP-B transformer block {i} not found under "
                f"{b}.pre_norm_mha.* — trunk has fewer blocks than "
                f"{model_name} expects")
        # ONE CVNets block mapping shared with the MobileCLIP text
        # converter (convert_util.cvnets_block)
        blocks[f"resblocks_{i}"] = cvnets_block(sd, b)
    trunk["transformer"] = blocks
    trunk["ln_post"] = ln_(sd, f"{prefix}post_transformer_norm")
    return jax.tree.map(jnp.asarray, trunk)
