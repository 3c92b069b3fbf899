"""Native EVA02 vision trunk: rope + SwiGLU + sub-LN ViT, no timm.

Parity target: the reference's timm adapter accepts any timm trunk
(/root/reference/src/open_clip/timm_model.py:28-90); the EVA02 family
(timm eva.py, from the EVA-02 paper "A Visual Representation for Neon
Genesis") is the strongest ViT-shaped member it can load.  This module
implements the EVA02 block natively in Flax:

  - separate q/k/v projections (k without bias),
  - 2-D axial rotary position embedding on q/k patch tokens (the CLS
    token is excluded), per EVA-02's ``VisionRotaryEmbeddingFast``:
    per-axis rotation width head_dim/2, angles repeated over consecutive
    lane pairs, first half of the head dim rotated by the row coordinate
    and the second half by the column coordinate,
  - sub-LN: an extra LayerNorm before the attention output projection
    (``scale_attn``) and/or before the MLP output projection
    (``scale_mlp``), per the paper's sub-LN recipe,
  - SwiGLU MLP: ``w3(silu(w1(x)) * w2(x))`` with hidden width
    ``int(8/3 * width)`` (timm's mlp_ratio = 4*2/3 rounding),
  - learned absolute pos embed + CLS token on top of rope.

TPU notes: the patchify is the same unfold+matmul as models/vit.py (MXU
matmul, no conv layout shuffles); rope tables are static numpy constants
per (input grid), so jit traces one table per crop resolution; attention
uses the plain XLA einsum formulation — the packed-QKV Pallas kernel
requires torch-style fused qkv packing, which EVA02's separate
projections don't produce (concatenating them would re-introduce the
layout copies the kernel exists to avoid).

Checkpoints load via ``convert_timm_eva`` (timm eva.py key layout; the
original EVA-02 repo's ``w1/w2/w3/ffn_ln`` MLP key aliases are accepted
too).  Sub-LN/SwiGLU presence is INFERRED from the state dict, so
variant flags can't silently mismatch the checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm

Dtype = Any

# timm model name -> trunk geometry (timm eva.py eva02_* defaults: SwiGLU
# everywhere; the mid-MLP sub-LN only on base/large).  scale_attn (extra
# LN before the attention out-proj) appears only in the *_clip_* towers.
EVA_CONFIGS: Dict[str, Dict[str, Any]] = {
    "eva02_tiny_patch14_224": dict(
        patch_size=14, width=192, layers=12, heads=3, scale_mlp=False),
    "eva02_small_patch14_224": dict(
        patch_size=14, width=384, layers=12, heads=6, scale_mlp=False),
    "eva02_base_patch14_224": dict(
        patch_size=14, width=768, layers=12, heads=12, scale_mlp=True),
    "eva02_large_patch14_224": dict(
        patch_size=14, width=1024, layers=24, heads=16, scale_mlp=True),
    "eva02_base_patch16_clip_224": dict(
        patch_size=16, width=768, layers=12, heads=12, scale_mlp=True,
        scale_attn=True),
    "eva02_large_patch14_clip_224": dict(
        patch_size=14, width=1024, layers=24, heads=16, scale_mlp=True,
        scale_attn=True),
    "eva02_large_patch14_clip_336": dict(
        patch_size=14, width=1024, layers=24, heads=16, scale_mlp=True,
        scale_attn=True, image_size=336),
}


def register_eva(name: str, *, patch_size: int, width: int, layers: int,
                 heads: int, scale_mlp: bool = True,
                 scale_attn: bool = False, image_size: int = 224) -> None:
    """Register an additional EVA02 geometry."""
    EVA_CONFIGS[name] = dict(
        patch_size=patch_size, width=width, layers=layers, heads=heads,
        scale_mlp=scale_mlp, scale_attn=scale_attn, image_size=image_size,
    )


def rope_2d_tables(grid: int, native_grid: int, head_dim: int,
                   theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) [grid*grid, head_dim] for EVA-02's 2-D axial rope.

    Per ``VisionRotaryEmbeddingFast(dim=head_dim//2, pt_seq_len=
    native_grid, ft_seq_len=grid)``: coordinates are rescaled to the
    pretraining grid (``t = arange(grid)/grid * native_grid``) so a
    fine-tune resolution reuses the pretrained frequencies; each angle
    covers a consecutive lane PAIR (repeat by 2); the row-axis angles
    fill the first head_dim/2 lanes, the column-axis the second half.
    """
    dim = head_dim // 2
    freqs = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    t = np.arange(grid, dtype=np.float64) / grid * native_grid
    ang = np.repeat(np.outer(t, freqs), 2, axis=-1)       # [g, dim]
    row = np.broadcast_to(ang[:, None, :], (grid, grid, dim))
    col = np.broadcast_to(ang[None, :, :], (grid, grid, dim))
    full = np.concatenate([row, col], axis=-1).reshape(grid * grid, head_dim)
    return (np.cos(full).astype(np.float32),
            np.sin(full).astype(np.float32))


def _rotate_half(x: jax.Array) -> jax.Array:
    """(x1, x2) consecutive lane pairs -> (-x2, x1)."""
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(
        *x.shape[:-2], -1)


def apply_rope(t: jax.Array, cos: jax.Array, sin: jax.Array,
               num_prefix: int = 1) -> jax.Array:
    """Rotate the patch tokens of [B, H, L, hd]; prefix tokens pass through."""
    prefix, x = t[:, :, :num_prefix], t[:, :, num_prefix:]
    cos = cos[None, None].astype(x.dtype)
    sin = sin[None, None].astype(x.dtype)
    x = x * cos + _rotate_half(x) * sin
    return jnp.concatenate([prefix, x], axis=2)


class EvaAttention(nn.Module):
    """Separate-q/k/v attention with rope and optional sub-LN."""

    num_heads: int
    scale_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rope: Tuple[jax.Array, jax.Array],
                 num_prefix: int = 1) -> jax.Array:
        b, l, d = x.shape
        hd = d // self.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)

        def heads(t):
            return t.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        cos, sin = rope
        q = apply_rope(q, cos, sin, num_prefix)
        k = apply_rope(k, cos, sin, num_prefix)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        if self.scale_attn:
            o = LayerNorm(epsilon=1e-6, name="inner_ln")(o)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o)


class EvaBlock(nn.Module):
    num_heads: int
    scale_mlp: bool = True
    scale_attn: bool = False
    mlp_ratio: float = 4 * 2 / 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rope) -> jax.Array:
        d = x.shape[-1]
        h = LayerNorm(epsilon=1e-6, name="ln_1")(x)
        x = x + EvaAttention(
            num_heads=self.num_heads, scale_attn=self.scale_attn,
            dtype=self.dtype, name="attn",
        )(h, rope)
        h = LayerNorm(epsilon=1e-6, name="ln_2")(x)
        hidden = int(self.mlp_ratio * d)
        g = nn.Dense(hidden, dtype=self.dtype, name="w1")(h)
        u = nn.Dense(hidden, dtype=self.dtype, name="w2")(h)
        m = jax.nn.silu(g) * u
        if self.scale_mlp:
            m = LayerNorm(epsilon=1e-6, name="ffn_ln")(m)
        return x + nn.Dense(d, dtype=self.dtype, name="w3")(m)


class Eva(nn.Module):
    """EVA02 trunk; returns ``(pooled, tokens [B, 1+N, width])``.

    ``pooled`` is the CLS token after the final norm (``pool='token'``,
    the CLIP-tower configuration) or the patch-token mean (``'avg'``).
    """

    model_name: str
    image_size: Optional[int] = None     # override for other resolutions
    pool: str = "token"
    dtype: Dtype = jnp.float32
    remat: bool = False                  # --grad-checkpointing
    remat_policy: str = ""               # named jax.checkpoint policy

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        g = EVA_CONFIGS[self.model_name]
        p, w = g["patch_size"], g["width"]
        native = g.get("image_size", 224)
        img = self.image_size or native
        if x.shape[1] != img or x.shape[2] != img:
            img = x.shape[1]
        grid, native_grid = img // p, native // p
        b = x.shape[0]

        kernel = self.param("conv1_kernel", nn.initializers.lecun_normal(),
                            (p, p, 3, w), jnp.float32)
        bias = self.param("conv1_bias", nn.initializers.zeros, (w,),
                          jnp.float32)
        x = x.astype(self.dtype)
        # unfold+matmul patchify (identical to conv stride==kernel)
        x = x.reshape(b, grid, p, grid, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, grid * grid, p * p * 3)
        x = x @ kernel.reshape(p * p * 3, w).astype(self.dtype)
        x = x + bias.astype(self.dtype)

        cls = self.param("class_embedding",
                         nn.initializers.normal(stddev=0.02), (w,),
                         jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, w)), x], axis=1)
        n_pos = native_grid * native_grid + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=0.02), (n_pos, w),
                         jnp.float32)
        if grid != native_grid:
            from .vit import interpolate_pos_embed

            # antialias=True: timm's EVA checkpoint filter resamples
            # abs-pos-embeds with F.interpolate(antialias=True); the CLIP
            # towers keep the non-aa OpenCLIP kernel
            pos = interpolate_pos_embed(
                pos, (native_grid, native_grid), (grid, grid),
                antialias=True)
        x = x + pos.astype(x.dtype)[None]

        hd = w // g["heads"]
        cos, sin = rope_2d_tables(grid, native_grid, hd)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
        block_cls = EvaBlock
        if self.remat:
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy else None
            )
            block_cls = nn.remat(EvaBlock, prevent_cse=False, policy=policy)
        for i in range(g["layers"]):
            x = block_cls(
                num_heads=g["heads"],
                scale_mlp=g.get("scale_mlp", True),
                scale_attn=g.get("scale_attn", False),
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x, rope)
        x = LayerNorm(epsilon=1e-6, name="ln_post")(x)
        pooled = x[:, 0] if self.pool == "token" else jnp.mean(x[:, 1:], 1)
        return pooled, x


# --- timm checkpoint conversion ------------------------------------------

from .convert_util import dense_ as _dense, ln_ as _ln


def infer_timm_eva_name(sd: Dict[str, Any]) -> str:
    """Match a timm EVA02 state dict to a registered geometry by shapes
    and by the presence of the sub-LN keys."""
    w = int(np.asarray(sd["cls_token"]).reshape(-1).shape[0])
    p = int(np.asarray(sd["patch_embed.proj.weight"]).shape[-1])
    layers = 1 + max(int(k.split(".")[1]) for k in sd
                     if k.startswith("blocks."))
    n_pos = int(np.asarray(sd["pos_embed"]).shape[1])
    img = int(round((n_pos - 1) ** 0.5)) * p
    scale_attn = "blocks.0.attn.norm.weight" in sd
    for name, g in EVA_CONFIGS.items():
        if (g["width"] == w and g["patch_size"] == p
                and g["layers"] == layers
                and g.get("image_size", 224) == img
                and g.get("scale_attn", False) == scale_attn):
            return name
    raise KeyError(
        f"no registered EVA02 geometry matches width={w} patch={p} "
        f"layers={layers} img={img} scale_attn={scale_attn}; add one via "
        "register_eva"
    )


def _mlp_keys(sd, blk: str) -> Dict[str, str]:
    """timm eva.py SwiGLU keys (fc1_g/fc1_x/norm/fc2) or the original
    EVA-02 repo's (w1/w2/ffn_ln/w3)."""
    if f"{blk}.mlp.fc1_g.weight" in sd:
        return {"w1": f"{blk}.mlp.fc1_g", "w2": f"{blk}.mlp.fc1_x",
                "ffn_ln": f"{blk}.mlp.norm", "w3": f"{blk}.mlp.fc2"}
    if f"{blk}.mlp.w1.weight" in sd:
        return {"w1": f"{blk}.mlp.w1", "w2": f"{blk}.mlp.w2",
                "ffn_ln": f"{blk}.mlp.ffn_ln", "w3": f"{blk}.mlp.w3"}
    raise KeyError(
        f"{blk}: plain-MLP EVA variants (mlp.fc1/fc2, swiglu_mlp=False) "
        "are not supported — EVA02 towers are all SwiGLU"
    )


def convert_timm_eva(sd: Dict[str, Any], model_name: str) -> Dict[str, Any]:
    """timm EVA02 state dict -> Eva trunk param subtree.

    Mapping:
      cls_token / pos_embed / patch_embed.proj -> class_embedding /
        positional_embedding / conv1_kernel+bias (OIHW -> HWIO)
      blocks.i.norm1|norm2            -> resblocks_i/ln_1|ln_2
      blocks.i.attn.{q,k,v}_proj      -> resblocks_i/attn/{q,k,v}_proj
      blocks.i.attn.norm (if present) -> resblocks_i/attn/inner_ln
      blocks.i.attn.proj              -> resblocks_i/attn/out_proj
      blocks.i.mlp.(fc1_g|w1) etc.    -> resblocks_i/w1,w2,ffn_ln,w3
      norm                            -> ln_post
    rope tables are recomputed (they carry no weights).  This returns the
    TRUNK subtree only; the checkpoint's classifier head — which for
    timm's *_clip_* towers IS the jointly-trained CLIP projection — is
    loaded shape-matched by the convert.py dispatch
    (``_maybe_load_timm_head``).  Fused-qkv EVA variants (eva_giant)
    raise.
    """
    g = EVA_CONFIGS[model_name]
    w = g["width"]
    if "blocks.0.attn.qkv.weight" in sd:
        raise NotImplementedError(
            "fused-qkv EVA (eva_giant family) is not supported; EVA02 "
            "checkpoints use separate q/k/v projections"
        )
    trunk: Dict[str, Any] = {
        "class_embedding": np.asarray(sd["cls_token"]).reshape(w),
        "positional_embedding": np.asarray(sd["pos_embed"]).reshape(-1, w),
        "conv1_kernel": np.ascontiguousarray(
            np.asarray(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
        "conv1_bias": np.asarray(sd["patch_embed.proj.bias"]),
        "ln_post": _ln(sd, "norm"),
    }
    for i in range(g["layers"]):
        blk = f"blocks.{i}"
        mk = _mlp_keys(sd, blk)
        attn: Dict[str, Any] = {
            "q_proj": _dense(sd, f"{blk}.attn.q_proj"),
            "k_proj": _dense(sd, f"{blk}.attn.k_proj", bias=False),
            "v_proj": _dense(sd, f"{blk}.attn.v_proj"),
            "out_proj": _dense(sd, f"{blk}.attn.proj"),
        }
        if f"{blk}.attn.norm.weight" in sd:
            attn["inner_ln"] = _ln(sd, f"{blk}.attn.norm")
        block: Dict[str, Any] = {
            "ln_1": _ln(sd, f"{blk}.norm1"),
            "ln_2": _ln(sd, f"{blk}.norm2"),
            "attn": attn,
            "w1": _dense(sd, mk["w1"]),
            "w2": _dense(sd, mk["w2"]),
            "w3": _dense(sd, mk["w3"]),
        }
        if f"{mk['ffn_ln']}.weight" in sd:
            block["ffn_ln"] = _ln(sd, mk["ffn_ln"])
        trunk[f"resblocks_{i}"] = block
    return jax.tree.map(jnp.asarray, trunk)
