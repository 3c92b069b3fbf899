"""Vision transformer tower.

Parity targets (/root/reference/src/open_clip/transformer.py:471-764):
  - conv1 patchify (:506) — implemented here as an unfold+matmul, which is
    numerically identical for stride == kernel (non-overlapping patches)
    and maps straight onto the MXU with no conv layout shuffles.
  - class token + learnable/sin-cos positional embedding (:511-521).
  - bicubic positional-embedding interpolation for non-native resolutions
    (interpolate_pos_encoding, :646-669) — resolved statically per input
    shape under jit, so each crop resolution compiles once.
  - 'tok' pooling: CLS token → ln_post → @ proj (:640-729).
  - CSA branch for SCLIP segmentation (:687-694) via the transformer's
    ``csa_last_block``.
  - AttentionalCrossPooler at the embedding dim when attentional_pool is
    set (:540-548) — COSMOS's image-token pooler.

Input layout is NHWC (TPU-native), unlike the reference's NCHW.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import AttentionalCrossPooler
from .layers import LayerNorm, gelu, patch_dropout
from .transformer import Transformer

Dtype = Any


def sincos_2d_pos_embed(dim: int, grid: int, cls_token: bool = True) -> np.ndarray:
    """2-D sin-cos positional embedding (pos_embed.py:20-67 equivalent)."""
    def _1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid, dtype=np.float64)
    gw = np.arange(grid, dtype=np.float64)
    gw, gh = np.meshgrid(gw, gh)
    # reference order (pos_embed.py:28-44): meshgrid puts w FIRST and the
    # first half of the dims encodes grid[0] (the w mesh) — the h/w halves
    # were swapped here before, breaking bit-parity of the initial table
    emb = np.concatenate([_1d(dim // 2, gw), _1d(dim // 2, gh)], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, dim)), emb], axis=0)
    return emb.astype(np.float32)


def _torch_bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] interpolation matrix reproducing torch F.interpolate
    (mode='bicubic', align_corners=False, no antialias): cubic
    convolution with a = -0.75 and border-replicated taps.

    jax.image.resize's bicubic uses the Keys kernel with a = -0.5, so
    every interpolated value differs from the reference's
    interpolate_pos_encoding — a static weight matrix makes the resize
    torch-exact AND turns it into one MXU matmul per axis."""
    if src == dst:
        return np.eye(src)
    a = -0.75

    def w(t: float) -> float:
        t = abs(t)
        if t <= 1.0:
            return (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0
        if t < 2.0:
            return a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a
        return 0.0

    m = np.zeros((dst, src))
    for i in range(dst):
        x = (i + 0.5) * (src / dst) - 0.5
        f = np.floor(x)
        for k in range(-1, 3):
            j = int(np.clip(f + k, 0, src - 1))
            m[i, j] += w(x - (f + k))
    return m


def _torch_bicubic_aa_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] matrix reproducing torch F.interpolate(mode='bicubic',
    align_corners=False, antialias=True) — the PIL-aligned separable
    path: cubic filter with a = -0.5, support widened by the downscale
    factor, weights renormalized to sum 1.  timm's EVA checkpoint filter
    resamples abs-pos-embeds with antialias=True, so EVA02 loads at
    non-native resolution need THIS kernel for timm bit-parity (the
    non-aa a = -0.75 matrix above matches OpenCLIP's
    interpolate_pos_encoding instead).  Verified elementwise against the
    torch oracle for up- and down-scaling (tests/test_eva.py)."""
    if src == dst:
        return np.eye(src)
    scale = src / dst
    sup_scale = max(scale, 1.0)
    support = 2.0 * sup_scale
    inv = 1.0 / sup_scale
    a = -0.5

    def w(t: float) -> float:
        t = abs(t)
        if t < 1.0:
            return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
        if t < 2.0:
            return (((t - 5.0) * t + 8.0) * t - 4.0) * a
        return 0.0

    m = np.zeros((dst, src))
    for i in range(dst):
        center = scale * (i + 0.5)
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), src)
        ws = np.array([w((j - center + 0.5) * inv)
                       for j in range(xmin, xmax)])
        m[i, xmin:xmax] = ws / ws.sum()
    return m


def interpolate_pos_embed(
    pos_embed: jax.Array,
    src_grid: Tuple[int, int],
    dst_grid: Tuple[int, int],
    num_prefix: int = 1,
    antialias: bool = False,
) -> jax.Array:
    """Bicubic-resize the patch part of a [prefix+N, D] pos embed
    (torch-F.interpolate-exact; see _torch_bicubic_matrix).  antialias
    selects the PIL-aligned a=-0.5 widened kernel (timm semantics) over
    the default a=-0.75 non-aa kernel (OpenCLIP semantics)."""
    if src_grid == dst_grid:
        return pos_embed
    cls_pe, patch_pe = pos_embed[:num_prefix], pos_embed[num_prefix:]
    d = pos_embed.shape[-1]
    grid = patch_pe.reshape(src_grid[0], src_grid[1], d).astype(jnp.float32)
    mk = _torch_bicubic_aa_matrix if antialias else _torch_bicubic_matrix
    mh = jnp.asarray(mk(src_grid[0], dst_grid[0]), jnp.float32)
    mw = jnp.asarray(mk(src_grid[1], dst_grid[1]), jnp.float32)
    resized = jnp.einsum("ah,hwd,bw->abd", mh, grid, mw)
    return jnp.concatenate(
        [cls_pe, resized.reshape(-1, d).astype(pos_embed.dtype)], axis=0
    )


class MAPHead(nn.Module):
    """big_vision MAP pooling head — the SigLIP image pooler: a learned
    probe cross-attends over the patch tokens, then an MLP residual
    (reference convert.py:89-105 maps this layout from the npz)."""

    num_heads: int
    mlp_ratio: float = 4.0
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        probe = self.param(
            "probe", nn.initializers.xavier_uniform(), (1, 1, d), jnp.float32
        )
        q = nn.Dense(d, dtype=self.dtype, name="q")(
            jnp.broadcast_to(probe.astype(x.dtype), (b, 1, d))
        )
        kv = nn.Dense(2 * d, dtype=self.dtype, name="kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = d // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", heads(q), heads(k),
            preferred_element_type=jnp.float32,
        ) * hd ** -0.5
        wts = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", wts, heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        o = nn.Dense(d, dtype=self.dtype, name="out")(o)
        y = LayerNorm(name="ln")(o)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="c_fc")(y)
        o = o + nn.Dense(d, dtype=self.dtype, name="c_proj")(self.act_fn(h))
        return o[:, 0]


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    ls_init_value: Optional[float] = None
    patch_dropout_prob: float = 0.0
    no_ln_pre: bool = False
    # MCi conv stem (timm vit_base_mci_224 / CVNets ViT, the MobileCLIP-B
    # image tower): a chain of kernel==stride convs replaces the single
    # patchify conv.  Deploy form — BN is fused into the kernels at
    # convert time (timm_model.convert_mobileclip_vit).
    stem_channels: Optional[Tuple[int, ...]] = None
    stem_kernels: Tuple[int, ...] = (4, 2, 2)
    # timm no_embed_class semantics (CVNets ViT ordering): pos embed is a
    # patch-only table added BEFORE the CLS token is prepended.
    no_embed_class: bool = False
    pos_embed_type: str = "learnable"   # 'learnable' | 'sin_cos_2d'
    pool_type: str = "tok"              # 'tok' | 'avg' | 'map' | 'none'
    class_token: bool = True            # SigLIP ViTs have no CLS token
    patch_bias: bool = False            # SigLIP patch embed has a bias
    no_proj: bool = False               # SigLIP: embed dim == width
    final_ln_after_pool: bool = False
    attentional_pool: bool = False
    attn_pooler_heads: int = 8
    add_zero_attn: bool = False
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = ""
    use_flash: Optional[bool] = None   # None = auto: fused kernel on TPU
    fuse_ln: bool = False

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.image_size // self.patch_size, self.image_size // self.patch_size)

    def setup(self):
        p, w = self.patch_size, self.width
        scale = w ** -0.5
        if self.stem_channels is not None:
            chans = (3,) + tuple(self.stem_channels)
            if chans[-1] != w:
                raise ValueError(
                    f"stem_channels must end at width {w}, got {chans}")
            if int(np.prod(self.stem_kernels)) != p:
                raise ValueError(
                    f"stem_kernels {self.stem_kernels} must multiply to "
                    f"patch_size {p}")
            self.stem_kernels_p = [
                self.param(f"stem{i}_kernel", nn.initializers.lecun_normal(),
                           (k, k, chans[i], chans[i + 1]), jnp.float32)
                for i, k in enumerate(self.stem_kernels)
            ]
            self.stem_biases_p = [
                self.param(f"stem{i}_bias", nn.initializers.zeros,
                           (chans[i + 1],), jnp.float32)
                for i, _ in enumerate(self.stem_kernels)
            ]
            self.conv1_kernel = None
            self.conv1_bias = None
        else:
            # HWIO kernel layout (matches a Conv with stride=kernel=p,
            # no bias).
            self.conv1_kernel = self.param(
                "conv1_kernel",
                nn.initializers.lecun_normal(),
                (p, p, 3, w),
                jnp.float32,
            )
            if self.patch_bias:
                self.conv1_bias = self.param(
                    "conv1_bias", nn.initializers.zeros, (w,), jnp.float32
                )
            else:
                self.conv1_bias = None
        if self.class_token:
            self.class_embedding = self.param(
                "class_embedding",
                nn.initializers.normal(stddev=scale),
                (w,),
                jnp.float32,
            )
        else:
            self.class_embedding = None
        self.num_prefix = 1 if self.class_token else 0
        n_pos = self.grid_size[0] * self.grid_size[1] + (
            0 if self.no_embed_class else self.num_prefix)
        if self.no_embed_class and self.pos_embed_type != "learnable":
            raise ValueError("no_embed_class requires a learnable pos embed")
        if self.pos_embed_type == "learnable":
            self.positional_embedding = self.param(
                "positional_embedding",
                nn.initializers.normal(stddev=scale),
                (n_pos, w),
                jnp.float32,
            )
        elif self.pos_embed_type == "sin_cos_2d":
            fixed = sincos_2d_pos_embed(
                w, self.grid_size[0], cls_token=self.class_token
            )
            # FROZEN like the reference (transformer.py:514-522 registers
            # the table with requires_grad=False): a constant, not a
            # param — as a param it would receive AdamW updates AND
            # decoupled weight decay, drifting from the reference run
            self.positional_embedding = jnp.asarray(fixed, jnp.float32)
        else:
            raise ValueError(self.pos_embed_type)

        self.ln_pre = None if self.no_ln_pre else LayerNorm(name="ln_pre")
        self.transformer = Transformer(
            width=w,
            layers=self.layers,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            act_fn=self.act_fn,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            use_flash=self.use_flash,
            fuse_ln=self.fuse_ln,
        )
        self.ln_post = LayerNorm(name="ln_post")
        if self.no_proj:
            self.proj = None
        else:
            self.proj = self.param(
                "proj", nn.initializers.normal(stddev=scale),
                (w, self.output_dim), jnp.float32,
            )
        if self.pool_type == "map":
            self.attn_pool = MAPHead(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                act_fn=self.act_fn,
                dtype=self.dtype,
                name="attn_pool",
            )
        if self.attentional_pool:
            # COSMOS image-token cross pooler at the embedding dim
            # (transformer.py:540-548).
            self.attn_cross_pool = AttentionalCrossPooler(
                num_heads=self.attn_pooler_heads,
                add_zero_attn=self.add_zero_attn,
                dtype=self.dtype,
                name="attn_cross_pool",
            )
        else:
            self.attn_cross_pool = None

    def patchify(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] -> [B, gh*gw, width] via unfold + one matmul."""
        b, h, w, c = images.shape
        p = self.patch_size
        if self.stem_channels is not None:
            # MCi conv stem: every stage has kernel == stride, so each conv
            # is exactly an unfold+matmul (non-overlapping windows) — the
            # whole stem is 3 chained MXU matmuls with GELU between, no
            # conv layout shuffles.  erf-GELU matches torch nn.GELU() /
            # timm ConvStem act_layer=nn.GELU.
            x = images
            last = len(self.stem_kernels) - 1
            for i, k in enumerate(self.stem_kernels):
                bb, hh, ww, cc = x.shape
                x = x.reshape(bb, hh // k, k, ww // k, k, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    bb, hh // k, ww // k, k * k * cc)
                kern = self.stem_kernels_p[i].reshape(k * k * cc, -1)
                x = jnp.dot(x.astype(self.dtype), kern.astype(self.dtype))
                x = x + self.stem_biases_p[i].astype(x.dtype)
                if i < last:
                    x = gelu(x)
            return x.reshape(b, -1, self.width)
        gh, gw = h // p, w // p
        x = images.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        kernel = self.conv1_kernel.reshape(p * p * 3, self.width).astype(self.dtype)
        # no f32 output hint: MXU accumulates in f32 internally; the hint
        # would materialize an f32 activation tensor (pure HBM cost)
        out = jnp.dot(x.astype(self.dtype), kernel)
        if self.conv1_bias is not None:
            out = out + self.conv1_bias.astype(out.dtype)
        return out

    def __call__(
        self,
        images: jax.Array,
        csa: bool = False,
        patch_drop_rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (pooled [B, output_dim], tokens [B, N, width])."""
        b, h, w, _ = images.shape
        x = self.patchify(images)
        dst_grid = (h // self.patch_size, w // self.patch_size)
        if self.no_embed_class:
            # timm no_embed_class / CVNets ViT ordering: patch-only pos
            # table added before the CLS token is prepended
            pe = interpolate_pos_embed(
                self.positional_embedding, self.grid_size, dst_grid,
                num_prefix=0,
            )
            x = x + pe.astype(x.dtype)[None]
        if self.class_embedding is not None:
            cls = jnp.broadcast_to(
                self.class_embedding.astype(x.dtype)[None, None, :],
                (b, 1, self.width),
            )
            x = jnp.concatenate([cls, x], axis=1)
        if not self.no_embed_class:
            pe = interpolate_pos_embed(
                self.positional_embedding,
                self.grid_size,
                dst_grid,
                num_prefix=self.num_prefix,
            )
            x = x + pe.astype(x.dtype)[None]

        if self.patch_dropout_prob > 0.0:
            # training-only (PatchDropout is identity in reference eval,
            # transformer.py:57): active when the caller provides either
            # an explicit rng or a 'patch_drop' rng collection
            # (model.apply(..., rngs={'patch_drop': key}) — the train
            # step supplies it; eval paths don't, so they trace
            # dropout-free)
            if patch_drop_rng is None and self.has_rng("patch_drop"):
                patch_drop_rng = self.make_rng("patch_drop")
            if patch_drop_rng is not None:
                x = patch_dropout(x, patch_drop_rng, self.patch_dropout_prob)

        if self.ln_pre is not None:
            x = self.ln_pre(x)

        x = self.transformer(x, mask=None, csa_last_block=csa)

        if self.final_ln_after_pool:
            pooled, tokens = self._pool(x)
            pooled = self.ln_post(pooled)
        else:
            x = self.ln_post(x)
            pooled, tokens = self._pool(x)

        if self.proj is not None:
            pooled = jnp.dot(
                pooled.astype(self.dtype), self.proj.astype(self.dtype)
            )
        return pooled, tokens

    def _pool(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        p = self.num_prefix
        if self.pool_type == "avg":
            return x[:, p:].mean(axis=1), x[:, p:]
        if self.pool_type == "tok":
            return x[:, 0], x[:, 1:]
        if self.pool_type == "map":
            return self.attn_pool(x), x
        return x, x
