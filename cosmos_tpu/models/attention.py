"""Multi-head attention for the CLIP towers, TPU-first.

Functional parity targets (/root/reference/src/open_clip/transformer.py):
  - torch.nn.MultiheadAttention with a packed in-projection: one
    ``[width, 3*width]`` kernel whose thirds project q, k, v
    (transformer.py:247 for resblocks, :221 for the cross pooler).
  - ``add_zero_attn`` appends an all-zero key/value slot before softmax
    (used by AttentionalCrossPooler, transformer.py:210-230).
  - Additive float attention masks (causal mask for the text tower).
  - The SCLIP "CSA" variant: attn = softmax(q qᵀ·s) + softmax(k kᵀ·s)
    (transformer.py:731-764), used by segmentation eval on the last block.

TPU notes: the packed projection is a single MXU matmul; softmax runs in
float32 on the VPU.  On TPU backends self-attention routes through the
packed-QKV Pallas kernel (cosmos_tpu.ops.fused_attention) BY DEFAULT
(``use_flash=None`` tri-state): it consumes the projection's row-major
[B, L, 3D] output directly, so no head-split transpose or layout-poisoned
projection matmul ever exists (a measured 162->220 img/s/chip full-step
win on v5e).  ``use_flash=False`` forces the XLA einsum path (CPU default);
``use_flash=True`` forces the kernel.  CSA, cross-attention, add_zero_attn
and non-causal-masked paths always use the XLA formulation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm

Dtype = Any


def resolve_fused(flag: Optional[bool]) -> bool:
    """use_flash tri-state: None = auto (on for TPU backends, off on CPU,
    where the XLA path is both exact and fastest to compile)."""
    if flag is not None:
        return flag
    return jax.default_backend() in ("tpu", "axon")


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    # [B, L, D] -> [B, H, L, Dh]
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    # [B, H, L, Dh] -> [B, L, D]
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention: q,k,v are [B, H, L, Dh]; mask is additive [..., Lq, Lk].

    Logits stay in the compute dtype (bf16 under mixed precision — a
    measured 20% full-step win on v5e vs f32 logits, and it matches the
    reference's AMP semantics: torch SDPA under autocast also produces
    half-precision logits); the softmax itself reduces in f32.
    """
    dh = q.shape[-1]
    scale = dh ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # no preferred_element_type here: the MXU accumulates bf16 dots in f32
    # internally, but the hint forces an f32 OUTPUT tensor — measured
    # ~70ms/step of pure HBM traffic on v5e
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


class MultiheadAttention(nn.Module):
    """Packed-QKV multi-head attention (self or cross).

    Parameters:
      in_proj/kernel: [D, 3D]  (thirds: q, k, v — transposed torch layout)
      in_proj/bias:   [3D]
      out_proj: Dense [D, D] with bias
    """

    num_heads: int
    add_zero_attn: bool = False
    dtype: Dtype = jnp.float32
    use_flash: Optional[bool] = None   # None = auto: fused kernel on TPU

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        csa: bool = False,
        causal: bool = False,
        deterministic: bool = True,
        ln=None,
    ) -> jax.Array:
        """ln=(scale, bias): fuse the preceding LayerNorm into the packed
        QKV projection via the ln_matmul Pallas kernel (x is then the
        UN-normalized residual stream; self-attention only)."""
        del deterministic  # attn dropout is 0 in all reference configs
        d = x.shape[-1]
        kernel = self.param(
            "in_proj_kernel",
            nn.initializers.normal(stddev=d ** -0.5),
            (d, 3 * d),
            jnp.float32,
        )
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        xc = x.astype(self.dtype)

        fused = (
            resolve_fused(self.use_flash)
            and kv is None
            and not csa
            and not self.add_zero_attn
            # the kernel applies only its in-kernel CAUSAL structure: an
            # additive mask has no kernel path, and `or causal` used to
            # silently DROP a provided mask whenever causal was also set
            # (a TPU/CPU numerics divergence instead of an error)
            and mask is None
        )
        if fused:
            from cosmos_tpu.ops.fused_attention import (
                fused_attention_qkv,
                supported,
            )

            fused = supported(self.num_heads, d, x.shape[1],
                              itemsize=xc.dtype.itemsize)

        if ln is not None:
            assert kv is None, "fused LN->QKV is a self-attention path"
            from cosmos_tpu.ops.experimental.ln_matmul import ln_matmul

            qkv = ln_matmul(xc, ln[0], ln[1], kernel, bias)
        elif kv is None:
            qkv = xc @ kernel + bias  # one MXU matmul for self-attention
        else:
            qkv = None

        if fused:
            # packed path: no head split/merge transposes ever exist — the
            # kernel reads each head as a 64-lane slice of the row-major
            # [B, L, 3D] projection output (see ops/fused_attention.py)
            out = fused_attention_qkv(qkv, self.num_heads, causal)
            return nn.Dense(x.shape[-1], dtype=self.dtype, name="out_proj")(out)

        if causal and mask is None:
            # caller elided the additive mask expecting the fused kernel's
            # in-kernel causal structure; rebuild it for the XLA fallback
            l_ = x.shape[1]
            col = jax.lax.broadcasted_iota(jnp.int32, (l_, l_), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (l_, l_), 0)
            mask = jnp.where(col > row, -1e30, 0.0)

        if qkv is not None:
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            kvc = kv.astype(self.dtype)
            q = xc @ kernel[:, :d] + bias[:d]
            kk = kvc @ kernel[:, d:2 * d] + bias[d:2 * d]
            vv = kvc @ kernel[:, 2 * d:] + bias[2 * d:]
            k, v = kk, vv

        if self.add_zero_attn:
            zeros = jnp.zeros(k.shape[:-2] + (1, d), dtype=k.dtype)
            k = jnp.concatenate([k, zeros], axis=-2)
            v = jnp.concatenate([v, zeros], axis=-2)
            if mask is not None:
                mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, 1)])

        qh = _split_heads(q, self.num_heads)
        kh = _split_heads(k, self.num_heads)
        vh = _split_heads(v, self.num_heads)

        if csa:
            # SCLIP correlative self-attention (transformer.py:745-748):
            # softmax(q qᵀ s) + softmax(k kᵀ s) — note weights sum to 2.
            dh = qh.shape[-1]
            scale = dh ** -0.5
            qq = jnp.einsum("bhqd,bhkd->bhqk", qh, qh,
                            preferred_element_type=jnp.float32) * scale
            kk_ = jnp.einsum("bhqd,bhkd->bhqk", kh, kh,
                             preferred_element_type=jnp.float32) * scale
            weights = jax.nn.softmax(qq, axis=-1) + jax.nn.softmax(kk_, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(vh.dtype), vh)
        else:
            out = dot_product_attention(qh, kh, vh, mask=mask)

        out = _merge_heads(out)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="out_proj")(out)


class AttentionalCrossPooler(nn.Module):
    """Cross-attention pooler (transformer.py:210-230).

    q: [B, Lq, D] queries; context: [B, Lk, D] keys/values.
    LayerNorm on both, MultiheadAttention(d, kdim=ctx, add_zero_attn).
    """

    num_heads: int = 8
    add_zero_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, context: jax.Array, q: jax.Array) -> jax.Array:
        kv = LayerNorm(name="ln_k")(context)
        qn = LayerNorm(name="ln_q")(q)
        return MultiheadAttention(
            num_heads=self.num_heads,
            add_zero_attn=self.add_zero_attn,
            dtype=self.dtype,
            name="attn",
        )(qn, kv=kv)


class AttentionalPooler(nn.Module):
    """Learned-query attention pooler (transformer.py:187-207, CoCa path)."""

    num_heads: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        query = self.param(
            "query", nn.initializers.normal(stddev=1.0), (self.n_queries, d), jnp.float32
        )
        kv = LayerNorm(name="ln_k")(x)
        qn = LayerNorm(name="ln_q")(query.astype(x.dtype))
        qn = jnp.broadcast_to(qn[None], (x.shape[0],) + qn.shape)
        return MultiheadAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(qn, kv=kv)
