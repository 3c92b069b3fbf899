"""Residual transformer stack shared by both towers.

Parity targets (/root/reference/src/open_clip/transformer.py):
  - ResidualAttentionBlock (:233-287): pre-LN attention + pre-LN MLP with
    optional LayerScale.
  - Transformer (:340-399): a plain stack with optional per-block gradient
    checkpointing (torch.utils.checkpoint → jax.checkpoint / nn.remat).

TPU notes: blocks are unrolled (12 layers) so XLA can schedule/fuse across
layer boundaries; ``remat`` trades FLOPs for HBM when activations of the
multi-crop batch would not fit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiheadAttention
from .layers import LayerNorm, LayerNormParams, LayerScale, Mlp, gelu

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    is_cross_attention: bool = False
    dtype: Dtype = jnp.float32
    use_flash: Optional[bool] = None   # None = auto: fused kernel on TPU
    # fuse each pre-LN into the following matmul (ln_1 -> packed QKV,
    # ln_2 -> c_fc) via the ln_matmul Pallas kernel: the normalized
    # activation never round-trips HBM.  Param tree is unchanged.
    fuse_ln: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        csa: bool = False,
        causal: bool = False,
    ) -> jax.Array:
        d = x.shape[-1]
        fuse = self.fuse_ln and kv is None and not self.is_cross_attention
        attn = MultiheadAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="attn",
        )
        if fuse:
            ln1 = LayerNormParams(name="ln_1")(d)
            h = attn(x, mask=mask, csa=csa, causal=causal, ln=ln1)
        else:
            attn_in = LayerNorm(name="ln_1")(x)
            attn_kv = None
            if self.is_cross_attention and kv is not None:
                attn_kv = LayerNorm(name="ln_1_kv")(kv)
            h = attn(attn_in, kv=attn_kv, mask=mask, csa=csa, causal=causal)
        if self.ls_init_value is not None:
            h = LayerScale(init_value=self.ls_init_value, name="ls_1")(h)
        x = x + h

        mlp = Mlp(
            hidden_dim=int(d * self.mlp_ratio),
            out_dim=d,
            act_fn=self.act_fn,
            dtype=self.dtype,
            name="mlp",
        )
        if fuse:
            ln2 = LayerNormParams(name="ln_2")(d)
            h = mlp(x, ln=ln2)
        else:
            h = mlp(LayerNorm(name="ln_2")(x))
        if self.ls_init_value is not None:
            h = LayerScale(init_value=self.ls_init_value, name="ls_2")(h)
        return x + h


class Transformer(nn.Module):
    width: int
    layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    dtype: Dtype = jnp.float32
    remat: bool = False
    # named jax.checkpoint policy for remat ('' = full recompute); e.g.
    # 'dots_with_no_batch_dims_saveable' keeps matmul outputs and only
    # recomputes the HBM-cheap elementwise ops between them
    remat_policy: str = ""
    use_flash: Optional[bool] = None   # None = auto: fused kernel on TPU
    fuse_ln: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        csa_last_block: bool = False,
        causal: bool = False,
    ) -> jax.Array:
        block_cls = ResidualAttentionBlock
        if self.remat:
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy else None
            )
            block_cls = nn.remat(
                ResidualAttentionBlock, static_argnums=(4, 5),
                prevent_cse=False, policy=policy,
            )
        for i in range(self.layers):
            block = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                act_fn=self.act_fn,
                dtype=self.dtype,
                use_flash=self.use_flash,
                fuse_ln=self.fuse_ln,
                name=f"resblocks_{i}",
            )
            is_last = i == self.layers - 1
            if csa_last_block and is_last:
                # SCLIP CSA path (transformer.py:687-694): the last block
                # runs with correlative self-attention and NO attn mask.
                x = block(x, None, None, True, False)
            else:
                x = block(x, None, mask, False, causal)
        return x
