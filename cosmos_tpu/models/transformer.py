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
from .layers import LayerNorm, LayerScale, Mlp, gelu

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    is_cross_attention: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False

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
        attn_in = LayerNorm(name="ln_1")(x)
        attn_kv = None
        if self.is_cross_attention and kv is not None:
            attn_kv = LayerNorm(name="ln_1_kv")(kv)
        h = MultiheadAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="attn",
        )(attn_in, kv=attn_kv, mask=mask, csa=csa, causal=causal)
        if self.ls_init_value is not None:
            h = LayerScale(init_value=self.ls_init_value, name="ls_1")(h)
        x = x + h

        h = Mlp(
            hidden_dim=int(d * self.mlp_ratio),
            out_dim=d,
            act_fn=self.act_fn,
            dtype=self.dtype,
            name="mlp",
        )(LayerNorm(name="ln_2")(x))
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
    use_flash: bool = False

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
            block_cls = nn.remat(
                ResidualAttentionBlock, static_argnums=(4, 5),
                prevent_cse=False,
            )
        for i in range(self.layers):
            block = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                act_fn=self.act_fn,
                dtype=self.dtype,
                use_flash=self.use_flash,
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
