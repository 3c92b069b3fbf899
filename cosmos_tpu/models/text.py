"""Text transformer tower.

Parity targets (/root/reference/src/open_clip/transformer.py:780-940):
  - token embedding + learnable positional embedding, causal additive mask
    (build_causal_mask :889), 12-layer stack, ln_final.
  - argmax-EOT pooling: the pooled feature is the hidden state at the
    position of the highest token id (the EOT token) (text_global_pool
    :767-778); tokens = the full LN'd sequence.
  - text_projection as a [width, output_dim] matrix (no bias) by default.
  - AttentionalCrossPooler at the text width when attentional_pool is set
    (:834-841) — COSMOS's text-token pooler.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AttentionalCrossPooler
from .layers import LayerNorm, gelu
from .transformer import Transformer

Dtype = Any

NEG_INF = -1e9  # finite -inf stand-in; softmax in f32 makes this exact enough


def causal_mask(n: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask: 0 on/below diagonal, -inf above."""
    return jnp.triu(jnp.full((n, n), NEG_INF, dtype=dtype), k=1)



def coca_cls_pad_mask(text: jax.Array, pad_id: int) -> jax.Array:
    """Additive [B, L+1, L+1] mask for the appended-CLS CoCa text tower.

    Reference build_cls_mask (transformer.py:896-903), reproduced EXACTLY
    including its quirk: ``F.pad(text != pad, (1, 0, L, 0), value=True)``
    leaves the L token-query rows all-True (only the causal mask gates
    them) and masks only the CLS query row, whose key j is gated by
    ``text[j-1]`` (key 0 always allowed — the validity column is shifted
    by one).  An unshifted every-row pad mask produces different hidden
    states for any caption containing pad tokens.
    """
    b, l = text.shape
    key_valid = jnp.concatenate(
        [jnp.ones((b, 1), dtype=bool), text != pad_id], axis=1
    )                                               # [B, L+1]
    cls_row = jnp.where(key_valid, 0.0, NEG_INF)    # [B, L+1]
    return jnp.concatenate(
        [jnp.zeros((b, l, l + 1), cls_row.dtype),
         cls_row[:, None, :]], axis=1)              # [B, L+1, L+1]

class TextTransformer(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    num_heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    ls_init_value: Optional[float] = None
    no_causal_mask: bool = False
    pool_type: str = "argmax"   # 'first' | 'last' | 'argmax' | 'none'
    proj_bias: bool = False
    embed_cls: bool = False
    pad_id: int = 0
    attentional_pool: bool = False
    attn_pooler_heads: int = 8
    add_zero_attn: bool = False
    act_fn: Callable[[jax.Array], jax.Array] = gelu
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = ""
    use_flash: Optional[bool] = None   # None = auto: fused kernel on TPU
    fuse_ln: bool = False

    def setup(self):
        num_pos = self.context_length + (1 if self.embed_cls else 0)
        self.token_embedding = nn.Embed(
            self.vocab_size,
            self.width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            param_dtype=jnp.float32,
            name="token_embedding",
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (num_pos, self.width),
            jnp.float32,
        )
        if self.embed_cls:
            self.cls_emb = self.param(
                "cls_emb", nn.initializers.normal(stddev=0.01), (self.width,), jnp.float32
            )
        else:
            self.cls_emb = None
        self.transformer = Transformer(
            width=self.width,
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
        self.ln_final = LayerNorm(name="ln_final")
        if self.proj_bias:
            self.text_projection = nn.Dense(
                self.output_dim, dtype=self.dtype, name="text_projection"
            )
        else:
            self.text_projection = self.param(
                "text_projection_kernel",
                nn.initializers.normal(stddev=self.width ** -0.5),
                (self.width, self.output_dim),
                jnp.float32,
            )
        if self.attentional_pool:
            self.attn_cross_pool = AttentionalCrossPooler(
                num_heads=self.attn_pooler_heads,
                add_zero_attn=self.add_zero_attn,
                dtype=self.dtype,
                name="attn_cross_pool",
            )
        else:
            self.attn_cross_pool = None

    def __call__(self, text: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """text: [B, L] int32 token ids -> (pooled [B, out], tokens [B, L, width])."""
        seq_len = text.shape[1]
        x = self.token_embedding(text).astype(self.dtype)

        # with the flash kernel the causal structure is applied inside the
        # kernel; no additive mask array is materialized
        from .attention import resolve_fused

        flash_causal = (
            resolve_fused(self.use_flash)
            and not self.no_causal_mask
            and self.cls_emb is None
        )
        if self.no_causal_mask or flash_causal:
            mask = None
        else:
            mask = causal_mask(seq_len)

        if self.cls_emb is not None:
            # CoCa: append CLS at the end; pad positions masked out
            # (reference build_cls_mask, transformer.py:896-903).
            seq_len += 1
            cls = jnp.broadcast_to(
                self.cls_emb.astype(x.dtype)[None, None, :], (x.shape[0], 1, self.width)
            )
            x = jnp.concatenate([x, cls], axis=1)
            pad_mask = coca_cls_pad_mask(text, self.pad_id)
            mask = (causal_mask(seq_len) if mask is not None else 0.0) + pad_mask
            mask = mask[:, None, :, :]  # [B, 1, L, L] broadcast over heads

        x = x + self.positional_embedding[:seq_len].astype(x.dtype)
        x = self.transformer(x, mask=mask, causal=flash_causal)

        if self.cls_emb is not None:
            pooled, tokens = x[:, -1], x[:, :-1]
            pooled = self.ln_final(pooled)
        else:
            x = self.ln_final(x)
            pooled, tokens = self._pool(x, text)

        if self.proj_bias:
            pooled = self.text_projection(pooled)
        else:
            pooled = jnp.dot(
                pooled.astype(self.dtype),
                self.text_projection.astype(self.dtype),
            )
        return pooled, tokens

    def _pool(self, x: jax.Array, text: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.pool_type == "first":
            return x[:, 0], x[:, 1:]
        if self.pool_type == "last":
            return x[:, -1], x[:, :-1]
        if self.pool_type == "argmax":
            eot = jnp.argmax(text, axis=-1)
            pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
            return pooled, x
        return x, x
