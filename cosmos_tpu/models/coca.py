"""CoCa: contrastive captioner (dual encoder + multimodal text decoder).

Parity target: /root/reference/src/open_clip/coca_model.py:79-471 and the
MultimodalTransformer (transformer.py:943-1035): a CLIP text tower with an
appended CLS token ('last' pooling), a vision tower with an attentional
pooler, and a decoder of [self-attention(causal), cross-attention(image
tokens)] block pairs projecting to vocab logits; captioning labels are the
teacher-forced shifted text (coca_model.py:176-180).

Generation: the reference drives HuggingFace LogitsWarpers / BeamSearch on
dynamic shapes (coca_model.py:192-471).  Here generation is a single
jitted lax.fori_loop over a fixed-length token buffer (greedy / top-k /
top-p with a PRNG key) — static shapes, one compile, TPU-resident.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AttentionalPooler
from .config import CLIPCfg, MultimodalCfg
from .layers import LayerNorm, get_act_fn, l2_normalize
from .text import TextTransformer, causal_mask
from .transformer import ResidualAttentionBlock
from .vit import VisionTransformer

Dtype = Any


class MultimodalTransformer(nn.Module):
    """Decoder: per layer a causal self-attn block + a cross-attn block."""

    width: int
    layers: int
    num_heads: int
    context_length: int = 76
    mlp_ratio: float = 4.0
    vocab_size: int = 49408
    act_fn: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embs: jax.Array, text_embs: jax.Array) -> jax.Array:
        seq_len = text_embs.shape[1]
        mask = causal_mask(seq_len)
        x = text_embs
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                act_fn=self.act_fn,
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x, mask=mask)
            x = ResidualAttentionBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                act_fn=self.act_fn,
                is_cross_attention=True,
                dtype=self.dtype,
                name=f"cross_attn_{i}",
            )(x, kv=image_embs)
        x = LayerNorm(name="ln_final")(x)
        proj = self.param(
            "text_projection_kernel",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.vocab_size),
            jnp.float32,
        )
        return jnp.dot(x.astype(self.dtype), proj.astype(self.dtype))


class CoCa(nn.Module):
    cfg: CLIPCfg
    pad_id: int = 0
    dtype: Dtype = jnp.float32
    remat: bool = False                 # --grad-checkpointing
    remat_policy: str = ""
    use_flash: Optional[bool] = None    # tri-state like CLIP's

    def setup(self):
        c = self.cfg
        v, t = c.vision_cfg, c.text_cfg
        mm = c.multimodal_cfg or MultimodalCfg()
        act = get_act_fn("quick_gelu" if c.quick_gelu else "gelu")
        self.visual = VisionTransformer(
            image_size=v.image_size,
            patch_size=v.patch_size,
            width=v.width,
            layers=v.layers,
            num_heads=v.heads,
            mlp_ratio=v.mlp_ratio,
            output_dim=c.embed_dim,
            pool_type=v.pool_type,
            act_fn=act,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            use_flash=self.use_flash,
            name="visual",
        )
        self.visual_attn_pool = AttentionalPooler(
            num_heads=mm.attn_pooler_heads,
            n_queries=getattr(v, "attn_pooler_queries", 256),
            dtype=self.dtype,
            name="attn_pool",
        )
        self.ln_attn_pool = LayerNorm(name="ln_attn_pool")
        self.text = TextTransformer(
            context_length=t.context_length,
            vocab_size=t.vocab_size,
            width=t.width,
            num_heads=t.heads,
            layers=t.layers,
            mlp_ratio=t.mlp_ratio,
            output_dim=c.embed_dim,
            embed_cls=True,
            pad_id=self.pad_id,
            act_fn=act,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            use_flash=self.use_flash,
            name="text",
        )
        self.text_decoder = MultimodalTransformer(
            width=mm.width,
            layers=mm.layers,
            num_heads=mm.heads,
            context_length=mm.context_length,
            mlp_ratio=mm.mlp_ratio,
            vocab_size=t.vocab_size,
            act_fn=act,
            dtype=self.dtype,
            name="text_decoder",
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda k, s, d: jnp.full(s, c.init_logit_scale, d),
            (),
            jnp.float32,
        )

    def _encode_image(self, images, normalize=True):
        """(latent [B,D], image token embs [B, n_queries-1, width])."""
        _, raw_tokens = self.visual(images)
        # CoCa pools patch tokens with learned queries; query 0 becomes the
        # contrastive latent, the rest condition the decoder
        # (reference transformer.py:640-646 'original OpenCLIP CoCa setup')
        pooled_seq = self.visual_attn_pool(raw_tokens)
        pooled_seq = self.ln_attn_pool(pooled_seq)
        latent, tokens = pooled_seq[:, 0], pooled_seq[:, 1:]
        latent = jnp.dot(
            latent.astype(self.dtype), self.visual.proj.astype(self.dtype)
        )
        if normalize:
            latent = l2_normalize(latent)
        return latent, tokens

    def _encode_text(self, text, normalize=True):
        latent, token_embs = self.text(text)
        if normalize:
            latent = l2_normalize(latent)
        return latent, token_embs

    def encode_image(self, images, normalize=True):
        return self._encode_image(images, normalize)[0]

    def encode_text(self, text, normalize=True):
        return self._encode_text(text, normalize)[0]

    def __call__(
        self,
        images: Optional[jax.Array],
        text: Optional[jax.Array] = None,
        output_labels: bool = True,
    ) -> Dict[str, jax.Array]:
        image_latent, image_embs = self._encode_image(images)
        if text is None:
            return {"image_features": image_latent, "image_embs": image_embs}
        text_latent, token_embs = self._encode_text(text)
        labels = None
        if output_labels:
            # teacher forcing: logits at position i predict token i+1
            labels = text[:, 1:]
            token_embs = token_embs[:, :-1]
        logits = self.text_decoder(image_embs, token_embs)
        out = {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if labels is not None:
            out["labels"] = labels
        return out


def generate(
    model: CoCa,
    params: Dict,
    images: jax.Array,
    *,
    seq_len: int = 30,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    temperature: float = 1.0,
    generation_type: str = "top_p",   # 'greedy' | 'top_k' | 'top_p'
    top_k: int = 1,
    top_p: float = 0.1,
    min_seq_len: int = 5,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Fixed-length autoregressive caption generation under one jit.

    Returns [B, seq_len] token ids (padded after EOT).
    """
    b = images.shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    out0 = model.apply({"params": params}, images, None)
    image_embs = out0["image_embs"]

    tokens0 = jnp.full((b, seq_len), pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(sot_token_id)
    done0 = jnp.zeros((b,), bool)

    def decode_logits(tokens):
        # text tower token embeddings without the CLS path: embed + pos
        text_latent, token_embs = model.apply(
            {"params": params}, tokens, method=lambda m, t: m._encode_text(t)
        )
        # token_embs excludes the appended CLS (text.py returns x[:, :-1])
        return model.apply(
            {"params": params}, image_embs, token_embs,
            method=lambda m, ie, te: m.text_decoder(ie, te),
        )

    def step(i, carry):
        tokens, done, key = carry
        logits = decode_logits(tokens)[:, i - 1] / temperature  # [B, V]
        logits = jnp.where(
            (i < min_seq_len),
            logits.at[:, eot_token_id].set(-1e30),
            logits,
        )
        key, sub = jax.random.split(key)
        if generation_type == "greedy" or (generation_type == "top_k" and top_k == 1):
            nxt = jnp.argmax(logits, axis=-1)
        elif generation_type == "top_k":
            vals, idxs = jax.lax.top_k(logits, top_k)
            choice = jax.random.categorical(sub, vals)
            nxt = jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0]
        elif generation_type == "top_p":
            # HF TopPLogitsWarper semantics (the reference drives it,
            # coca_model.py:259-260): keep the SMALLEST set of most
            # probable tokens whose mass reaches top_p — token j (desc
            # order) survives iff the cumulative mass BEFORE it is still
            # < top_p.  (The previous cum < (1 - top_p) cutoff kept the
            # top 1-top_p mass — the inverse of the documented knob.)
            sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = jnp.sum((cum - probs) < top_p, axis=-1)   # always >= 1
            cutoff = jnp.take_along_axis(
                sorted_logits, (keep - 1)[:, None], axis=1
            )
            filtered = jnp.where(logits < cutoff, -1e30, logits)
            nxt = jax.random.categorical(sub, filtered)
        else:
            raise ValueError(generation_type)
        nxt = jnp.where(done, pad_token_id, nxt)
        tokens = tokens.at[:, i].set(nxt)
        done = jnp.logical_or(done, nxt == eot_token_id)
        return tokens, done, key

    tokens, done, _ = jax.lax.fori_loop(1, seq_len, step, (tokens0, done0, rng))
    return tokens


def beam_search_generate(
    model: CoCa,
    params: Dict,
    images: jax.Array,
    *,
    num_beams: int = 6,
    seq_len: int = 30,
    sot_token_id: int = 49406,
    eot_token_id: int = 49407,
    pad_token_id: int = 0,
    min_seq_len: int = 5,
    length_penalty: float = 1.0,
) -> jax.Array:
    """Fixed-shape beam search under one jit (the reference drives HF's
    dynamic-shape group beam search, coca_model.py:241-471; here a
    standard beam search runs as a lax.fori_loop with [B, beams, L]
    buffers — TPU-resident, one compile)."""
    b = images.shape[0]
    out0 = model.apply({"params": params}, images, None)
    image_embs = out0["image_embs"]
    # each beam attends the same image
    embs = jnp.repeat(image_embs, num_beams, axis=0)  # [B*K, N, D]

    NEG = -1e9
    tokens0 = jnp.full((b, num_beams, seq_len), pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(sot_token_id)
    # only beam 0 live at start (identical beams would duplicate)
    scores0 = jnp.full((b, num_beams), NEG, jnp.float32).at[:, 0].set(0.0)
    done0 = jnp.zeros((b, num_beams), bool)

    def decode_logits(tokens_flat):
        _, token_embs = model.apply(
            {"params": params}, tokens_flat,
            method=lambda m, t: m._encode_text(t),
        )
        return model.apply(
            {"params": params}, embs, token_embs,
            method=lambda m, ie, te: m.text_decoder(ie, te),
        )

    def step(i, carry):
        tokens, scores, done = carry
        flat = tokens.reshape(b * num_beams, seq_len)
        logits = decode_logits(flat)[:, i - 1].reshape(b, num_beams, -1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        logp = jnp.where(i < min_seq_len,
                         logp.at[..., eot_token_id].set(NEG), logp)
        # finished beams only extend with pad at no cost
        pad_only = jnp.full((vocab,), NEG).at[pad_token_id].set(0.0)
        logp = jnp.where(done[..., None], pad_only[None, None, :], logp)
        cand = scores[..., None] + logp                    # [B, K, V]
        flat_cand = cand.reshape(b, num_beams * vocab)
        top_scores, top_idx = jax.lax.top_k(flat_cand, num_beams)
        beam_idx = top_idx // vocab                        # [B, K]
        tok_idx = (top_idx % vocab).astype(jnp.int32)
        tokens = jnp.take_along_axis(
            tokens, beam_idx[..., None], axis=1
        ).at[:, :, i].set(tok_idx)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        done = jnp.logical_or(done, tok_idx == eot_token_id)
        return tokens, top_scores, done

    tokens, scores, done = jax.lax.fori_loop(
        1, seq_len, step, (tokens0, scores0, done0)
    )
    # length-penalized best beam
    lengths = jnp.sum(tokens != pad_token_id, axis=-1).astype(jnp.float32)
    final = scores / (lengths ** length_penalty)
    best = jnp.argmax(final, axis=-1)
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
