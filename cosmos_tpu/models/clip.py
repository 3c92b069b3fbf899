"""CLIP dual encoder with the COSMOS cross-modality heads.

Parity targets (/root/reference/src/open_clip/model.py:240-437):
  - CLIP: vision tower + text tower, learnable logit_scale (init ln(1/0.07))
    and, with ``cosmos=True``, a separate distill_logit_scale (:274).
  - ``output_all`` adds image_token_mapping / text_token_mapping Linear
    (width -> embed_dim) heads (:281-287).
  - The COSMOS forward (:348-408):
      * student runs on ALL crops (2 global @224 + n local @96) and all k
        sampled captions;
      * cross-modal features: for every image view i,
          img_crossmodal[i] = normalize(img_feat[i] +
              text_pooler(kv=txt_tokens_of_first_global_caption, q=img_feat[i]))
        and symmetrically for text views against the first global crop's
        patch tokens;
      * the pooled features are normalized only AFTER the cross-modal
        residual addition (queries and residuals use unnormalized feats).
  - MultiCropWrap (:412-437) resolution grouping: here the two resolution
    groups are two static-shaped arrays, so a single jit traces the vision
    tower exactly twice (224 and 96) rather than looping Python lists.

Feature layout: views-major everywhere — an array of V views of batch B is
``[V*B, ...]`` with view v occupying rows [v*B, (v+1)*B), matching the
reference's ``torch.cat`` of per-view tensors and its ``.chunk(V)`` in the
train loop (train.py:173-184).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import CLIPCfg
from .layers import get_act_fn, l2_normalize
from .text import TextTransformer
from .vit import VisionTransformer

Dtype = Any


def _logit_scale_init(value: float):
    return lambda key, shape, dtype: jnp.full(shape, value, dtype)


class CLIP(nn.Module):
    cfg: CLIPCfg
    cosmos: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = ""
    use_flash: Optional[bool] = None   # None = auto: fused kernel on TPU
    act_approx: bool = False   # tanh GELU (faster; tiny numeric deviation)
    fuse_ln: bool = False      # fused LN->matmul Pallas path in the blocks
    # length-bucketed text tower for the COSMOS training forward (> 0 =
    # short-bucket length, e.g. 32).  textcrop local captions are single
    # sentences, so most of the k x B caption views waste 77-token padding
    # FLOPs; the caption views past the 2 globals are EOT-sorted and the
    # shortest 3/4 run at this length when they fit (lax.cond falls back
    # to the full length otherwise).  Mathematically exact: under the
    # causal mask + argmax-EOT pooling, tokens past a caption's EOT
    # cannot reach its pooled feature, and truncation at >= eot+1
    # preserves the argmax (dropped values are never larger).  Floats
    # agree to reassociation noise only (~1e-7: splitting the batch
    # changes GEMM shapes, hence XLA reduction blocking).
    # See _bucketed_text_pooled.
    text_bucket: int = 0

    def setup(self):
        c = self.cfg
        v, t = c.vision_cfg, c.text_cfg
        if c.quick_gelu:
            act = get_act_fn("quick_gelu")
        else:
            act = get_act_fn("gelu_tanh" if self.act_approx else "gelu")
        if v.timm_model_name:
            # timm trunk dispatch (reference model.py:132-141)
            from .timm_model import TimmModel

            if self.cosmos or v.attentional_pool or v.output_all:
                # the COSMOS heads need the tower's cross-attention pooler
                # and token-mapping outputs, which the timm adapter (pool +
                # proj head only, like the reference's) does not provide —
                # fail at construction, not with a KeyError mid-trace
                raise ValueError(
                    "timm vision towers support plain CLIP/SigLIP training "
                    "and inference only; --cosmos/--output-all/"
                    "--attentional-pool need the native ViT tower"
                )

            self.visual = TimmModel(
                model_name=v.timm_model_name,
                embed_dim=c.embed_dim,
                image_size=v.image_size,
                pool=v.timm_pool,
                proj=v.timm_proj,
                proj_bias=v.timm_proj_bias,
                drop=v.timm_drop,
                drop_path=v.timm_drop_path,
                dtype=self.dtype,
                use_flash=self.use_flash,
                remat=self.remat,
                remat_policy=self.remat_policy,
                name="visual",
            )
            self._setup_text(act)
            return
        if isinstance(v.layers, (tuple, list)):
            # ModifiedResNet dispatch (reference model.py _build_vision_tower:
            # tuple layer counts select the legacy ResNet tower)
            from .modified_resnet import ModifiedResNet

            self.visual = ModifiedResNet(
                layers=tuple(v.layers),
                output_dim=c.embed_dim,
                heads=v.width * 32 // 64,
                image_size=v.image_size,
                width=v.width,
                dtype=self.dtype,
                name="visual",
            )
            self._setup_text(act)
            return
        self.visual = VisionTransformer(
            image_size=v.image_size,
            patch_size=v.patch_size,
            width=v.width,
            layers=v.layers,
            num_heads=v.heads,
            mlp_ratio=v.mlp_ratio,
            output_dim=c.embed_dim,
            ls_init_value=v.ls_init_value,
            patch_dropout_prob=v.patch_dropout,
            no_ln_pre=v.no_ln_pre,
            pos_embed_type=v.pos_embed_type,
            pool_type=v.pool_type,
            class_token=v.class_token,
            patch_bias=v.patch_bias,
            no_proj=v.no_proj,
            final_ln_after_pool=v.final_ln_after_pool,
            attentional_pool=v.attentional_pool,
            attn_pooler_heads=v.attn_pooler_heads,
            add_zero_attn=v.add_zero_attn,
            act_fn=act,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            use_flash=self.use_flash,
            fuse_ln=self.fuse_ln,
            name="visual",
        )
        self._setup_text(act)

    def _setup_text(self, act):
        c = self.cfg
        t = c.text_cfg
        if t.hf_model_name or t.hf_model_config:
            from .hf_model import build_hf_text_tower

            self.text = build_hf_text_tower(
                t, c.embed_dim, dtype=self.dtype, name="text"
            )
            self._setup_tail()
            return
        self.text = TextTransformer(
            context_length=t.context_length,
            vocab_size=t.vocab_size,
            width=t.width,
            num_heads=t.heads,
            layers=t.layers,
            mlp_ratio=t.mlp_ratio,
            output_dim=c.embed_dim,
            ls_init_value=t.ls_init_value,
            no_causal_mask=t.no_causal_mask,
            pool_type=t.pool_type,
            proj_bias=t.proj_bias,
            embed_cls=t.embed_cls,
            pad_id=t.pad_id,
            attentional_pool=t.attentional_pool,
            attn_pooler_heads=t.attn_pooler_heads,
            add_zero_attn=t.add_zero_attn,
            act_fn=act,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            use_flash=self.use_flash,
            fuse_ln=self.fuse_ln,
            name="text",
        )
        self._setup_tail()

    def _setup_tail(self):
        c = self.cfg
        v, t = c.vision_cfg, c.text_cfg
        self.logit_scale = self.param(
            "logit_scale", _logit_scale_init(c.init_logit_scale), (), jnp.float32
        )
        if self.cosmos:
            self.distill_logit_scale = self.param(
                "distill_logit_scale",
                _logit_scale_init(c.init_logit_scale),
                (),
                jnp.float32,
            )
        else:
            self.distill_logit_scale = None
        if c.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias", _logit_scale_init(c.init_logit_bias), (), jnp.float32
            )
        else:
            self.logit_bias = None
        self.output_all = v.output_all
        if self.output_all:
            assert v.output_all == t.output_all
            self.image_token_mapping = nn.Dense(
                c.embed_dim, dtype=self.dtype, name="image_token_mapping"
            )
            self.text_token_mapping = nn.Dense(
                c.embed_dim, dtype=self.dtype, name="text_token_mapping"
            )

    # --- encoders (inference surface, model.py:303-339) -------------------

    def encode_image(
        self, images: jax.Array, normalize: bool = False, csa: bool = False
    ) -> Dict[str, jax.Array]:
        pooled, tokens = self.visual(images, csa=csa)
        out = {"image_features": l2_normalize(pooled) if normalize else pooled}
        if self.output_all:
            out["image_tokens"] = self.image_token_mapping(tokens)
        else:
            out["image_tokens_raw"] = tokens
        return out

    def encode_text(
        self, text: jax.Array, normalize: bool = False
    ) -> Dict[str, jax.Array]:
        pooled, tokens = self.text(text)
        out = {"text_features": l2_normalize(pooled) if normalize else pooled}
        if self.output_all:
            out["text_tokens"] = self.text_token_mapping(tokens)
        return out

    def get_logits(self, images: jax.Array, text: jax.Array):
        img = self.encode_image(images, normalize=True)["image_features"]
        txt = self.encode_text(text, normalize=True)["text_features"]
        logits_per_image = jnp.exp(self.logit_scale) * img @ txt.T
        if self.logit_bias is not None:
            logits_per_image = logits_per_image + self.logit_bias
        return logits_per_image, logits_per_image.T

    # --- full forward ------------------------------------------------------

    def _bucketed_text_pooled(self, toks: jax.Array,
                              l_short: int) -> jax.Array:
        """Pooled text features for caption views that need no token
        outputs, with the shortest 3/4 run at ``l_short`` when every one
        of them fits (row order of ``toks`` preserved).

        Exact by construction: truncating a caption at >= eot+1 keeps its
        argmax-EOT position (dropped trailing values are never larger
        than the max) and, under the causal mask, positions <= eot attend
        only to positions <= eot — so the pooled feature equals the
        full-length forward (up to float reassociation, since the GEMM
        shapes change).  A batch whose sorted short bucket does
        NOT fit falls back to the full length via nn.cond (same values,
        one branch executed on device)."""
        n = toks.shape[0]
        eot = jnp.argmax(toks, axis=-1).astype(jnp.int32)
        order = jnp.argsort(eot)                       # stable
        ns = (n * 3) // 4
        short_idx, long_idx = order[:ns], order[ns:]
        # sorted ascending: the short bucket's max EOT is its last entry
        fits = eot[short_idx[-1]] + 1 <= l_short
        short_toks = jnp.take(toks, short_idx, axis=0)

        # remat the branches: lax.cond's AD stores the UNION of both
        # branches' residuals (zero-filled for the untaken one), which
        # costs MORE activation memory than the unbucketed forward (OOM
        # at batch 48 on v5e, 19.6G vs 15.75G HBM).  Rematting collapses
        # the cond residuals to the operands; the short-bucket text
        # forward is recomputed in the backward (~2% of step FLOPs).
        def _trunc(mdl, t):
            return mdl.text(t[:, :l_short])[0]

        def _full(mdl, t):
            return mdl.text(t)[0]

        f_short = nn.cond(fits, nn.remat(_trunc), nn.remat(_full),
                          self, short_toks)
        f_long = self.text(jnp.take(toks, long_idx, axis=0))[0]
        feats = jnp.concatenate([f_short, f_long], axis=0)
        inv = jnp.argsort(order)                       # undo the sort
        return jnp.take(feats, inv, axis=0)

    def __call__(
        self,
        global_images: Optional[jax.Array] = None,   # [2B, H, W, 3] views-major
        texts: Optional[jax.Array] = None,           # [kB, 77] views-major
        local_images: Optional[jax.Array] = None,    # [nB, h, w, 3] or None
        batch_size: Optional[int] = None,
    ) -> Dict[str, jax.Array]:
        """COSMOS training forward (model.py:348-408).

        With batch_size=None this acts like the teacher/eval forward:
        features are normalized and no cross-modal heads run.
        """
        out: Dict[str, jax.Array] = {"logit_scale": jnp.exp(self.logit_scale)}
        if self.distill_logit_scale is not None:
            out["distill_logit_scale"] = jnp.exp(self.distill_logit_scale)
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias

        is_norm = not (self.output_all and batch_size is not None)

        img_features = img_tokens = None
        if global_images is not None:
            g_pooled, g_tokens = self.visual(global_images)
            feats = [g_pooled]
            if local_images is not None and local_images.size:
                l_pooled, _ = self.visual(local_images)
                feats.append(l_pooled)
            img_features = jnp.concatenate(feats, axis=0)
            if self.output_all:
                # only global-crop tokens are kept (MultiCropWrap keeps the
                # first resolution group's tokens, model.py:430-431)
                img_tokens = self.image_token_mapping(g_tokens)
            if is_norm:
                img_features = l2_normalize(img_features)

        txt_features = txt_tokens = None
        if texts is not None:
            b_ = batch_size if batch_size is not None else 0
            bucket = (
                self.text_bucket > 0
                and b_ > 0
                # globals (views 0-1: teacher targets + the pooler's token
                # context) stay full-length; need >= 1 extra view to bucket
                and texts.shape[0] >= 3 * b_
                and texts.shape[0] % b_ == 0
                and self.text_bucket < texts.shape[1]
                # the exactness argument needs causal attention + argmax
                # pooling — ONE shared gate with the eval-side EOT
                # slicing (TextCfg.eot_truncation_exact)
                and self.cfg.text_cfg.eot_truncation_exact
                and texts.shape[0] - 2 * b_ >= 4
            )
            if bucket:
                head, rest = texts[: 2 * b_], texts[2 * b_:]
                head_features, t_tokens = self.text(head)
                rest_features = self._bucketed_text_pooled(
                    rest, self.text_bucket)
                txt_features = jnp.concatenate(
                    [head_features, rest_features], axis=0)
            else:
                txt_features, t_tokens = self.text(texts)
            if self.output_all:
                # bucketed: token features exist for the 2 global views
                # only — all any consumer reads (the pooler uses [:B])
                txt_tokens = self.text_token_mapping(t_tokens)
            if is_norm:
                txt_features = l2_normalize(txt_features)

        # reference gate: `self.cosmos and batch_size is not None`
        # (model.py:355-360) — a non-cosmos output_all model must return
        # UNnormalized features with no crossmodal keys, not silently run
        # the poolers
        run_crossmodal = (
            self.cosmos
            and batch_size is not None
            and self.output_all
        )
        if run_crossmodal:
            assert getattr(self.visual, "attn_cross_pool", None) is not None, (
                "cosmos forward needs the cross-attention poolers: build "
                "with attentional_pool=True (reference asserts the same)"
            )
            assert img_features is not None and txt_features is not None
            b = batch_size
            img_num = img_features.shape[0] // b
            txt_num = txt_features.shape[0] // b

            # kv context: first global crop's patch tokens / first global
            # caption's tokens.  The reference tiles the context V× and runs
            # V*B single-query attentions (torch .repeat(V,1,1),
            # model.py:366-387); LN and the kv projection commute with that
            # tile, so grouping the V view-queries of each sample into one
            # [B, V, D] attention is bit-equivalent math while the kv
            # LN/projection work and the [V*B, L, D] HBM materialization
            # shrink by V×.
            def _pool(pooler, ctx, queries, v):
                q = queries.reshape(v, b, -1).transpose(1, 0, 2)  # [B, V, D]
                out = pooler(ctx, q)                              # [B, V, D]
                return out.transpose(1, 0, 2).reshape(v * b, -1)

            txt_pooled = _pool(
                self.text.attn_cross_pool, txt_tokens[:b], img_features, img_num
            )
            img_crossmodal = l2_normalize(img_features + txt_pooled)

            img_pooled = _pool(
                self.visual.attn_cross_pool, img_tokens[:b], txt_features, txt_num
            )
            txt_crossmodal = l2_normalize(txt_features + img_pooled)

            out["img_crossmodal_features"] = img_crossmodal
            out["txt_crossmodal_features"] = txt_crossmodal
            img_features = l2_normalize(img_features)
            txt_features = l2_normalize(txt_features)

        out["image_features"] = img_features
        out["text_features"] = txt_features
        if img_tokens is not None:
            out["image_tokens"] = img_tokens
        if txt_tokens is not None:
            out["text_tokens"] = txt_tokens
        return out
