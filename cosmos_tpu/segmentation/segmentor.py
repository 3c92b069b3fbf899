"""Open-vocabulary semantic segmentation with a CLIP/COSMOS encoder.

Parity target: /root/reference/src/training/clip_segmentor.py (an mmseg
BaseSegmentor there; a standalone class here — no mmseg):
  - prompt-ensembled query features: 80 OpenAI templates per query word,
    per-template normalize -> mean -> renorm (:129-139);
  - multi-synonym class files: one line per class, comma-separated
    synonyms each becoming a query; predictions max-merge over synonyms
    (get_cls_idx :306-317, postprocess :253-262);
  - forward_feature (:155-183): patch tokens (optionally via SCLIP CSA
    attention in the last block) @ proj -> normalize -> @ query featsᵀ ->
    bilinear upsample to the window;
  - sliding-window inference 224² windows, stride 112 (:185-230);
  - optional PAMR refinement on the full-resolution logits (:226-228);
  - postprocessing: x logit_scale, softmax over queries, synonym
    max-merge, area threshold pruning, prob threshold -> background
    (:253-284).

TPU design: forward_feature is one jitted function per (window, n_query)
shape; the slide loop runs on host and feeds windows in FIXED-SIZE
zero-padded chunks (``window_chunk``) — per-image window counts vary
with aspect ratio, and a raw variable-length batch would recompile the
encoder per distinct count.  One compiled executable serves every
benchmark image.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_tpu.segmentation.pamr import pamr

logger = logging.getLogger(__name__)

_ASSETS = Path(__file__).resolve().parent.parent / "assets"


def load_seg_classnames(benchmark: str) -> List[str]:
    banks = json.loads((_ASSETS / "seg_classnames.json").read_text())
    return banks[benchmark]


def get_cls_idx(name_lines: Sequence[str]) -> Tuple[List[str], List[int]]:
    """Split synonym lines into (query_words, class_index_per_query)."""
    words: List[str] = []
    idx: List[int] = []
    for i, line in enumerate(name_lines):
        names = [n.strip() for n in line.split(",")]
        words.extend(names)
        idx.extend([i] * len(names))
    return words, idx


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """align_corners=False bilinear (torch F.interpolate default), NHWC."""
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[3]), method="bilinear"
    )


class CLIPSegmentor:
    def __init__(
        self,
        model,
        params: Dict,
        tokenizer,
        name_lines: Sequence[str],
        *,
        logit_scale: float = 40.0,
        prob_thd: float = 0.0,
        area_thd: Optional[float] = None,
        slide_stride: int = 112,
        slide_crop: int = 224,
        pamr_steps: int = 0,
        pamr_stride: Sequence[int] = (8, 16),
        use_csa: bool = False,
        image_mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073),
        image_std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711),
        window_chunk: int = 8,
    ):
        self.model = model
        self.params = params
        self.query_words, query_idx = get_cls_idx(name_lines)
        self.query_idx = np.asarray(query_idx)
        self.num_queries = len(self.query_words)
        self.num_classes = int(self.query_idx.max()) + 1
        self.logit_scale = logit_scale
        self.prob_thd = prob_thd
        self.area_thd = area_thd
        self.slide_stride = slide_stride
        self.slide_crop = slide_crop
        self.pamr_steps = pamr_steps
        self.pamr_stride = tuple(pamr_stride)
        self.use_csa = use_csa
        self.window_chunk = window_chunk
        self.mean = np.asarray(image_mean, np.float32)
        self.std = np.asarray(image_std, np.float32)

        # prompt-ensembled query features (clip_segmentor.py:129-139)
        from cosmos_tpu.training.zero_shot import (
            build_zero_shot_classifier,
            load_imagenet_metadata,
        )

        templates = load_imagenet_metadata()["templates"]

        @jax.jit
        def enc_text(tokens):
            out = model.apply(
                {"params": params}, tokens, method=model.encode_text
            )
            return out["text_features"]

        # EOT-sliced prompt encoding (exact for the native causal tower;
        # seg models are COSMOS checkpoints = native text towers, but the
        # shared gate keeps any HF/SigLIP-towered config correct)
        from cosmos_tpu.training.zero_shot import supports_eot_truncation

        eot_trunc = supports_eot_truncation(model)
        self.query_features = np.asarray(
            build_zero_shot_classifier(
                enc_text, tokenizer, self.query_words, templates,
                num_classes_per_batch=8, eot_truncate=eot_trunc,
            ).T
        )  # [Q, D]

        self._forward_feature = jax.jit(self._forward_feature_impl)

    # --- device side ------------------------------------------------------

    def _forward_feature_impl(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] normalized -> per-patch query logits
        [B, gh, gw, Q] (clip_segmentor.py:155-178)."""
        variables = {"params": self.params}
        pooled, tokens = self.model.apply(
            variables, images, self.use_csa, method=lambda m, im, csa:
            m.visual(im, csa=csa)
        )
        proj = self.params["visual"]["proj"]
        feats = tokens.astype(jnp.float32) @ proj.astype(jnp.float32)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        logits = feats @ jnp.asarray(self.query_features).T  # [B, N, Q]
        b, n, q = logits.shape
        patch = self.model.cfg.vision_cfg.patch_size
        gh = images.shape[1] // patch
        gw = images.shape[2] // patch
        return logits.reshape(b, gh, gw, q)

    # --- host-side orchestration -----------------------------------------

    def _normalize(self, image_u8: np.ndarray) -> np.ndarray:
        x = image_u8.astype(np.float32) / 255.0
        return (x - self.mean) / self.std

    def forward_slide(self, image_u8: np.ndarray) -> np.ndarray:
        """Sliding-window logits over one [H, W, 3] uint8 image ->
        [H, W, Q] float32 (clip_segmentor.py:185-230)."""
        crop, stride = self.slide_crop, self.slide_stride
        img = self._normalize(image_u8)[None]  # [1, H, W, 3]
        h_img, w_img = img.shape[1:3]
        pad_h = max(crop - h_img, 0)
        pad_w = max(crop - w_img, 0)
        if pad_h or pad_w:
            img = np.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        H, W = img.shape[1:3]
        h_grids = max(H - crop + stride - 1, 0) // stride + 1
        w_grids = max(W - crop + stride - 1, 0) // stride + 1

        preds = np.zeros((H, W, self.num_queries), np.float32)
        count = np.zeros((H, W, 1), np.float32)
        # batch all windows into one device call
        windows = []
        coords = []
        for hi in range(h_grids):
            for wi in range(w_grids):
                y2 = min(hi * stride + crop, H)
                x2 = min(wi * stride + crop, W)
                y1, x1 = y2 - crop, x2 - crop
                windows.append(img[0, y1:y2, x1:x2])
                coords.append((y1, x1))
        # fixed-size window chunks (last one zero-padded): the window
        # count varies per image aspect ratio, and feeding the raw [Nw]
        # batch to the jitted forward would recompile the full encoder
        # for every distinct Nw across a benchmark — minutes of compile
        # per new shape.  Chunking keeps ONE compiled executable (the
        # module docstring's design contract); padded rows are dropped
        # before accumulation.
        stack = np.stack(windows)
        nw = stack.shape[0]
        ch = self.window_chunk
        parts = []
        for i0 in range(0, nw, ch):
            chunk = stack[i0:i0 + ch]
            n = chunk.shape[0]
            if n < ch:
                chunk = np.concatenate(
                    [chunk, np.zeros((ch - n,) + chunk.shape[1:],
                                     chunk.dtype)])
            lg = self._forward_feature(jnp.asarray(chunk))
            parts.append(np.asarray(resize_bilinear(lg, (crop, crop)))[:n])
        logits = np.concatenate(parts)
        for (y1, x1), lg in zip(coords, logits):
            preds[y1 : y1 + crop, x1 : x1 + crop] += lg
            count[y1 : y1 + crop, x1 : x1 + crop] += 1.0
        preds /= count
        return preds[:h_img, :w_img]

    def predict(self, image_u8: np.ndarray,
                ori_shape: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """Full prediction for one image -> [H_ori, W_ori] int labels."""
        if self.slide_crop > 0:
            logits = self.forward_slide(image_u8)
        else:
            img = self._normalize(image_u8)[None]
            logits = np.asarray(
                resize_bilinear(
                    self._forward_feature(jnp.asarray(img)),
                    image_u8.shape[:2],
                )
            )[0]
        ori = ori_shape or image_u8.shape[:2]
        logits_j = jnp.asarray(logits)[None]
        if logits_j.shape[1:3] != tuple(ori):
            logits_j = resize_bilinear(logits_j, tuple(ori))
        if self.pamr_steps > 0:
            img_r = resize_bilinear(
                jnp.asarray(self._normalize(image_u8))[None], tuple(ori)
            )
            logits_j = pamr(
                img_r, logits_j, num_iter=self.pamr_steps,
                dilations=self.pamr_stride,
            )
        return self.postprocess(np.asarray(logits_j[0]))

    def postprocess(self, seg_logits: np.ndarray) -> np.ndarray:
        """[H, W, Q] -> [H, W] labels (clip_segmentor.py:253-284)."""
        x = seg_logits * self.logit_scale
        x = x - x.max(axis=-1, keepdims=True)
        e = np.exp(x)
        probs = e / e.sum(axis=-1, keepdims=True)     # softmax over queries

        if self.num_classes != self.num_queries:
            # synonym max-merge
            merged = np.zeros(
                probs.shape[:2] + (self.num_classes,), probs.dtype
            )
            for cls in range(self.num_classes):
                cols = np.nonzero(self.query_idx == cls)[0]
                merged[..., cls] = probs[..., cols].max(axis=-1)
            probs = merged

        if self.area_thd is not None:
            # prune tiny non-background segments (clip_segmentor.py:265-271)
            pred = probs.argmax(-1)
            onehot = np.eye(self.num_classes, dtype=probs.dtype)[pred]
            area = onehot[..., 1:].sum(axis=(0, 1))
            keep = (area > self.area_thd * area.sum()).astype(probs.dtype)
            probs[..., 1:] *= keep

        pred = probs.argmax(-1)
        pred[probs.max(-1) < self.prob_thd] = 0
        return pred.astype(np.int32)
