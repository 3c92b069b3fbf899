"""Shared torch->flax key/layout mapping helpers for the timm-family
checkpoint converters (timm_model.py, convnext.py, eva.py)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def np_(v) -> np.ndarray:
    """Coerce a checkpoint value to numpy — handles torch tensors that
    np.asarray alone would reject (requires_grad / non-CPU) as well as
    plain array-likes.  The ONE coercion used by every converter."""
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def t_(x) -> np.ndarray:
    """torch Linear weight [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np_(x).T)


def ln_(sd: Dict[str, Any], p: str) -> Dict[str, np.ndarray]:
    """torch LayerNorm '<p>.weight/bias' -> flax {'scale','bias'}."""
    return {"scale": np_(sd[f"{p}.weight"]),
            "bias": np_(sd[f"{p}.bias"])}


def dense_(sd: Dict[str, Any], p: str, bias: bool = True) -> Dict[str, np.ndarray]:
    """torch Linear '<p>.weight[/bias]' -> flax {'kernel'[,'bias']}."""
    out = {"kernel": t_(sd[f"{p}.weight"])}
    if bias:
        out["bias"] = np_(sd[f"{p}.bias"])
    return out


def cvnets_block(sd: Dict[str, Any], b: str) -> Dict[str, Any]:
    """CVNets/Apple TransformerEncoder block ('<b>.pre_norm_mha.{0,1}',
    '<b>.pre_norm_ffn.{0,1,4}', qkv_proj/out_proj naming; reference
    convert.py:154-180 key map) -> resblock param subtree.  ONE mapping
    shared by the MobileCLIP text converter (convert.py) and the
    MobileCLIP-B hybrid-ViT trunk converter (timm_model.py) so a fix to
    either key map cannot miss the other."""
    return {
        "ln_1": ln_(sd, f"{b}.pre_norm_mha.0"),
        "ln_2": ln_(sd, f"{b}.pre_norm_ffn.0"),
        "attn": {
            "in_proj_kernel": t_(sd[f"{b}.pre_norm_mha.1.qkv_proj.weight"]),
            "in_proj_bias": np_(sd[f"{b}.pre_norm_mha.1.qkv_proj.bias"]),
            "out_proj": dense_(sd, f"{b}.pre_norm_mha.1.out_proj"),
        },
        "mlp": {
            "c_fc": dense_(sd, f"{b}.pre_norm_ffn.1"),
            "c_proj": dense_(sd, f"{b}.pre_norm_ffn.4"),
        },
    }
