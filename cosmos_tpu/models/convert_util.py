"""Shared torch->flax key/layout mapping helpers for the timm-family
checkpoint converters (timm_model.py, convnext.py, eva.py)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t_(x) -> np.ndarray:
    """torch Linear weight [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(x).T)


def ln_(sd: Dict[str, Any], p: str) -> Dict[str, np.ndarray]:
    """torch LayerNorm '<p>.weight/bias' -> flax {'scale','bias'}."""
    return {"scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"])}


def dense_(sd: Dict[str, Any], p: str, bias: bool = True) -> Dict[str, np.ndarray]:
    """torch Linear '<p>.weight[/bias]' -> flax {'kernel'[,'bias']}."""
    out = {"kernel": t_(sd[f"{p}.weight"])}
    if bias:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out
