"""OpenAI CLIP checkpoint loading.

Parity target: /root/reference/src/open_clip/openai.py:24-90 and
model.py:575-655 build_model_from_openai_state_dict: infer the
architecture from state-dict tensor shapes (ViT vs ResNet, widths,
layers, context length, vocab) and load the weights.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def config_from_openai_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Infer a model config dict from an OpenAI/open_clip state dict
    (model.py:575-610 shape probing)."""
    get = lambda k: np.asarray(sd[k])
    vit = "visual.proj" in sd
    if vit:
        vision_width = get("visual.conv1.weight").shape[0]
        vision_layers = len(
            [k for k in sd if re.fullmatch(r"visual\.transformer\.resblocks\.\d+\.attn\.in_proj_weight", k)]
        )
        patch_size = get("visual.conv1.weight").shape[-1]
        grid = int((get("visual.positional_embedding").shape[0] - 1) ** 0.5)
        image_size = grid * patch_size
        vision_cfg = {
            "image_size": int(image_size),
            "patch_size": int(patch_size),
            "width": int(vision_width),
            "layers": int(vision_layers),
            "head_width": 64 if vision_width % 64 == 0 else int(vision_width),
        }
    else:
        # ModifiedResNet (reference model.py:583-592 shape probing)
        counts = [
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4)
        ]
        vision_width = get("visual.layer1.0.conv1.weight").shape[0]
        output_width = int(round(
            (get("visual.attnpool.positional_embedding").shape[0] - 1) ** 0.5
        ))
        vision_cfg = {
            "image_size": int(output_width * 32),
            "width": int(vision_width),
            "layers": tuple(int(c) for c in counts),
        }
    embed_dim = get("text_projection").shape[1]
    context_length = get("positional_embedding").shape[0]
    vocab_size = get("token_embedding.weight").shape[0]
    text_width = get("ln_final.weight").shape[0]
    text_heads = max(1, text_width // 64)
    text_layers = len(
        [k for k in sd if re.fullmatch(r"transformer\.resblocks\.\d+\.attn\.in_proj_weight", k)]
    )
    return {
        "embed_dim": int(embed_dim),
        "quick_gelu": True,  # OpenAI models use QuickGELU
        "vision_cfg": vision_cfg,
        "text_cfg": {
            "context_length": int(context_length),
            "vocab_size": int(vocab_size),
            "width": int(text_width),
            "heads": int(text_heads),
            "layers": int(text_layers),
        },
    }


def list_openai_models():
    """Model names with an 'openai' pretrained tag (openai.py:20-24)."""
    from .pretrained import list_pretrained_models_by_tag

    return list_pretrained_models_by_tag("openai")


def load_openai_model(path: str, precision: str = "fp32"):
    """Torch .pt (jit archive or plain state dict) -> (model, params)."""
    import torch

    from cosmos_tpu.models.checkpoint import torch_state_dict_to_params
    from cosmos_tpu.models.clip import CLIP
    from cosmos_tpu.models.config import (
        CLIPCfg,
        TextCfg,
        VisionCfg,
        _filter_fields,
    )
    from cosmos_tpu.models.factory import init_model_params, resolve_dtype

    try:
        jit_model = torch.jit.load(path, map_location="cpu")
        sd = jit_model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj

    raw = config_from_openai_state_dict(sd)
    cfg = CLIPCfg(
        embed_dim=raw["embed_dim"],
        vision_cfg=VisionCfg(**_filter_fields(VisionCfg, raw["vision_cfg"])),
        text_cfg=TextCfg(**_filter_fields(TextCfg, raw["text_cfg"])),
        quick_gelu=True,
    )
    model = CLIP(cfg=cfg, dtype=resolve_dtype(precision))
    params = init_model_params(model)
    params = torch_state_dict_to_params(sd, params)
    return model, params
