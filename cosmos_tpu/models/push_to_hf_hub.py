"""Export / publish weights to the HuggingFace hub.

Parity target: /root/reference/src/open_clip/push_to_hf_hub.py —
save_for_hf (:63): weights + open_clip-style config json; push_to_hf_hub
(:90): create repo + upload; generate_readme model card (:213).

Weights are exported in the reference's torch .pt format (via the
params->torch converter) so they stay loadable by open_clip users, plus
the native flax .msgpack.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger(__name__)

HF_WEIGHTS_NAME = "open_clip_pytorch_model.bin"
HF_FLAX_WEIGHTS_NAME = "open_clip_model.msgpack"
HF_CONFIG_NAME = "open_clip_config.json"


# config fields that exist only in this package (TPU-native SigLIP/HF
# plumbing); the reference's CLIPVisionCfg/CLIPTextCfg constructors
# (model.py:28-96) reject unknown kwargs, so exporting them would make
# the published open_clip_config.json unloadable by open_clip itself —
# the audience this file exists for.  (This repo's own loader filters
# unknown keys, which is why a naive round-trip test can't catch it.)
_REPO_ONLY_VISION = ("class_token", "patch_bias", "no_proj")
_REPO_ONLY_TEXT = ("hf_model_config",)


def save_config_for_hf(model, config_path: str,
                       preprocess_cfg: Optional[Dict] = None) -> None:
    vision_cfg = {
        k: v for k, v in dataclasses.asdict(model.cfg.vision_cfg).items()
        if k not in _REPO_ONLY_VISION
    }
    text_cfg = {
        k: v for k, v in dataclasses.asdict(model.cfg.text_cfg).items()
        if k not in _REPO_ONLY_TEXT and v is not None
    }
    cfg = {
        "model_cfg": {
            "embed_dim": model.cfg.embed_dim,
            "vision_cfg": vision_cfg,
            "text_cfg": text_cfg,
            "quick_gelu": model.cfg.quick_gelu,
        },
        "preprocess_cfg": preprocess_cfg
        or {
            "mean": (0.48145466, 0.4578275, 0.40821073),
            "std": (0.26862954, 0.26130258, 0.27577711),
            "size": model.cfg.vision_cfg.image_size,
        },
    }
    Path(config_path).write_text(json.dumps(cfg, indent=2))


def save_for_hf(model, params: Dict, save_directory: str,
                safe_serialization: bool = False) -> None:
    os.makedirs(save_directory, exist_ok=True)
    import torch

    from cosmos_tpu.models.checkpoint import params_to_torch_state_dict
    from cosmos_tpu.training.checkpoint import save_params_msgpack

    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in params_to_torch_state_dict(params).items()
    }
    torch.save(sd, os.path.join(save_directory, HF_WEIGHTS_NAME))
    save_params_msgpack(params, os.path.join(save_directory, HF_FLAX_WEIGHTS_NAME))
    # publish the model's ACTUAL preprocess settings (mean/std overrides,
    # resize mode) — hardcoding the OpenAI constants would make every hub
    # consumer normalize with the wrong statistics for non-OpenAI recipes
    from cosmos_tpu.models.factory import get_model_preprocess_cfg

    save_config_for_hf(model, os.path.join(save_directory, HF_CONFIG_NAME),
                       preprocess_cfg=get_model_preprocess_cfg(model))
    logger.info(f"saved HF export to {save_directory}")


def generate_readme(model_card: Dict, model_name: str) -> str:
    lines = ["---", "tags:", "- clip", "- cosmos-tpu",
             "library_name: open_clip", "---", "",
             f"# Model card for {model_name}", ""]
    if "description" in model_card:
        lines += [model_card["description"], ""]
    for section, text in model_card.get("sections", {}).items():
        lines += [f"## {section}", "", str(text), ""]
    return "\n".join(lines)


def push_to_hf_hub(
    model,
    params: Dict,
    repo_id: str,
    *,
    commit_message: str = "Add model",
    token: Optional[str] = None,
    private: bool = False,
    model_card: Optional[Dict] = None,
) -> str:
    from huggingface_hub import HfApi
    import tempfile

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        save_for_hf(model, params, tmp)
        (Path(tmp) / "README.md").write_text(
            generate_readme(model_card or {}, repo_id.split("/")[-1])
        )
        return api.upload_folder(
            repo_id=repo_id, folder_path=tmp, commit_message=commit_message
        )


def push_pretrained_to_hf_hub(
    model_name: str,
    pretrained: str,
    repo_id: str,
    *,
    precision: str = "fp32",
    commit_message: str = "Add model",
    token: Optional[str] = None,
    private: bool = False,
    model_card: Optional[Dict] = None,
    **model_kwargs,
) -> str:
    """Build ``model_name`` with ``pretrained`` weights, then push
    (reference push_to_hf_hub.py:160-199)."""
    from .factory import create_model

    model, params = create_model(
        model_name, pretrained=pretrained, precision=precision, **model_kwargs
    )
    return push_to_hf_hub(
        model, params, repo_id,
        commit_message=commit_message, token=token, private=private,
        model_card=model_card,
    )
