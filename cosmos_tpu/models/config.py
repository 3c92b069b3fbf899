"""Model architecture configs.

Mirrors the reference's JSON config registry
(/root/reference/src/open_clip/factory.py:34-56 scans model_configs/*.json
into _MODEL_CONFIGS; dataclasses CLIPVisionCfg/CLIPTextCfg in model.py:58-135).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

_CONFIG_DIR = Path(__file__).parent / "configs"


@dataclasses.dataclass
class VisionCfg:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    # int -> ViT depth; tuple/list of 4 -> ModifiedResNet stage counts
    # (reference model.py:58-66 CLIPVisionCfg.layers Union[Tuple,int])
    layers: Any = 12
    head_width: int = 64
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    add_zero_attn: bool = False
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"
    final_ln_after_pool: bool = False
    pool_type: str = "tok"
    output_all: bool = False
    # SigLIP-family vision options (no CLS token, biased patch embed,
    # MAP pooling head, width == embed_dim so no final projection)
    class_token: bool = True
    patch_bias: bool = False
    no_proj: bool = False
    # timm-trunk vision tower (reference model.py:53-62 CLIPVisionCfg
    # timm_* fields; dispatched at model.py:132).  Here the trunk is the
    # native VisionTransformer built in timm-ViT configuration — no timm
    # dependency; weights load via models.timm_model.convert_timm_vit.
    timm_model_name: Optional[str] = None
    timm_pool: str = "avg"            # 'avg' | 'token'
    timm_proj: str = "linear"         # 'linear' | 'mlp' | 'none'
    timm_proj_bias: bool = False
    timm_drop: float = 0.0
    timm_drop_path: float = 0.0       # stochastic depth (ConvNeXt trunks)

    @property
    def heads(self) -> int:
        return self.width // self.head_width


@dataclasses.dataclass
class TextCfg:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    attentional_pool: bool = False
    attn_pooler_heads: int = 8
    add_zero_attn: bool = False
    embed_cls: bool = False
    pad_id: int = 0
    no_causal_mask: bool = False
    final_ln_after_pool: bool = False
    pool_type: str = "argmax"
    proj_bias: bool = False
    output_all: bool = False
    # HF text tower (reference model.py CLIPTextCfg hf_* fields; wired via
    # factory.py:87-110).  hf_model_config: offline dict with 'model_type'
    # + config kwargs, used instead of fetching hf_model_name.
    hf_model_name: Optional[str] = None
    hf_tokenizer_name: Optional[str] = None
    hf_model_pretrained: bool = True
    hf_proj_type: Optional[str] = None
    hf_pooler_type: Optional[str] = None
    hf_model_config: Optional[Dict[str, Any]] = None

    @property
    def eot_truncation_exact(self) -> bool:
        """THE gate for EOT-slicing this tower's text inputs — shared by
        the training-side --text-bucket (models/clip.py) and the eval-side
        truncate_to_eot (training/zero_shot.py), so the exactness rule
        cannot drift between them.  Truncating a caption at >= eot+1
        preserves its pooled feature iff attention is causal and pooling
        is argmax-EOT: HF towers (bidirectional / CLS pooling), embed_cls
        towers, and SigLIP-style towers (no_causal_mask / last-pool) must
        encode at full context."""
        return (not self.hf_model_name
                and not self.embed_cls
                and not self.no_causal_mask
                and self.pool_type == "argmax")


@dataclasses.dataclass
class MultimodalCfg:
    """CoCa multimodal text decoder config (reference coca_model.py:38-50)."""
    context_length: int = 76
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    attn_pooler_heads: int = 8


@dataclasses.dataclass
class CLIPCfg:
    embed_dim: int = 512
    vision_cfg: VisionCfg = dataclasses.field(default_factory=VisionCfg)
    text_cfg: TextCfg = dataclasses.field(default_factory=TextCfg)
    multimodal_cfg: Optional[MultimodalCfg] = None
    quick_gelu: bool = False
    init_logit_scale: float = 2.6592600175  # ln(1/0.07)
    init_logit_bias: Optional[float] = None
    custom_text: bool = False


def _filter_fields(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


# runtime-registered configs (reference factory.py:77-84 add_model_config)
_EXTRA_CONFIGS: Dict[str, Dict[str, Any]] = {}


def list_models() -> list:
    names = {p.stem for p in _CONFIG_DIR.glob("*.json")}
    names.update(_EXTRA_CONFIGS)
    return sorted(names)


def add_model_config(path) -> None:
    """Register model config JSON file(s) at runtime (factory.py:77-84):
    a single ``<name>.json`` file or a directory of them."""
    from pathlib import Path

    p = Path(path)
    files = sorted(p.glob("*.json")) if p.is_dir() else [p]
    for f in files:
        with open(f) as fh:
            _EXTRA_CONFIGS[f.stem] = json.load(fh)


def get_model_config(name: str) -> Optional[Dict[str, Any]]:
    key = name.replace("/", "-")
    if key in _EXTRA_CONFIGS:
        return dict(_EXTRA_CONFIGS[key])
    path = _CONFIG_DIR / f"{key}.json"
    if not path.exists():
        return None
    with open(path) as f:
        return json.load(f)


def build_clip_cfg(
    model_name: str,
    overrides: Optional[Dict[str, Any]] = None,
) -> CLIPCfg:
    """Load a named JSON config and apply runtime overrides.

    Mirrors factory.py:246-289 where argparse flags (--attentional-pool,
    --add-zero-attn, --output-all, ...) are merged into the config dicts.
    """
    raw = get_model_config(model_name)
    if raw is None:
        raise ValueError(
            f"Model config for {model_name} not found; available: {list_models()}"
        )
    raw = dict(raw)
    overrides = overrides or {}
    vision_d = dict(raw.get("vision_cfg", {}))
    text_d = dict(raw.get("text_cfg", {}))
    mm_d = raw.get("multimodal_cfg")
    for key, val in overrides.items():
        if key in ("attentional_pool", "add_zero_attn", "output_all"):
            vision_d[key] = val
            text_d[key] = val
        elif key.startswith("vision_"):
            vision_d[key[len("vision_"):]] = val
        elif key.startswith("text_"):
            text_d[key[len("text_"):]] = val
        else:
            raw[key] = val
    return CLIPCfg(
        embed_dim=raw["embed_dim"],
        vision_cfg=VisionCfg(**_filter_fields(VisionCfg, vision_d)),
        text_cfg=TextCfg(**_filter_fields(TextCfg, text_d)),
        multimodal_cfg=(
            MultimodalCfg(**_filter_fields(MultimodalCfg, mm_d)) if mm_d else None
        ),
        quick_gelu=raw.get("quick_gelu", False),
        init_logit_scale=raw.get("init_logit_scale", CLIPCfg.init_logit_scale),
        init_logit_bias=raw.get("init_logit_bias"),
        custom_text=raw.get("custom_text", False),
    )
