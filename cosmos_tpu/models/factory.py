"""Model factory — the public construction surface.

Mirrors /root/reference/src/open_clip/factory.py:
  - create_model (:185): name -> config -> model + initialized params,
    precision casting, optional checkpoint load.
  - create_model_and_transforms (:418): adds train/val preprocessing.
  - create_loss (:372): dispatches the loss by args (cosmos at :399-407).
  - get_tokenizer (:87), load_checkpoint (:147).

Unlike the reference (stateful nn.Module), creation returns a
``(module_def, params)`` pair: the Flax module is a pure function of the
params pytree, which is what the jitted train/eval steps consume.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .clip import CLIP
from .config import build_clip_cfg, get_model_config

logger = logging.getLogger(__name__)


def resolve_dtype(precision: str):
    """Map a precision flag (training/precision.py:5-12) to a compute dtype.

    On TPU there is no GradScaler: 'amp'/'fp16' map to bf16 compute with
    f32 params, which is the hardware-native mixed-precision mode.
    """
    if precision in ("fp32", "float32", "amp_bf16_grad_fp32"):
        return jnp.float32
    if precision in ("bf16", "pure_bf16", "amp", "amp_bf16", "amp_bfloat16", "fp16", "pure_fp16"):
        return jnp.bfloat16
    raise ValueError(f"unknown precision: {precision}")


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    *,
    cosmos: bool = False,
    output_all: bool = False,
    attentional_pool: bool = False,
    add_zero_attn: bool = False,
    grad_checkpointing: bool = False,
    remat_policy: str = "",
    use_flash: Optional[bool] = None,
    act_approx: bool = False,
    fuse_ln: bool = False,
    text_bucket: int = 0,
    force_quick_gelu: bool = False,
    force_patch_dropout: Optional[float] = None,
    force_image_size: Optional[int] = None,
    seed: int = 0,
    init_params: bool = True,
    **overrides: Any,
) -> Tuple[CLIP, Optional[Dict]]:
    if output_all:
        overrides["output_all"] = True
    if attentional_pool:
        overrides["attentional_pool"] = True
    if add_zero_attn:
        overrides["add_zero_attn"] = True
    if force_patch_dropout is not None:
        overrides["vision_patch_dropout"] = force_patch_dropout
    if force_image_size is not None:
        overrides["vision_image_size"] = force_image_size
    if pretrained and str(pretrained).lower() == "openai":
        # OpenAI-release towers use QuickGELU (the reference routes the
        # 'openai' tag through load_openai_model, which builds quick_gelu
        # models, factory.py:229-231) — loading them into erf-GELU towers
        # would silently corrupt every MLP activation
        force_quick_gelu = True
    cfg = build_clip_cfg(model_name, overrides)
    if force_quick_gelu:
        cfg = dataclasses.replace(cfg, quick_gelu=True)

    if cfg.multimodal_cfg is not None:
        # CoCa dispatch (reference factory.py:291-292); threads the same
        # remat/flash flags the CLIP branch does — they were silently
        # dropped before (grad_checkpointing off at the batch size chosen
        # assuming it was on, use_flash A/Bs ignored)
        from .coca import CoCa

        if cosmos:
            raise ValueError("--cosmos is a CLIP-model flag; CoCa configs "
                             "train through the CoCa loss path")
        model = CoCa(
            cfg=cfg,
            dtype=resolve_dtype(precision),
            remat=grad_checkpointing,
            remat_policy=remat_policy,
            use_flash=use_flash,
        )
    else:
        model = CLIP(
            cfg=cfg,
            cosmos=cosmos,
            dtype=resolve_dtype(precision),
            remat=grad_checkpointing,
            remat_policy=remat_policy,
            use_flash=use_flash,
            act_approx=act_approx,
            fuse_ln=fuse_ln,
            text_bucket=text_bucket,
        )
    params = None
    if init_params:
        params = init_model_params(model, seed=seed)
    if (
        params is not None
        and cfg.text_cfg.hf_model_name
        and cfg.text_cfg.hf_model_pretrained
        and not pretrained
    ):
        # the reference builds HF towers pretrained-by-default
        # (hf_model.py:106); an explicit `pretrained` checkpoint supersedes
        from .hf_model import load_hf_pretrained_params

        params = load_hf_pretrained_params(params, cfg.text_cfg.hf_model_name)
    if pretrained:
        from .checkpoint import load_checkpoint
        from .pretrained import resolve_pretrained

        path = resolve_pretrained(model_name, pretrained)
        params = load_checkpoint(model, params, path)
    return model, params


def init_model_params(model: CLIP, seed: int = 0) -> Dict:
    """Initialize params with dummy inputs (shapes only — uses eval_shape
    to pick static input sizes, real init on device)."""
    c = model.cfg
    v, t = c.vision_cfg, c.text_cfg
    images = jnp.zeros((1, v.image_size, v.image_size, 3), jnp.float32)
    texts = jnp.zeros((1, t.context_length), jnp.int32)
    if c.multimodal_cfg is not None:
        variables = jax.jit(model.init)(jax.random.PRNGKey(seed), images, texts)
        return variables["params"]
    if v.output_all and v.attentional_pool:
        # run the cross-modal branch once so the pooler params materialize
        variables = jax.jit(model.init, static_argnames=("batch_size",))(
            jax.random.PRNGKey(seed), images, texts, batch_size=1
        )
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(seed), images, texts)
    return variables["params"]


def pretrained_preprocess_defaults(
    model_name: str,
    pretrained: Optional[str],
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
) -> Dict[str, Any]:
    """Preprocess settings merged from the pretrained tag's registry entry
    (reference factory.py:329-330 merge_preprocess_dict of pretrained_cfg,
    transform.py:43-61): explicit arguments win, then the checkpoint's
    registry entry (e.g. MobileCLIP's identity mean/std + bilinear), then
    the OpenAI defaults."""
    from cosmos_tpu.data.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
    from .pretrained import get_pretrained_cfg

    pcfg = get_pretrained_cfg(model_name, pretrained) if pretrained else {}
    return {
        "mean": tuple(image_mean or pcfg.get("mean") or OPENAI_DATASET_MEAN),
        "std": tuple(image_std or pcfg.get("std") or OPENAI_DATASET_STD),
        "interpolation": pcfg.get("interpolation", "bicubic"),
        "resize_mode": pcfg.get("resize_mode", "shortest"),
    }


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    *,
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    aug_cfg: Optional[Dict[str, Any]] = None,
    use_imagecrop_aug: bool = False,
    local_crops_number: int = 6,
    global_crops_number: int = 2,
    crop_scale: float = 0.4,
    **kwargs: Any,
):
    from cosmos_tpu.data.transforms import (
        MulticropAugmentation,
        aug_cfg_to_dict,
        image_transform_eval,
        image_transform_train,
    )

    aug_cfg = aug_cfg_to_dict(aug_cfg)
    model, params = create_model(model_name, pretrained, precision, **kwargs)
    pp = pretrained_preprocess_defaults(model_name, pretrained,
                                        image_mean, image_std)
    mean, std = pp["mean"], pp["std"]
    image_size = model.cfg.vision_cfg.image_size
    set_model_preprocess_cfg(model, {"size": image_size, **pp})
    if use_imagecrop_aug:
        train_tf = MulticropAugmentation(
            mean=mean,
            std=std,
            image_size=image_size,
            local_crops_number=local_crops_number,
            global_crops_number=global_crops_number,
            crop_scale=crop_scale,
        )
    else:
        train_tf = image_transform_train(image_size, mean=mean, std=std,
                                         aug_cfg=aug_cfg)
    val_tf = image_transform_eval(image_size, mean=mean, std=std,
                                  interpolation=pp["interpolation"],
                                  resize_mode=pp["resize_mode"])
    return model, params, train_tf, val_tf


def create_model_from_pretrained(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    *,
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    return_transform: bool = True,
    **kwargs: Any,
):
    """Inference-oriented loader (reference factory.py:493-538): a model
    with pretrained weights plus the EVAL transform only.

    Returns ``(model, params, preprocess)`` — or ``(model, params)`` with
    ``return_transform=False``.  (The reference returns torch modules with
    weights inside; params are explicit here.)
    """
    from cosmos_tpu.data.transforms import image_transform_eval

    model, params = create_model(model_name, pretrained, precision, **kwargs)
    pp = pretrained_preprocess_defaults(model_name, pretrained,
                                        image_mean, image_std)
    set_model_preprocess_cfg(
        model, {"size": model.cfg.vision_cfg.image_size, **pp})
    if not return_transform:
        return model, params
    preprocess = image_transform_eval(
        model.cfg.vision_cfg.image_size,
        mean=pp["mean"],
        std=pp["std"],
        interpolation=pp["interpolation"],
        resize_mode=pp["resize_mode"],
    )
    return model, params, preprocess


# per-model preprocess overrides (reference model.py:746-753 mutates
# module attributes; flax modules are immutable AND unhashable dataclass
# instances, so the overrides live in an id-keyed side table whose
# entries die with the model via weakref.finalize)
_PREPROCESS_OVERRIDES: Dict[int, Dict[str, Any]] = {}


def get_model_preprocess_cfg(model) -> Dict[str, Any]:
    """Preprocess settings a checkpoint consumer needs (model.py:729-743)."""
    v = model.cfg.vision_cfg
    from cosmos_tpu.data.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

    cfg = {
        "size": v.image_size,
        "mode": "RGB",
        "mean": OPENAI_DATASET_MEAN,
        "std": OPENAI_DATASET_STD,
        "interpolation": "bicubic",
        "resize_mode": "shortest",
    }
    cfg.update(_PREPROCESS_OVERRIDES.get(id(model), {}))
    return cfg


def set_model_preprocess_cfg(model, preprocess_cfg: Dict[str, Any]):
    """Counterpart of model.py:746-753.  Records the checkpoint-carried
    preprocess settings for ``model`` (returned by
    get_model_preprocess_cfg); returns the model for chaining."""
    import weakref

    key = id(model)
    if key not in _PREPROCESS_OVERRIDES:
        weakref.finalize(model, _PREPROCESS_OVERRIDES.pop, key, None)
    _PREPROCESS_OVERRIDES[key] = dict(preprocess_cfg)
    return model


def get_model_tokenize_cfg(model) -> Dict[str, Any]:
    """Tokenizer geometry of a model (model.py:756-766)."""
    t = model.cfg.text_cfg
    return {"context_length": t.context_length, "vocab_size": t.vocab_size}


def create_loss(args):
    """Loss dispatch by trainer args (factory.py:372-407)."""
    from cosmos_tpu.losses import (
        ClipLoss,
        CoCaLoss,
        COSMOSLoss,
        DistillClipLoss,
        SigLipLoss,
    )

    if getattr(args, "cosmos", False):
        return COSMOSLoss(
            local_loss=args.local_loss,
            gather_with_grad=args.gather_with_grad,
        )
    if getattr(args, "siglip", False):
        return SigLipLoss()
    if getattr(args, "distill", False) or getattr(args, "distill_model", None):
        return DistillClipLoss(
            local_loss=args.local_loss,
            gather_with_grad=args.gather_with_grad,
        )
    if "coca" in getattr(args, "model", "").lower():
        return CoCaLoss(
            caption_loss_weight=args.coca_caption_loss_weight,
            clip_loss_weight=args.coca_contrastive_loss_weight,
            local_loss=args.local_loss,
            gather_with_grad=args.gather_with_grad,
        )
    return ClipLoss(
        local_loss=getattr(args, "local_loss", False),
        gather_with_grad=getattr(args, "gather_with_grad", True),
    )


def get_tokenizer(model_name: str = "", context_length: Optional[int] = None, **kwargs):
    """Tokenizer dispatch (reference factory.py:87-110): configs whose
    text_cfg names an HF tokenizer get HFTokenizer, else SimpleTokenizer."""
    from cosmos_tpu.data.tokenizer import HFTokenizer, SimpleTokenizer

    cfg = get_model_config(model_name) if model_name else None
    text_cfg = (cfg or {}).get("text_cfg", {})
    if context_length is None and cfg:
        context_length = text_cfg.get("context_length", 77)
    hf_tok = text_cfg.get("hf_tokenizer_name")
    if hf_tok:
        return HFTokenizer(hf_tok, context_length=context_length or 77,
                           **kwargs)
    return SimpleTokenizer(context_length=context_length or 77, **kwargs)
