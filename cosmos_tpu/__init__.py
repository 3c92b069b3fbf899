"""cosmos_tpu — a TPU-native COSMOS/CLIP vision-language pre-training framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of the reference
COSMOS trainer (an OpenCLIP v2.24 fork): multi-crop + text-crop augmented
CLIP pre-training with an EMA teacher and cross-modality self-distillation,
plus zero-shot retrieval / classification / open-vocabulary segmentation
evaluation.  The public surface mirrors ``open_clip``'s
(/root/reference/src/open_clip/__init__.py:1-16).

Exports are lazy (PEP 562) so that data-loader worker processes can import
cosmos_tpu.data.* without pulling in jax (and with it the TPU runtime —
one chip cannot be claimed by several processes).
"""

__version__ = "0.4.0"

_LAZY = {
    # factory (reference factory.py exports)
    "create_model": ("cosmos_tpu.models.factory", "create_model"),
    "create_model_and_transforms": (
        "cosmos_tpu.models.factory",
        "create_model_and_transforms",
    ),
    "create_model_from_pretrained": (
        "cosmos_tpu.models.factory",
        "create_model_from_pretrained",
    ),
    "create_loss": ("cosmos_tpu.models.factory", "create_loss"),
    "get_tokenizer": ("cosmos_tpu.models.factory", "get_tokenizer"),
    "load_checkpoint": ("cosmos_tpu.models.checkpoint", "load_checkpoint"),
    # model classes / configs.  CLIPVisionCfg/CLIPTextCfg are the
    # reference's names (model.py:58-135); CustomTextCLIP is an alias —
    # this framework has ONE unified CLIP class (custom-text layout is
    # config-driven, models/config.py custom_text)
    "CLIP": ("cosmos_tpu.models.clip", "CLIP"),
    "CustomTextCLIP": ("cosmos_tpu.models.clip", "CLIP"),
    "CoCa": ("cosmos_tpu.models.coca", "CoCa"),
    "CLIPCfg": ("cosmos_tpu.models.config", "CLIPCfg"),
    "VisionCfg": ("cosmos_tpu.models.config", "VisionCfg"),
    "TextCfg": ("cosmos_tpu.models.config", "TextCfg"),
    "CLIPVisionCfg": ("cosmos_tpu.models.config", "VisionCfg"),
    "CLIPTextCfg": ("cosmos_tpu.models.config", "TextCfg"),
    "list_models": ("cosmos_tpu.models.config", "list_models"),
    "add_model_config": ("cosmos_tpu.models.config", "add_model_config"),
    "get_model_config": ("cosmos_tpu.models.config", "get_model_config"),
    # model utils (reference model.py exports)
    "convert_weights_to_lp": ("cosmos_tpu.utils", "convert_weights_to_lp"),
    "convert_weights_to_fp16": ("cosmos_tpu.utils", "convert_weights_to_fp16"),
    "trace_model": ("cosmos_tpu.models.trace", "trace_model"),
    "get_cast_dtype": ("cosmos_tpu.training.precision", "get_cast_dtype"),
    "get_input_dtype": ("cosmos_tpu.training.precision", "get_input_dtype"),
    "get_model_preprocess_cfg": (
        "cosmos_tpu.models.factory", "get_model_preprocess_cfg"),
    "set_model_preprocess_cfg": (
        "cosmos_tpu.models.factory", "set_model_preprocess_cfg"),
    "get_model_tokenize_cfg": (
        "cosmos_tpu.models.factory", "get_model_tokenize_cfg"),
    # openai loaders
    "load_openai_model": ("cosmos_tpu.models.openai", "load_openai_model"),
    "list_openai_models": ("cosmos_tpu.models.openai", "list_openai_models"),
    # pretrained registry
    "list_pretrained": ("cosmos_tpu.models.pretrained", "list_pretrained"),
    "list_pretrained_models_by_tag": (
        "cosmos_tpu.models.pretrained", "list_pretrained_models_by_tag"),
    "list_pretrained_tags_by_model": (
        "cosmos_tpu.models.pretrained", "list_pretrained_tags_by_model"),
    "get_pretrained_cfg": ("cosmos_tpu.models.pretrained", "get_pretrained_cfg"),
    "get_pretrained_url": ("cosmos_tpu.models.pretrained", "get_pretrained_url"),
    "is_pretrained_cfg": ("cosmos_tpu.models.pretrained", "is_pretrained_cfg"),
    "download_pretrained": (
        "cosmos_tpu.models.pretrained", "download_pretrained"),
    "download_pretrained_from_url": (
        "cosmos_tpu.models.pretrained", "download_pretrained_from_url"),
    # hub export
    "push_to_hf_hub": ("cosmos_tpu.models.push_to_hf_hub", "push_to_hf_hub"),
    "push_pretrained_to_hf_hub": (
        "cosmos_tpu.models.push_to_hf_hub", "push_pretrained_to_hf_hub"),
    # losses
    "ClipLoss": ("cosmos_tpu.losses", "ClipLoss"),
    "DistillClipLoss": ("cosmos_tpu.losses", "DistillClipLoss"),
    "COSMOSLoss": ("cosmos_tpu.losses", "COSMOSLoss"),
    "SigLipLoss": ("cosmos_tpu.losses", "SigLipLoss"),
    "CoCaLoss": ("cosmos_tpu.losses", "CoCaLoss"),
    # tokenizer
    "SimpleTokenizer": ("cosmos_tpu.data.tokenizer", "SimpleTokenizer"),
    "tokenize": ("cosmos_tpu.data.tokenizer", "tokenize"),
    "decode": ("cosmos_tpu.data.tokenizer", "decode"),
    # transforms + constants
    "image_transform": ("cosmos_tpu.data.transforms", "image_transform"),
    "AugmentationCfg": ("cosmos_tpu.data.transforms", "AugmentationCfg"),
    "OPENAI_DATASET_MEAN": ("cosmos_tpu.data.constants", "OPENAI_DATASET_MEAN"),
    "OPENAI_DATASET_STD": ("cosmos_tpu.data.constants", "OPENAI_DATASET_STD"),
    # zero-shot classifier + metadata
    "build_zero_shot_classifier": (
        "cosmos_tpu.training.zero_shot", "build_zero_shot_classifier"),
    "build_zero_shot_classifier_legacy": (
        "cosmos_tpu.training.zero_shot", "build_zero_shot_classifier_legacy"),
    "OPENAI_IMAGENET_TEMPLATES": (
        "cosmos_tpu.training.zero_shot", "OPENAI_IMAGENET_TEMPLATES"),
    "SIMPLE_IMAGENET_TEMPLATES": (
        "cosmos_tpu.training.zero_shot", "SIMPLE_IMAGENET_TEMPLATES"),
    "IMAGENET_CLASSNAMES": (
        "cosmos_tpu.training.zero_shot", "IMAGENET_CLASSNAMES"),
}

__all__ = list(_LAZY) + ["__version__"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'cosmos_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
