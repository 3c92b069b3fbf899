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

__version__ = "0.1.0"

_LAZY = {
    "create_model": ("cosmos_tpu.models.factory", "create_model"),
    "create_model_and_transforms": (
        "cosmos_tpu.models.factory",
        "create_model_and_transforms",
    ),
    "create_loss": ("cosmos_tpu.models.factory", "create_loss"),
    "get_tokenizer": ("cosmos_tpu.models.factory", "get_tokenizer"),
    "load_checkpoint": ("cosmos_tpu.models.checkpoint", "load_checkpoint"),
    "CLIP": ("cosmos_tpu.models.clip", "CLIP"),
    "CLIPCfg": ("cosmos_tpu.models.config", "CLIPCfg"),
    "VisionCfg": ("cosmos_tpu.models.config", "VisionCfg"),
    "TextCfg": ("cosmos_tpu.models.config", "TextCfg"),
    "list_models": ("cosmos_tpu.models.config", "list_models"),
    "get_model_config": ("cosmos_tpu.models.config", "get_model_config"),
    "list_pretrained": ("cosmos_tpu.models.pretrained", "list_pretrained"),
    "get_pretrained_cfg": ("cosmos_tpu.models.pretrained", "get_pretrained_cfg"),
    "ClipLoss": ("cosmos_tpu.losses", "ClipLoss"),
    "COSMOSLoss": ("cosmos_tpu.losses", "COSMOSLoss"),
    "SigLipLoss": ("cosmos_tpu.losses", "SigLipLoss"),
    "CoCaLoss": ("cosmos_tpu.losses", "CoCaLoss"),
    "SimpleTokenizer": ("cosmos_tpu.data.tokenizer", "SimpleTokenizer"),
    "tokenize": ("cosmos_tpu.data.tokenizer", "tokenize"),
    "decode": ("cosmos_tpu.data.tokenizer", "decode"),
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
