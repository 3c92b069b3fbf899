"""timm vision-tower adapter (stub).

Parity target: /root/reference/src/open_clip/timm_model.py:28-152 — a timm
trunk + pool/proj head with group-wise locking.  timm is torch-only and
is not present in this environment; TPU-native equivalents of the timm
trunks used by open_clip configs (convnext, eva, siglip vits) would each
need a flax port.  This stub preserves the factory surface and raises a
clear error; ViT/ResNet towers are covered natively by
cosmos_tpu.models.vit / modified_resnet.
"""

from __future__ import annotations


class TimmModel:
    def __init__(self, model_name: str, **kwargs):
        raise NotImplementedError(
            f"timm trunk {model_name!r}: timm is torch-only and unavailable "
            "here. Use the native ViT (vision_cfg width/layers/patch_size) "
            "or ModifiedResNet towers; contributions of flax ports of "
            "specific timm trunks plug in via this adapter."
        )
