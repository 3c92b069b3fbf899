"""cosmos_tpu — a TPU-native COSMOS/CLIP vision-language pre-training framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of the reference
COSMOS trainer (an OpenCLIP v2.24 fork): multi-crop + text-crop augmented
CLIP pre-training with an EMA teacher and cross-modality self-distillation,
plus zero-shot retrieval / classification / open-vocabulary segmentation
evaluation.  The public surface mirrors ``open_clip``'s
(/root/reference/src/open_clip/__init__.py:1-16).
"""

__version__ = "0.1.0"

from cosmos_tpu.models.factory import (  # noqa: F401
    create_model,
    create_model_and_transforms,
    create_loss,
    get_tokenizer,
)
from cosmos_tpu.models.config import (  # noqa: F401
    CLIPCfg,
    VisionCfg,
    TextCfg,
    list_models,
    get_model_config,
)
from cosmos_tpu.models.clip import CLIP  # noqa: F401
