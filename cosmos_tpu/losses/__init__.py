from cosmos_tpu.losses.contrastive import (  # noqa: F401
    ClipLoss,
    COSMOSLoss,
    CoCaLoss,
    DistillClipLoss,
    SigLipLoss,
)
