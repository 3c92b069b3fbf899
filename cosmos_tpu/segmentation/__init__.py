from cosmos_tpu.segmentation.segmentor import CLIPSegmentor, load_seg_classnames  # noqa: F401
from cosmos_tpu.segmentation.pamr import pamr  # noqa: F401
from cosmos_tpu.segmentation.metrics import IoUMetric  # noqa: F401
from cosmos_tpu.segmentation.configs import (  # noqa: F401
    SEG_BENCHMARKS,
    WITH_BACKGROUND,
    WITHOUT_BACKGROUND,
    SegBenchmark,
)
from cosmos_tpu.segmentation.dataset import SegDataset  # noqa: F401
