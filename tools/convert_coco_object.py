"""Generate COCO-Object annotations from COCO-Stuff labelmaps.

Parity target: /root/reference/src/training/seg_configs/convert_coco_object.py:
COCO-Stuff 171-class labelmaps -> 81-class COCO-Object maps (background 0 +
80 thing classes; stuff classes collapse to background).

Usage: python tools/convert_coco_object.py --ann-dir .../annotations/val2017
"""

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

# COCO-Stuff ids 0..79 are the 80 thing classes; 80..170 are stuff.
# COCO-Object: 0 background, 1..80 things; 255 stays ignore.


def convert(ann_dir: str) -> int:
    lut = np.zeros(256, np.uint8)
    for i in range(80):
        lut[i] = i + 1
    lut[255] = 255
    n = 0
    for f in Path(ann_dir).glob("*_labelTrainIds.png"):
        lab = np.asarray(Image.open(f))
        Image.fromarray(lut[lab]).save(
            str(f).replace("_labelTrainIds.png", "_instanceTrainIds.png")
        )
        n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann-dir", required=True)
    print(f"converted {convert(ap.parse_args().ann_dir)} label maps")
