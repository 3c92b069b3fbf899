"""Generate *_labelTrainIds.png annotations for Cityscapes eval.

Parity target: /root/reference/src/training/seg_configs/convert_cityscapes.py
(the mmseg-style converter): maps the raw gtFine labelIds (34 classes) to
the 19 trainIds used by the benchmark, 255 for ignore.

Usage: python tools/convert_cityscapes.py --gtfine-dir /path/gtFine
"""

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

# official cityscapes labelId -> trainId (ignore=255)
_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def convert(gtfine_dir: str) -> int:
    lut = np.full(256, 255, np.uint8)
    for k, v in _ID_TO_TRAIN.items():
        lut[k] = v
    n = 0
    for f in Path(gtfine_dir).rglob("*_gtFine_labelIds.png"):
        lab = np.asarray(Image.open(f))
        out = lut[lab]
        Image.fromarray(out).save(
            str(f).replace("_labelIds.png", "_labelTrainIds.png")
        )
        n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gtfine-dir", required=True)
    print(f"converted {convert(ap.parse_args().gtfine_dir)} label maps")
