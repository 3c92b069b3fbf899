"""Reorganize HF ImageNet val images into class folders.

Parity target: /root/reference/datasets/imagenet_organize.py:1-34 —
val_images/*.JPEG named ILSVRC2012_val_XXXXXXXX_nYYYYYYYY.JPEG move into
val_images/nYYYYYYYY/ subfolders (the layout ImageFolderDataset expects).

Usage: python tools/imagenet_organize.py --source-dir /path/val_images
"""

import argparse
import os
import shutil
from pathlib import Path


def organize(source_dir: str) -> int:
    src = Path(source_dir)
    moved = 0
    for f in sorted(src.glob("*.JPEG")):
        stem = f.stem  # ILSVRC2012_val_00000293_n01440764
        wnid = stem.split("_")[-1]
        if not wnid.startswith("n"):
            continue
        dest = src / wnid
        dest.mkdir(exist_ok=True)
        shutil.move(str(f), dest / f.name)
        moved += 1
    return moved


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-dir", required=True)
    args = ap.parse_args()
    n = organize(args.source_dir)
    print(f"moved {n} images into class folders")
