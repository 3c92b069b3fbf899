"""Build cosmos_tpu data assets from public upstream data files.

These are DATA assets (not code): the OpenAI CLIP byte-BPE merge table,
the OpenAI ImageNet prompt-template/classname sets, and the downstream
classification datasets' prompt/label banks.  They are transformed into
cosmos_tpu's own formats:

  assets/bpe_merges.json.gz      — JSON list of merge pairs
  assets/imagenet_zeroshot.json  — {"classnames": [...], "templates":
                                    [fmt strings with {} placeholder],
                                    "simple_templates": [...]}
  assets/classification_banks.json — {"templates": {ds: [...]},
                                      "labels": {ds: [...]}}

Usage: python tools/build_assets.py [--reference /root/reference]
"""

import argparse
import gzip
import json
import os
import sys
from pathlib import Path

ASSETS = Path(__file__).resolve().parent.parent / "cosmos_tpu" / "assets"


def build_bpe(reference: Path) -> None:
    src = reference / "src/open_clip/bpe_simple_vocab_16e6.txt.gz"
    merges = gzip.open(src).read().decode("utf-8").split("\n")
    # first line is a version header; the tokenizer uses merges
    # [1 : 49152-256-2+1] (reference tokenizer.py:145)
    merges = merges[1: 49152 - 256 - 2 + 1]
    pairs = [m.split() for m in merges]
    assert all(len(p) == 2 for p in pairs), "malformed merge table"
    out = ASSETS / "bpe_merges.json.gz"
    with gzip.open(out, "wt", encoding="utf-8") as f:
        json.dump(pairs, f, ensure_ascii=False)
    print(f"wrote {out} ({len(pairs)} merges)")


def build_imagenet_zeroshot(reference: Path) -> None:
    # zero_shot_metadata.py is pure data (template lambdas + classnames);
    # exec it standalone and recover the format strings by applying each
    # template to the literal placeholder "{}".
    ns: dict = {}
    src = (reference / "src/open_clip/zero_shot_metadata.py").read_text()
    exec(src, ns)  # noqa: S102 - trusted local data module, no imports
    out = {
        "classnames": list(ns["IMAGENET_CLASSNAMES"]),
        "templates": [t("{}") for t in ns["OPENAI_IMAGENET_TEMPLATES"]],
        "simple_templates": [t("{}") for t in ns["SIMPLE_IMAGENET_TEMPLATES"]],
    }
    path = ASSETS / "imagenet_zeroshot.json"
    path.write_text(json.dumps(out, ensure_ascii=False))
    print(f"wrote {path} ({len(out['classnames'])} classes, "
          f"{len(out['templates'])} templates)")


def build_classification_banks(reference: Path) -> None:
    templates = json.loads((reference / "src/dataloaders/templates.json").read_text())
    labels = json.loads((reference / "src/dataloaders/label.json").read_text())
    out = {"templates": templates, "labels": labels}
    path = ASSETS / "classification_banks.json"
    path.write_text(json.dumps(out, ensure_ascii=False))
    print(f"wrote {path} ({len(templates)} template sets, {len(labels)} label sets)")


def build_seg_classnames(reference: Path) -> None:
    """Class-name (+synonym) files for the 8 segmentation benchmarks."""
    seg_dir = reference / "src/training/seg_configs"
    out = {}
    for f in sorted(seg_dir.glob("cls_*.txt")):
        lines = [ln.rstrip("\n") for ln in f.read_text().splitlines() if ln.strip()]
        out[f.stem[len("cls_"):]] = lines
    path = ASSETS / "seg_classnames.json"
    path.write_text(json.dumps(out, ensure_ascii=False))
    print(f"wrote {path} ({len(out)} benchmarks)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference", type=Path)
    args = ap.parse_args()
    ASSETS.mkdir(parents=True, exist_ok=True)
    build_bpe(args.reference)
    build_imagenet_zeroshot(args.reference)
    build_classification_banks(args.reference)
    build_seg_classnames(args.reference)


if __name__ == "__main__":
    main()
