"""Open-vocabulary segmentation evaluation entry point.

Parity target: /root/reference/src/seg_eval.py:33-56 — pick the benchmark
list by --seg-w-background, build the segmentor per config (teacher
weights by default, clip_segmentor.py:103-109), run sliding-window
inference over the val set, report mIoU per benchmark.

Usage: python -m cosmos_tpu.training.seg_eval --model ViT-B-16 \
           --pretrained <ckpt.pt> [--seg-w-background] [--use-csa] \
           [--seg-data-root /path] [--benchmarks voc20,ade20k] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from typing import Dict

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser("cosmos_tpu segmentation eval")
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--pretrained", default="")
    p.add_argument("--huggingface-model-name", default="")
    p.add_argument("--huggingface-repo-name", default="sankim2/cosmos")
    p.add_argument("--precision", default="fp32")
    p.add_argument("--use-csa", action="store_true", default=False)
    p.add_argument("--seg-w-background", action="store_true", default=False)
    p.add_argument("--benchmarks", default="",
                   help="comma list overriding the background split")
    p.add_argument("--seg-data-root", default=None,
                   help="root replacing each benchmark's default data_root")
    p.add_argument("--pamr-steps", type=int, default=0)
    p.add_argument("--pamr-stride", type=str, default="8,16")
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N images (smoke)")
    p.add_argument("--student", action="store_true", default=False,
                   help="use student weights instead of the teacher")
    p.add_argument("--use-ema-model", action="store_true", default=True,
                   help="reference alias (its clip_segmentor.py:81); the "
                        "EMA teacher is already the default here — pass "
                        "--student for the online model")
    # tri-state (BooleanOptionalAction): --no-output-all etc. let a plain
    # non-COSMOS CLIP checkpoint build without the cross-modal heads —
    # store_true with default=True had no off-spelling at all
    p.add_argument("--output-all", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--attentional-pool",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--add-zero-attn", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--cosmos", action=argparse.BooleanOptionalAction,
                   default=True)
    return p.parse_args(argv)


def load_model_for_seg(args):
    """Build the model and load weights ONCE — benchmarks differ only in
    classnames/thresholds, so per-benchmark rebuilds (and re-downloads)
    were pure waste."""
    from cosmos_tpu.models.checkpoint import load_checkpoint
    from cosmos_tpu.models.factory import create_model, get_tokenizer

    model, params = create_model(
        args.model,
        precision=args.precision,
        cosmos=args.cosmos,
        output_all=args.output_all,
        attentional_pool=args.attentional_pool,
        add_zero_attn=args.add_zero_attn,
    )
    ckpt = args.pretrained
    if args.huggingface_model_name:
        from cosmos_tpu.models.pretrained import download_pretrained_from_hf

        ckpt = download_pretrained_from_hf(
            args.huggingface_repo_name, args.huggingface_model_name
        )
    if ckpt:
        which = "student" if args.student else "teacher"
        params = load_checkpoint(model, params, ckpt, which=which)
    tokenizer = get_tokenizer(args.model)
    return model, params, tokenizer


def build_segmentor(args, bench, loaded=None):
    from cosmos_tpu.segmentation import CLIPSegmentor, load_seg_classnames

    model, params, tokenizer = loaded or load_model_for_seg(args)
    return CLIPSegmentor(
        model,
        params,
        tokenizer,
        load_seg_classnames(bench.classnames_key),
        logit_scale=bench.logit_scale,
        prob_thd=bench.prob_thd,
        area_thd=bench.area_thd,
        pamr_steps=args.pamr_steps,
        pamr_stride=tuple(int(x) for x in args.pamr_stride.split(",")),
        use_csa=args.use_csa,
    )


def evaluate_benchmark(args, bench, data_root=None,
                       loaded=None) -> Dict[str, float]:
    from cosmos_tpu.segmentation import IoUMetric, SegDataset

    seg = build_segmentor(args, bench, loaded)
    ds = SegDataset(bench, data_root=data_root, limit=args.limit)
    metric = IoUMetric(num_classes=seg.num_classes)
    t0 = time.time()
    for i in range(len(ds)):
        image, label = ds[i]
        pred = seg.predict(image, ori_shape=label.shape[:2])
        metric.update(pred, label)
        if (i + 1) % 200 == 0:
            logger.info(f"{bench.name}: {i+1}/{len(ds)} images "
                        f"({(i+1)/(time.time()-t0):.2f} img/s)")
    out = metric.compute()
    logger.info(f"{bench.name}: {out}")
    return out


def main(argv=None) -> Dict[str, Dict[str, float]]:
    from cosmos_tpu.segmentation import (
        SEG_BENCHMARKS,
        WITH_BACKGROUND,
        WITHOUT_BACKGROUND,
    )
    from cosmos_tpu.training.logger import setup_logging

    args = parse_args(argv)
    setup_logging()
    if args.benchmarks:
        names = [b.strip() for b in args.benchmarks.split(",") if b.strip()]
    else:
        names = list(WITH_BACKGROUND if args.seg_w_background
                     else WITHOUT_BACKGROUND)
    results = {}
    loaded = load_model_for_seg(args)
    for name in names:
        bench = SEG_BENCHMARKS[name]
        try:
            results[name] = evaluate_benchmark(
                args, bench, args.seg_data_root, loaded
            )
        except FileNotFoundError as e:
            logger.error(f"{name}: dataset missing ({e}); skipping")
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
