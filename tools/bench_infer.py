"""Inference throughput: jitted CLIP encoders at serving batch sizes.

Measures image-encode and text-encode throughput for the flagship
ViT-B-16 on the local chip(s) — the serving-side companion to the
training bench (bench.py stays the driver's one-line contract).

Usage: python tools/bench_infer.py [model] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cosmos_tpu.models.factory import create_model

    name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B-16"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    model, params = create_model(name, precision="bf16")

    img_fn = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=model.encode_image)["image_features"])
    txt_fn = jax.jit(lambda p, t: model.apply(
        {"params": p}, t, method=model.encode_text)["text_features"])

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), jnp.float32)
    txts = jnp.asarray(rng.integers(1, 49407, size=(b, 77)), jnp.int32)

    results = {}
    for tag, fn, x in (("image", img_fn, imgs), ("text", txt_fn, txts)):
        out = fn(params, x)
        float(out[0, 0])          # compile + sync through the relay
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, x)
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        results[f"{tag}_per_sec"] = round(b / dt, 1)
        results[f"{tag}_ms_per_batch"] = round(dt * 1e3, 2)
    print(json.dumps({"model": name, "batch": b, **results}))


if __name__ == "__main__":
    main()
