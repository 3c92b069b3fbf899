"""Inference throughput: jitted CLIP encoders at serving batch sizes.

Measures image-encode and text-encode throughput for the flagship
ViT-B-16 on the local chip(s) — the serving-side companion to the
training bench (bench.py stays the driver's one-line contract).

Usage: python tools/bench_infer.py [model] [batch] [--int8]

--int8 serves from weight-only int8-compressed params (the reference's
bitsandbytes replace_linear analog, utils.py:66-88): every large Dense
kernel is quantized to int8 + per-channel scales (4x smaller checkpoint)
and dequantized at load.  Reports the compressed size and the embedding
drift vs the f32 weights alongside throughput.  The int8-compute matmul
path (ops.int8_matmul) is deliberately NOT used for serving: measured 2x
slower than bf16 through XLA on v5e (see ops/int8.py docstring).
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

    argv = [a for a in sys.argv[1:] if a != "--int8"]
    use_int8 = "--int8" in sys.argv[1:]
    name = argv[0] if len(argv) > 0 else "ViT-B-16"
    b = int(argv[1]) if len(argv) > 1 else 256
    model, params = create_model(name, precision="bf16")

    int8_info = {}
    if use_int8:
        from cosmos_tpu.ops.int8 import (
            dequantize_dense_params,
            quantize_dense_params,
        )

        q = quantize_dense_params(params)   # quantize ONCE: sizes + roundtrip
        after = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(q))
        before = sum(x.size * 4 for x in jax.tree.leaves(params))
        f32_params = params
        params = dequantize_dense_params(q)
        int8_info = {
            "int8_ckpt_mb": round(after / 1e6, 1),
            "f32_ckpt_mb": round(before / 1e6, 1),
        }

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
    if use_int8:
        # embedding drift of the compressed weights (cosine sim to f32)
        ref = img_fn(f32_params, imgs)
        got = img_fn(params, imgs)
        cos = jnp.sum(ref * got, -1) / (
            jnp.linalg.norm(ref, axis=-1) * jnp.linalg.norm(got, axis=-1)
        )
        int8_info["image_embed_cos_vs_f32"] = round(float(cos.mean()), 5)
    print(json.dumps({"model": name, "batch": b, **results, **int8_info}))


if __name__ == "__main__":
    main()
