"""Inference throughput: jitted CLIP encoders at serving batch sizes.

Measures image-encode and text-encode throughput for the flagship
ViT-B-16 on the local chip(s) — the serving-side companion to the
training bench (bench.py stays the driver's one-line contract).

Usage: python tools/bench_infer.py [model] [batch] [--int8] [--tp N]

--tp N serves tensor-parallel over an (n_devices/N, N) 2-D mesh
(parallel/tp.py: Megatron-style column/row-parallel weight placement,
collectives inserted by the XLA partitioner).  Needs N devices.  The
Pallas attention kernel stays ON: its custom_partitioning wrapper keeps
the batch sharding and re-gathers the feature columns around the call.

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

    args = sys.argv[1:]
    tp = 1
    if "--tp" in args:
        i = args.index("--tp")
        tp = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    argv = [a for a in args if a != "--int8"]
    use_int8 = "--int8" in args
    name = argv[0] if len(argv) > 0 else "ViT-B-16"
    b = int(argv[1]) if len(argv) > 1 else 256
    # the fused-attention kernel is custom_partitioning-wrapped, so TP
    # serving keeps it (batch-sharded, feature columns re-gathered)
    model, params = create_model(name, precision="bf16")

    if use_int8 and tp > 1:
        raise SystemExit("--int8 and --tp are mutually exclusive")
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

    tp_info = {}
    if tp > 1:
        from cosmos_tpu.parallel.tp import create_tp_mesh, make_tp_encoders

        mesh = create_tp_mesh(len(jax.devices()) // tp, tp)
        params, img_fn, txt_fn = make_tp_encoders(model, params, mesh)
        tp_info = {"mesh": f"{mesh.shape}"}
    else:
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
    print(json.dumps({"model": name, "batch": b, **results, **int8_info,
                      **tp_info}))


if __name__ == "__main__":
    main()
