"""Int8 weight quantization for inference.

Parity target: /root/reference/src/open_clip/utils.py:66 replace_linear —
the reference swaps nn.Linear for bitsandbytes int8 modules at inference.
TPU-native version: per-output-channel symmetric int8 weights with f32
scales; the matmul runs int8 x int8 -> int32 on the MXU with activations
dynamically quantized per row.

Measured caveat (v5e, trace-timed): although the hardware's int8 peak is
2x bf16, this XLA-lowered path runs ~2x SLOWER than the plain bf16
matmul at CLIP shapes — the dynamic per-row activation quantization
(absmax reduce + scale + round) is not fused into the dot and XLA does
not emit the native int8 MXU path for it.  Use these ops for weight-only
compression/export (4x smaller checkpoints, dequantize-on-load), not for
serving-latency wins; accuracy loss is ~1% relative error per matmul.

API:
  quantize_weight(w)            -> (w_int8 [K,N], scale [N])
  int8_matmul(x, w_int8, scale) -> f32/bf16 [.., N]
  quantize_dense_params(params) -> params with {kernel -> kernel_int8 +
                                   scale} leaves swapped (for offline
                                   export / custom serving stacks)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of [K, N] weights."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)            # [N]
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-row symmetric int8 quantization of [.., K] activations."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(
    x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
    out_dtype=jnp.float32,
) -> jax.Array:
    """x [.., K] @ int8 weights [K, N] with int32 MXU accumulation."""
    xq, x_scale = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq, w_int8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


_QUANT_KEYS = ("kernel", "in_proj_kernel", "embedding", "proj",
               "text_projection_kernel")


def quantize_dense_params(params: Dict, min_size: int = 1 << 16) -> Dict:
    """Walk a param tree, replacing large 2-D float leaves with
    {name+'_int8', name+'_scale'} pairs (export-side utility)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif (
                k in _QUANT_KEYS
                and hasattr(v, "ndim")
                and v.ndim == 2
                and v.size >= min_size
            ):
                q, s = quantize_weight(v)
                out[k + "_int8"] = q
                out[k + "_scale"] = s
            else:
                out[k] = v
        return out

    return walk(params)


def dequantize_dense_params(params: Dict) -> Dict:
    """Inverse of quantize_dense_params: fold {name_int8, name_scale} pairs
    back into float kernels — the load side of weight-only int8 compression
    (the reference's replace_linear analog for a 4x-smaller checkpoint)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k.endswith("_int8"):
                base = k[: -len("_int8")]
                scale = node[base + "_scale"]
                out[base] = (v.astype(jnp.float32) * scale).astype(jnp.float32)
            elif k.endswith("_scale") and (k[: -len("_scale")] + "_int8") in node:
                continue
            else:
                out[k] = v
        return out

    return walk(params)


def quantized_bytes(params: Dict) -> Tuple[int, int]:
    """(bytes after int8 quantization, bytes at f32) for a param tree."""
    q = quantize_dense_params(params)
    after = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(q))
    before = sum(x.size * 4 for x in jax.tree.leaves(params))
    return after, before
