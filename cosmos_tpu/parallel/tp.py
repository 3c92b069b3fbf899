"""Tensor-parallel serving: 2-D (data, model) GSPMD sharding for encoders.

The reference scales only by data parallelism (SURVEY §2.3 — DP is its
single model-scaling axis), which this package mirrors for training.
This module adds the "optional pjit 2-D mesh" upgrade for SERVING and
eval of towers too big or too latency-bound for one chip (EVA02-L+,
ViT-H): Megatron-style tensor parallelism expressed purely as parameter
placement — column-parallel input projections (kernel ``[D, K]`` ->
``P(None, 'model')``, bias sharded on its feature axis), row-parallel
output projections (kernel ``[K, D]`` -> ``P('model', None)``, bias
replicated so it adds once after the implicit psum).  XLA's SPMD
partitioner inserts the Megatron f/g collectives automatically from the
annotations; no model code changes.

Caveats, stated honestly:
  - The packed-QKV layout means a contiguous column split of
    ``in_proj_kernel [D, 3D]`` is head-aligned only per third; the
    partitioner re-shards around the head reshape.  Correctness is
    GSPMD-guaranteed either way; peak efficiency on a real pod may want
    head-aligned sharding (tp dividing num_heads).
  - The Pallas fused-attention kernel IS partitionable (round 4): it is
    wrapped in jax.experimental.custom_partitioning with a batch-sharded
    / feature-replicated contract, so under a real model axis the
    partitioner all-gathers the qkv columns in front of the kernel and
    keeps the batch sharding through it (ops/fused_attention.py
    ``_fwd_partitioned``).  TP encoders and the GSPMD train step
    therefore keep the kernel — no ``use_flash=False`` required.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"

# param names whose kernel is column-parallel (output-feature split) /
# row-parallel (input-feature split).  Covers the native towers
# (transformer/vit/text), the timm-ViT adapter, and the EVA02 trunk.
_COL_KERNELS = ("c_fc", "q", "kv", "q_proj", "k_proj", "v_proj",
                "w1", "w2", "head_fc1")
_ROW_KERNELS = ("c_proj", "out_proj", "out", "w3", "head_fc2")
# (the packed attn/in_proj_kernel [D, 3D] is the named special case in
# tp_spec — its bias shards like a column-parallel output)


def create_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """(dp, tp) device mesh with axes ('data', 'model').

    When the mesh spans all devices, the grid comes from
    ``mesh_utils.create_device_mesh`` so the (minor) model axis lands on
    physically adjacent chips — Megatron's f/g all-reduces then ride
    single-hop ICI links instead of whatever order ``jax.devices()``
    happens to enumerate.  An explicit ``devices`` list or a sub-mesh
    keeps the caller's ordering (tests pin device identity that way).
    """
    devs = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devs):
        raise ValueError(
            f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devs)}")
    if devices is None and dp * tp == len(devs):
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh((dp, tp), devices=devs)
            return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
        except Exception:  # unknown topology: positional order still works
            pass
    grid = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_spec(path, leaf) -> P:
    """PartitionSpec for one param leaf under Megatron-style TP."""
    names = [p.key for p in path if hasattr(p, "key")]
    last = names[-1] if names else ""
    if leaf.ndim == 0:
        return P()
    if last == "in_proj_kernel":
        return P(None, MODEL_AXIS)
    if last == "in_proj_bias":
        return P(MODEL_AXIS)
    parent = names[-2] if len(names) >= 2 else ""
    if parent in _COL_KERNELS:
        if last == "kernel" and leaf.ndim == 2:
            return P(None, MODEL_AXIS)
        if last == "bias":
            return P(MODEL_AXIS)
    if parent in _ROW_KERNELS:
        if last == "kernel" and leaf.ndim == 2:
            return P(MODEL_AXIS, None)
        if last == "bias":
            return P()          # added once, after the row-parallel psum
    # embeddings, LN scales/biases, pos embeds, projections, logit scales:
    # replicated — they are small relative to the matmul weights
    return P()


def tp_param_shardings(params: Dict[str, Any], mesh: Mesh):
    """Tree of NamedShardings implementing tp_spec over the mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf)), params
    )


def shard_params_tp(params: Dict[str, Any], mesh: Mesh):
    """Place a param tree onto the 2-D mesh with TP shardings."""
    shardings = tp_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def make_tp_encoders(model, params, mesh: Mesh) -> Tuple[Any, Any, Any]:
    """(sharded_params, enc_image, enc_text): GSPMD-jitted normalized
    encoders with weights tensor-parallel over 'model' and the batch over
    'data'.  The model must expose encode_image/encode_text (CLIP surface).
    """
    param_shardings = tp_param_shardings(params, mesh)
    sharded = jax.tree.map(jax.device_put, params, param_shardings)
    batch_in = NamedSharding(mesh, P(DATA_AXIS))
    out_sh = NamedSharding(mesh, P(DATA_AXIS))

    def _enc_image(p, images):
        out = model.apply({"params": p}, images, True,
                          method=model.encode_image)
        return out["image_features"]

    def _enc_text(p, tokens):
        out = model.apply({"params": p}, tokens, True,
                          method=model.encode_text)
        return out["text_features"]

    jit_image = jax.jit(_enc_image,
                        in_shardings=(param_shardings, batch_in),
                        out_shardings=out_sh)
    jit_text = jax.jit(_enc_text,
                       in_shardings=(param_shardings, batch_in),
                       out_shardings=out_sh)

    dp = mesh.shape.get(DATA_AXIS, 1)

    def _padded(fn):
        # P(data) placement needs even shards; serving callers feed
        # arbitrary batch sizes — pad to a data-axis multiple, slice back
        def call(p, x):
            import jax.numpy as jnp

            n = x.shape[0]
            pad = (-n) % dp
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            out = fn(p, x)
            return out[:n] if pad else out
        return call

    return sharded, _padded(jit_image), _padded(jit_text)
