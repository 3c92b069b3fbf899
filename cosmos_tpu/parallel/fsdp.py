"""FSDP / ZeRO-style parameter + optimizer-state sharding over 'data'.

BEYOND-reference scaling axis (the reference is DDP-only: every rank
holds a full replica of params, grads, Adam moments AND the EMA teacher
— 16+ bytes/param before activations).  Here each leaf above a size
threshold is sharded over the data axis; because the train step is
GSPMD-jitted (``make_train_step_gspmd``), XLA's SPMD partitioner derives
the ZeRO collectives from the placement alone:

  - forward/backward: per-layer all-gather of the weight shards (peak
    memory = one layer's full weights, not the model's),
  - gradients: reduce-scatter back to the shards,
  - optimizer + EMA update: runs sharded — Adam moments and the teacher
    copy never materialize unsharded anywhere.

Per-chip memory for the stateful tensors drops ~Nx on an N-way data
axis: params/grads/m/v/teacher all shard.  This is the TPU-native
equivalent of torch FSDP/ZeRO-3, expressed as ~40 lines of parameter
placement instead of a wrapper class hierarchy.

Composition: FSDP shards over 'data'; tensor parallelism
(``parallel/tp.py``) shards over 'model'.  They compose on a 2-D mesh by
applying the fsdp split to the dims tp left unsharded
(``fsdp_tp_spec`` below) — ``--fsdp --mesh-shape dp,tp`` trains with
params/moments/teacher sharded over BOTH axes (ZeRO-3 within each
model-parallel group, Megatron across it), the TPU spelling of
torch's FSDP(ShardingStrategy.HYBRID_SHARD)+TP composition.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# leaves smaller than this stay replicated: sharding a 768-float LN scale
# saves nothing and costs a collective; 64 KiB ~ the smallest tensor whose
# all-gather beats replication on ICI
FSDP_MIN_SIZE = 2 ** 16


def fsdp_spec(leaf, n_shards: int, min_size: int = FSDP_MIN_SIZE) -> P:
    """Shard the largest evenly-divisible dim of ``leaf`` over 'data'.

    Largest dim => most balanced shards and the fewest pad elements in
    XLA's tiled layout; leaves with no divisible dim (or too small to be
    worth a collective) replicate.
    """
    if leaf.ndim == 0 or leaf.size < min_size:
        return P()
    dims = sorted(range(leaf.ndim), key=lambda d: leaf.shape[d],
                  reverse=True)
    for d in dims:
        if leaf.shape[d] % n_shards == 0:
            spec: list = [None] * leaf.ndim
            spec[d] = DATA_AXIS
            return P(*spec)
    return P()


def fsdp_param_shardings(params: Dict[str, Any], mesh: Mesh,
                         min_size: int = FSDP_MIN_SIZE):
    """Tree of NamedShardings implementing fsdp_spec over the mesh.

    On a 2-D (data, model) mesh this is the FSDP x TP composition:
    every leaf first takes its Megatron placement (tp_spec), then its
    largest TP-unsharded dim is split over 'data'."""
    from .tp import MODEL_AXIS

    if MODEL_AXIS in mesh.shape:
        return fsdp_tp_param_shardings(params, mesh, min_size)
    n = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, fsdp_spec(leaf, n, min_size)),
        params,
    )


def fsdp_tp_spec(path, leaf, n_data: int, tp: int,
                 min_size: int = FSDP_MIN_SIZE) -> P:
    """Composed FSDP x TP placement for one leaf on a (data, model) mesh.

    Start from the Megatron spec (tp_spec); then shard the largest dim
    TP left unsharded over 'data' — ZeRO-3 within each model-parallel
    group.  The min-size guard applies to the PER-TP-SHARD size: a leaf
    already split tp ways may no longer be worth a second collective.
    """
    from .tp import tp_spec

    base = tp_spec(path, leaf)
    tp_used = any(ax is not None for ax in base)
    per_shard = leaf.size // (tp if tp_used else 1)
    if leaf.ndim == 0 or per_shard < min_size:
        return base
    spec = list(base) + [None] * (leaf.ndim - len(base))
    free = [d for d in range(leaf.ndim) if spec[d] is None]
    for d in sorted(free, key=lambda d: leaf.shape[d], reverse=True):
        if leaf.shape[d] % n_data == 0:
            spec[d] = DATA_AXIS
            return P(*spec)
    return base


def fsdp_tp_param_shardings(params: Dict[str, Any], mesh: Mesh,
                            min_size: int = FSDP_MIN_SIZE):
    """Tree of NamedShardings implementing fsdp_tp_spec over a 2-D mesh."""
    from .tp import MODEL_AXIS

    n = mesh.shape[DATA_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, fsdp_tp_spec(path, leaf, n, tp, min_size)),
        params,
    )


def shard_params_fsdp(params: Dict[str, Any], mesh: Mesh,
                      min_size: int = FSDP_MIN_SIZE):
    """Place a param tree onto the mesh with FSDP shardings."""
    return jax.tree.map(jax.device_put, params,
                        fsdp_param_shardings(params, mesh, min_size))
