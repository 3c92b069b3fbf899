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
applying the fsdp spec to the dims tp left unsharded — not wired in yet;
``--fsdp`` currently requires a 1-D data mesh (validated in main.py).
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
    """Tree of NamedShardings implementing fsdp_spec over the mesh."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, fsdp_spec(leaf, n, min_size)),
        params,
    )


def shard_params_fsdp(params: Dict[str, Any], mesh: Mesh,
                      min_size: int = FSDP_MIN_SIZE):
    """Place a param tree onto the mesh with FSDP shardings."""
    return jax.tree.map(jax.device_put, params,
                        fsdp_param_shardings(params, mesh, min_size))
