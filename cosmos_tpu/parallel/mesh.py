"""Device mesh setup and multihost initialization.

TPU-native replacement for /root/reference/src/training/distributed.py:
  - init_distributed_device (:63-117, NCCL process groups) →
    jax.distributed.initialize + a jax.sharding.Mesh over all devices.
  - rank/world discovery from env (:44-61) → jax.process_index/count.
  - broadcast_object / all_gather_object (:120-140) →
    jax.experimental.multihost_utils.

The data axis rides ICI within a slice; across slices (multislice) the
same axis spans DCN — the contrastive gather stays correct either way, and
the local-loss form keeps per-device logit rows [B_local, B_global].
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
# multislice: the leading mesh axis that crosses DCN (slice boundaries);
# DATA_AXIS then rides ICI within each slice
SLICE_AXIS = "slice"


def data_axes(mesh: Mesh):
    """The mesh axes the batch dim shards over: ('slice','data') on a
    multislice mesh, ('data',) otherwise."""
    return ((SLICE_AXIS, DATA_AXIS) if SLICE_AXIS in mesh.shape
            else (DATA_AXIS,))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX if needed; returns (process_id, num_processes).

    Env-driven like the reference's world discovery: honors
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata when
    running under a TPU pod runtime (jax.distributed handles that itself).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    # ORDER MATTERS: jax.distributed.initialize must run before ANY call
    # that initializes the XLA backend — including jax.process_count().
    # The previous `and jax.process_count() == 1` guard initialized the
    # backend while evaluating itself, making initialize() always raise;
    # is_initialized() checks the distributed client without touching
    # the backend.
    if coordinator_address and not jax.distributed.is_initialized():
        if num_processes is None:
            num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
        if process_id is None:
            # explicit 0 is a valid rank — do not `or` it away
            process_id = int(os.environ.get("PROCESS_ID", "0"))
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def broadcast_object(obj, max_bytes: int = 1 << 16):
    """Pickle-broadcast a small host object from process 0 (the
    reference's broadcast_object, distributed.py:120-131).

    Used where every process must agree on a host-side DECISION made
    from filesystem state — e.g. which checkpoint '--resume latest'
    picked: independent per-process discovery races a concurrent save
    and silently restores different epochs on different hosts.
    """
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    data = pickle.dumps(obj) if jax.process_index() == 0 else b""
    if len(data) > max_bytes:
        raise ValueError(
            f"broadcast_object payload {len(data)}B exceeds {max_bytes}B")
    buf = np.zeros(max_bytes + 8, np.uint8)
    if jax.process_index() == 0:
        buf[:8] = np.frombuffer(len(data).to_bytes(8, "little"), np.uint8)
        buf[8:8 + len(data)] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int.from_bytes(bytes(out[:8]), "little")
    return pickle.loads(bytes(out[8:8 + n]))


def create_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data mesh over all (or the first N) devices.

    When the mesh spans every device, the order comes from
    ``mesh_utils.create_device_mesh`` rather than raw ``jax.devices()``:
    the SigLIP ring loss ppermutes features neighbour-to-neighbour
    (losses/contrastive.py), and a topology-aware order makes hop
    ``i -> i+1`` a single ICI link (on multislice, only the unavoidable
    slice-boundary hops cross DCN).  The contrastive all-gather is
    order-insensitive.  Ordering rule: an explicit ``devices`` list always
    keeps its positional order (tests pin device identity that way), and so
    does ``num_devices`` when it selects a strict prefix of the devices (a
    partial grid has no meaningful topology).  ``num_devices`` equal to the
    full device count is the common bench/entry spelling of "all devices"
    and takes the same topology-aware order as the default.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    if len(axis_names) == 1:
        if devices is None and len(devs) == len(jax.devices()):
            try:
                from jax.experimental import mesh_utils

                grid = mesh_utils.create_device_mesh((len(devs),),
                                                     devices=devs)
                return Mesh(grid, tuple(axis_names))
            except Exception as e:  # unknown topology: positional order works
                logger.info(
                    "topology-aware device order unavailable (%r); "
                    "falling back to positional order — the ppermute "
                    "ring may cross more than one ICI link per hop", e)
        return Mesh(np.asarray(devs), tuple(axis_names))
    raise NotImplementedError("only 1-D data meshes are used for COSMOS parity")


def create_multislice_mesh(
    n_slices: int,
    per_slice: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ('slice', 'data') mesh factoring the data axis by slice.

    On real multislice TPU hardware ``mesh_utils.create_hybrid_device_mesh``
    lays the 'slice' axis across the DCN-connected slices and 'data'
    within each slice's ICI torus; contrastive gathers then run
    hierarchically (losses/contrastive.py ``slice_axis``): one ICI
    all-gather per slice, then one DCN exchange of the already-
    concatenated slice blocks — or no DCN at all with
    ``--gather-scope slice``.  Off multislice hardware (tests, the CPU
    dryrun) the factorization is positional.
    """
    devs = list(devices if devices is not None else jax.devices())
    if per_slice is None:
        if len(devs) % n_slices:
            raise ValueError(
                f"{len(devs)} devices do not factor into {n_slices} slices")
        per_slice = len(devs) // n_slices
    if n_slices * per_slice > len(devs):
        raise ValueError(
            f"mesh {n_slices}x{per_slice} needs {n_slices * per_slice} "
            f"devices, have {len(devs)}")
    if devices is None and n_slices * per_slice == len(devs):
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                (1, per_slice), (n_slices, 1), devices=devs)
            return Mesh(grid, (SLICE_AXIS, DATA_AXIS))
        except Exception as e:  # single-slice/CPU: positional factoring
            logger.info(
                "hybrid device mesh unavailable (%r); using positional "
                "slice factoring", e)
    grid = np.asarray(devs[: n_slices * per_slice]).reshape(
        n_slices, per_slice)
    return Mesh(grid, (SLICE_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dimension over the data (and slice) axes."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = data_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, batch_axis: int = 1) -> dict:
    """Place a host batch dict ([V, B_local, ...] arrays) onto the mesh with
    the batch axis sharded over 'data'.

    Single-process: a plain device_put with the sharded layout. Multi-host:
    each process contributes its LOCAL batch as one slice of the global
    array via jax.make_array_from_process_local_data — the global batch is
    B_local * process_count (a device_put of local data against the global
    mesh would silently treat one host's batch as the whole global batch
    and drop the remote rows)."""
    multiprocess = jax.process_count() > 1

    axes = data_axes(mesh)

    def _put(x):
        spec = [None] * x.ndim
        if x.ndim > batch_axis:
            spec[batch_axis] = axes
        sharding = NamedSharding(mesh, P(*spec))
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)
