"""Training checkpoint save/resume via Orbax.

Parity targets:
  - /root/reference/src/main.py:551-584: per-epoch checkpoint dicts
    {epoch, name, student, teacher, optimizer[, scaler]} + an atomic
    'epoch_latest' pointer (tmp + os.replace), optional
    delete-previous-checkpoint.
  - /root/reference/src/main.py:150-188: --resume latest discovery of the
    newest checkpoint (local or remote), path broadcast from rank 0.
  - /root/reference/src/main.py:406-435: resume restores student, teacher
    and optimizer state.

Here one Orbax StandardCheckpointer snapshot holds the whole TrainState
pytree (student + teacher + opt_state + step) plus a config json — unlike
the reference, checkpoints carry their config.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax

logger = logging.getLogger(__name__)

LATEST_NAME = "epoch_latest"


def _ckpt_dir(base: str, epoch: int) -> Path:
    return Path(base) / f"epoch_{epoch}"


def host_state(tree):
    """Fetch a (possibly sharded) device pytree to host numpy.

    Fully-addressable leaves are a plain ``device_get``.  Leaves that span
    hosts (FSDP: params/moments/teacher sharded over the global data axis)
    are allgathered into a fully-replicated host copy — that branch is a
    COLLECTIVE, so when any leaf spans hosts EVERY process must call this
    at the same program point (save/eval call sites in main.py do)."""
    from jax.experimental import multihost_utils

    def _get(x):
        # A fully-REPLICATED array is not fully addressable in a
        # multi-host run, yet every host already holds a complete copy —
        # device_get is a local-shard read, no program launch.  Entering
        # process_allgather for it would launch a jitted gather over the
        # GLOBAL device assignment, which is only defined when every
        # process calls it — but main.py saves master-only for
        # replicated (non-GSPMD) states, so that branch would hang the
        # first checkpoint save.  Allgather only what is genuinely
        # sharded across hosts (FSDP/TP leaves).
        if getattr(x, "is_fully_replicated", True):
            return jax.device_get(x)
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    return jax.tree.map(_get, tree)


def save_checkpoint(
    state,
    checkpoint_path: str,
    epoch: int,
    *,
    name: str = "",
    config: Optional[Dict[str, Any]] = None,
    save_latest: bool = True,
    delete_previous: bool = False,
) -> str:
    import orbax.checkpoint as ocp

    if "://" in str(checkpoint_path):
        # the supported remote flow matches the reference: save LOCALLY
        # and mirror with the --remote-sync daemon (file_utils); writing
        # here would mkdir a literal 'gs:' directory
        raise ValueError(
            f"--checkpoint-path {checkpoint_path!r}: save locally and use "
            "--remote-sync s3://... (resume FROM a remote path works — "
            "restore_checkpoint downloads it)"
        )
    # Multi-process protocol: EVERY process must reach this function.
    # Two collectives live inside it — host_state's allgather for
    # cross-host-sharded leaves (FSDP/TP), and ORBAX'S OWN save barrier:
    # StandardCheckpointer.save runs sync_global_processes
    # ('save_start'/commit) in any multi-process runtime, so a
    # master-only call would park process 0 in a barrier the others
    # never join (found by tests/test_multihost_gspmd_ckpt.py — the
    # failure is a hang in production, a barrier-name mismatch in the
    # test).  Plain filesystem writes (meta, latest pointer, deletes)
    # stay process-0-only.
    host = host_state(state)
    path = _ckpt_dir(checkpoint_path, epoch)
    base = Path(checkpoint_path)
    base.mkdir(parents=True, exist_ok=True)   # idempotent on a shared fs
    # every process: single-process trivially, multi-process because the
    # save itself is the collective (Orbax writes on the primary only)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.resolve(), host, force=True)
    if jax.process_index() != 0:
        return str(path)
    meta = {"epoch": epoch, "name": name, "config": config or {}}
    (path / "meta.json").write_text(json.dumps(meta))

    if save_latest:
        # atomic latest pointer (main.py:578-584 tmp+replace equivalent)
        tmp = base / (LATEST_NAME + ".tmp")
        tmp.write_text(str(path.name))
        os.replace(tmp, base / LATEST_NAME)
    if delete_previous:
        prev = _ckpt_dir(checkpoint_path, epoch - 1)
        if prev.exists():
            shutil.rmtree(prev)
    logger.info(f"saved checkpoint {path}")
    return str(path)


def get_latest_checkpoint(checkpoint_path: str) -> Optional[str]:
    """Newest epoch_N dir, preferring the atomic latest pointer
    (main.py:57-72 get_latest_checkpoint equivalent).  Remote paths
    (s3://, gs://) are listed via fsspec like the reference's S3 resume
    discovery (main.py:150-188)."""
    if str(checkpoint_path).startswith(("s3://", "gs://")):
        import fsspec

        fs, _, paths = fsspec.get_fs_token_paths(checkpoint_path)
        epochs = []
        try:
            for p in fs.ls(paths[0], detail=False):
                m = re.search(r"epoch_(\d+)/?$", p)
                if m:
                    epochs.append((int(m.group(1)), p))
        except FileNotFoundError:
            return None
        if not epochs:
            return None
        best = max(epochs)[1]
        proto = str(checkpoint_path).split("://")[0]
        return f"{proto}://{best}" if "://" not in best else best
    base = Path(checkpoint_path)
    pointer = base / LATEST_NAME
    if pointer.exists():
        cand = base / pointer.read_text().strip()
        if cand.exists():
            return str(cand)
    epochs = []
    for p in base.glob("epoch_*"):
        m = re.fullmatch(r"epoch_(\d+)", p.name)
        if m:
            epochs.append((int(m.group(1)), p))
    if not epochs:
        return None
    return str(max(epochs)[1])


def _localize(path: str) -> str:
    """Download a remote (s3://, gs://) snapshot dir to a local temp dir.

    get_latest_checkpoint deliberately discovers remote epochs (the
    reference's S3 resume, main.py:150-188), but Orbax restore + the
    meta.json read need a filesystem path — and ``Path('gs://...')
    .resolve()`` silently mangles a URI into a bogus local path, which
    made remote resume a guaranteed FileNotFoundError before this."""
    if "://" not in str(path):
        return str(path)
    import hashlib
    import shutil
    import tempfile

    import fsspec

    fs, _, paths = fsspec.get_fs_token_paths(path)
    # content-keyed cache dir: repeated remote resumes reuse one snapshot
    # instead of leaking a fresh multi-GB mkdtemp copy each time, while a
    # RE-WRITTEN snapshot at the same URI (deleted + rerun experiment)
    # keys to a different dir — the fingerprint folds in the remote
    # listing's names, sizes and mtimes/etags where the backend provides
    # them, so it never silently restores stale weights
    uri_key = hashlib.sha1(str(path).encode()).hexdigest()[:12]
    finger = hashlib.sha1(str(path).encode())
    detail = fs.find(paths[0], detail=True)
    stamped = False
    for name in sorted(detail):
        inf = detail[name] or {}
        stamp = (inf.get("mtime") or inf.get("LastModified")
                 or inf.get("ETag") or inf.get("etag")
                 or inf.get("created") or "")
        stamped = stamped or bool(stamp)
        finger.update(f"{name}:{inf.get('size')}:{stamp}".encode())
    if not stamped:
        # backend exposes no mtime/ETag at all: names+sizes cannot
        # distinguish a deleted-and-rerun snapshot (same model shapes =>
        # same file sizes), so caching would restore stale weights —
        # fall back to a fresh download per resume (the pre-cache
        # behavior; real object stores all provide stamps)
        dest = Path(tempfile.mkdtemp(prefix="cosmos_ckpt_"))
        fs.get(paths[0], str(dest) + "/", recursive=True)
        inner = dest / Path(paths[0]).name
        return str(inner if inner.is_dir() else dest)
    # tag = <uri hash>-<content hash>: the URI prefix lets a newer snapshot
    # of the SAME URI evict its superseded copies, bounding the cache (one
    # live entry per distinct remote URI instead of one per rewrite)
    tag = f"{uri_key}-{finger.hexdigest()[:16]}"
    root = Path(tempfile.gettempdir()) / "cosmos_ckpt_cache"
    root.mkdir(parents=True, exist_ok=True)
    cache = root / tag
    marker = cache / ".complete"
    # flock-serialized: concurrent processes resuming the same URI take
    # turns at the check-download-evict-mark sequence instead of rmtree'ing
    # a half-finished download out from under each other
    import fcntl

    with open(root / f"{uri_key}.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        # evict superseded snapshots of this URI — but only after a grace
        # period: the flock covers localization, not the Orbax restore
        # that follows it, so a concurrent process may still be READING a
        # dir this process would supersede.  One hour comfortably bounds
        # a restore; until then at most one extra copy per rewrite lives
        # in the cache.
        import time

        now = time.time()
        for stale in root.glob(f"{uri_key}-*"):
            if (stale.is_dir() and stale != cache
                    and now - stale.stat().st_mtime > 3600):
                shutil.rmtree(stale, ignore_errors=True)
        if not marker.exists():
            if cache.exists():      # interrupted prior download
                shutil.rmtree(cache)
            cache.mkdir(parents=True)
            fs.get(paths[0], str(cache) + "/", recursive=True)
            marker.touch()
    inner = cache / Path(paths[0]).name
    return str(inner if inner.is_dir() else cache)


def restore_checkpoint(state_template, path: str):
    """Restore a TrainState snapshot; returns (state, epoch).  Remote
    paths are downloaded to a temp dir first (see _localize).  The
    template may be FSDP-sharded across hosts (host_state gathers it —
    collective; main.py's resume runs on every process)."""
    import orbax.checkpoint as ocp

    p = Path(_localize(path))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(p.resolve(), host_state(state_template))
    meta = {}
    meta_file = p / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    return state, int(meta.get("epoch", 0))


def save_params_msgpack(params, path: str) -> None:
    """Standalone weights export (inference interchange)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params_msgpack(params_template, path: str):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())
