"""Two-process GSPMD checkpoint save/restore (round-5 advisor fixes).

The advisor found two multi-host hangs-in-waiting: (1) host_state
dispatched fully-REPLICATED (non-addressable) leaves into
process_allgather — a collective — even when main.py saves master-only;
(2) the every-process save gate covered --fsdp but not TP multi-host,
whose params are genuinely cross-host sharded.  This test runs the fixed
protocol end-to-end with 2 processes on a (2,2) (data, model) mesh:

  - one GSPMD TP train step (params sharded across BOTH processes);
  - save_checkpoint called from EVERY process (the host_state allgather
    is a real cross-process collective here), writes master-only;
  - restore_checkpoint from every process round-trips the state;
  - and a REPLICATED-state master-only save (the reference pattern)
    completes without the other process participating — the exact case
    fix (1) protects.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")

proc_id = int(sys.argv[1])
port = sys.argv[2]
ckpt_dir = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)
assert jax.local_device_count() == 2

import numpy as np
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import create_mesh, shard_batch
from cosmos_tpu.parallel.tp import create_tp_mesh
from cosmos_tpu.training.checkpoint import (
    restore_checkpoint, save_checkpoint,
)
from cosmos_tpu.training.scheduler import cosine_lr
from cosmos_tpu.training.train import (
    TrainStepConfig, create_optimizer, create_train_state,
    create_train_state_gspmd, make_train_step, make_train_step_gspmd,
)

model, params = create_model(
    "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
    add_zero_attn=True, embed_dim=32, vision_image_size=16,
    vision_patch_size=8, vision_width=32, vision_layers=2,
    vision_head_width=16, text_context_length=12, text_vocab_size=256,
    text_width=32, text_heads=2, text_layers=2,
)
lr = cosine_lr(1e-3, 2, 10)
opt = create_optimizer(lr, weight_decay=0.1)
cfg = TrainStepConfig(cosmos=True, momentum_teacher=0.99,
                      fix_momentum=True, lr_schedule=lr)
# host snapshot BEFORE any donating step: device_put can alias an
# uncommitted param buffer into the state, and donation then deletes it
params_host = jax.tree.map(np.asarray, params)

# --- GSPMD TP: params sharded ACROSS the two processes ---------------
mesh = create_tp_mesh(2, 2)
step = make_train_step_gspmd(model, opt, mesh, cfg)
state = create_train_state_gspmd(params, opt, mesh)
rng = np.random.default_rng(7 + proc_id)
batch = shard_batch({
    "global_images": rng.normal(size=(2, 2, 16, 16, 3)).astype(np.float32),
    "local_images": rng.normal(size=(2, 2, 8, 8, 3)).astype(np.float32),
    "texts": rng.integers(1, 255, size=(2, 2, 12)).astype(np.int32),
}, mesh, batch_axis=1)
state, metrics = step(state, batch)
loss = float(metrics["loss"])

# sanity: at least one leaf is NOT fully addressable from this process
leaves = jax.tree.leaves(state.params)
assert any(not x.is_fully_addressable for x in leaves)

# EVERY process calls save (main.py's gspmd_multihost gate); the
# host_state allgather inside is the cross-process collective
path = save_checkpoint(state, ckpt_dir, 1, name="tp2proc")
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("saved")
assert os.path.isdir(path), path

# every process restores (host_state on the template is collective too)
restored, epoch = restore_checkpoint(state, path)
assert epoch == 1
got = np.asarray(jax.tree.leaves(
    jax.device_get(restored.params))[0])
want = np.asarray(jax.tree.leaves(
    jax.device_get(state.params))[0])
np.testing.assert_allclose(got, want, atol=0)

# --- replicated (plain DP) state: every-process save round-trips -----
# (Orbax's save barrier engages in ANY multi-process run, so even the
# replicated case saves from every process; writes are primary-only)
mesh1 = create_mesh()
opt1 = create_optimizer(lr, weight_decay=0.1)
state1 = create_train_state(params_host, opt1, mesh1)
p1 = save_checkpoint(state1, ckpt_dir + "_rep", 1, name="rep")
multihost_utils.sync_global_devices("rep_saved")
assert os.path.isdir(p1)
restored1, ep1 = restore_checkpoint(state1, p1)
assert ep1 == 1

# --- resume-latest discovery broadcasts from process 0 ---------------
from cosmos_tpu.parallel.mesh import broadcast_object
from cosmos_tpu.training.checkpoint import get_latest_checkpoint

latest = broadcast_object(
    get_latest_checkpoint(ckpt_dir) if jax.process_index() == 0 else None)
assert latest is not None and latest.endswith("epoch_1"), latest

print(f"PROC{proc_id} OK loss={loss:.5f}")
"""


def test_two_process_gspmd_checkpoint(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    ckpt_dir = str(tmp_path / "ckpts")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, ckpt_dir],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        pytest.fail("2-process GSPMD checkpoint test deadlocked (540s)")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"PROC{i} OK" in out, out[-2000:]
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1
