"""Two-process jax.distributed smoke test on CPU.

Validates the REAL multi-host code paths that a single process cannot:
  - jax.distributed.initialize via parallel.mesh.init_distributed;
  - global-batch assembly from process-local data in shard_batch
    (jax.make_array_from_process_local_data);
  - one sharded COSMOS train step over the global mesh from two
    processes (loss must agree across hosts);
  - master-only eval over a HOST-LOCAL mesh while the other process
    idles — the rank-0 eval pattern that would deadlock if the eval jit
    spanned the global mesh (reference train.py:327-328 analog).

Each process gets 2 virtual CPU devices (4-device global mesh).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())  # repo root (cwd set by the launcher)
import jax
jax.config.update("jax_platforms", "cpu")

proc_id = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2, jax.local_device_count()

import numpy as np
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import create_mesh, shard_batch
from cosmos_tpu.training.scheduler import cosine_lr
from cosmos_tpu.training.train import (
    TrainStepConfig, create_optimizer, create_train_state, make_train_step,
)

mesh = create_mesh()  # 4 devices, 2 per process
model, params = create_model(
    "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
    add_zero_attn=True, embed_dim=32, vision_image_size=16,
    vision_patch_size=8, vision_width=32, vision_layers=2,
    vision_head_width=16, text_context_length=12, text_vocab_size=256,
    text_width=32, text_heads=2, text_layers=2,
)
lr = cosine_lr(1e-3, 2, 10)
opt = create_optimizer(lr, weight_decay=0.1)
cfg = TrainStepConfig(cosmos=True, local_loss=True, momentum_teacher=0.99,
                      fix_momentum=True, lr_schedule=lr)
step = make_train_step(model, opt, mesh, cfg)
state = create_train_state(params, opt)

# per-HOST batch: 2 devices * 2 samples = 4 local rows; global batch 8.
# different data per process (seeded by proc_id) — the step must still
# agree on the pmean'd loss.
rng = np.random.default_rng(100 + proc_id)
b_local = 4
batch = {
    "global_images": rng.normal(size=(2, b_local, 16, 16, 3)).astype(np.float32),
    "local_images": rng.normal(size=(2, b_local, 8, 8, 3)).astype(np.float32),
    "texts": rng.integers(1, 255, size=(2, b_local, 12)).astype(np.int32),
}
batch = shard_batch(batch, mesh, batch_axis=1)
# global shape check: batch axis must be B_local * process_count
assert batch["texts"].shape == (2, 8, 12), batch["texts"].shape

for _ in range(2):
    state, metrics = step(state, batch)
loss = float(metrics["loss"])
assert np.isfinite(loss)

# --- master-only eval on a host-local mesh (non-master just proceeds) --
from cosmos_tpu.training.evaluate import host_local_params, make_encoders

if jax.process_index() == 0:
    local_mesh = create_mesh(devices=jax.local_devices())
    local_params = host_local_params(state.params)
    enc_img, _, _ = make_encoders(model, local_params, local_mesh)
    feats = enc_img(np.zeros((4, 16, 16, 3), np.float32))
    assert np.asarray(feats).shape == (4, 32)

# every process must reach the barrier — proves no deadlock
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("eval_done")
print(f"PROC{proc_id} OK loss={loss:.5f}")
"""


def test_two_process_distributed_train_and_eval(tmp_path):
    # no @pytest.mark.timeout: pytest-timeout isn't a dependency, so the
    # mark would be silently inert — the deadlock guard is the bounded
    # communicate() below plus the kill-on-timeout cleanup.
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
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
        # deadlock watchdog: kill BOTH workers (a hung collective leaves
        # both blocked) so the suite fails fast instead of leaking
        # processes that hold the distributed port
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        pytest.fail("2-process distributed test deadlocked (540s)")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"PROC{i} OK" in out, out[-2000:]
    # both processes computed the SAME pmean'd loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
