"""Two-process MULTISLICE smoke test on CPU.

Real multislice topology: each process owns one slice's devices (the
'slice' mesh axis crosses processes, i.e. what DCN crosses in
production).  Validates, from two jax.distributed processes:

  - create_multislice_mesh over a multi-process device set;
  - global-batch assembly onto the ('slice','data')-sharded batch axis
    (make_array_from_process_local_data with a 2-axis batch spec);
  - the hierarchical two-stage contrastive gather: its loss must equal
    the flat 1-D data-mesh loss computed on the same global batch in the
    same processes (the hierarchy is a communication layout, not math);
  - the 'slice' gather scope runs finite with both processes agreeing.
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
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)
assert jax.local_device_count() == 2

import numpy as np
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import (
    create_mesh, create_multislice_mesh, shard_batch,
)
from cosmos_tpu.training.scheduler import cosine_lr
from cosmos_tpu.training.train import (
    TrainStepConfig, create_optimizer, create_train_state, make_train_step,
)

model, params = create_model(
    "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
    add_zero_attn=True, embed_dim=32, vision_image_size=16,
    vision_patch_size=8, vision_width=32, vision_layers=2,
    vision_head_width=16, text_context_length=12, text_vocab_size=256,
    text_width=32, text_heads=2, text_layers=2,
)
lr = cosine_lr(1e-3, 2, 10)

# per-process local batch (2 local devices x 2 samples)
rng = np.random.default_rng(100 + proc_id)
b_local = 4
host_batch = {
    "global_images": rng.normal(size=(2, b_local, 16, 16, 3)).astype(np.float32),
    "local_images": rng.normal(size=(2, b_local, 8, 8, 3)).astype(np.float32),
    "texts": rng.integers(1, 255, size=(2, b_local, 12)).astype(np.int32),
}

def one_step(mesh, scope):
    opt = create_optimizer(lr, weight_decay=0.1)
    cfg = TrainStepConfig(cosmos=True, momentum_teacher=0.99,
                          fix_momentum=True, lr_schedule=lr,
                          gather_scope=scope)
    step = make_train_step(model, opt, mesh, cfg)
    state = create_train_state(
        jax.tree.map(np.copy, jax.tree.map(np.asarray, params)), opt, mesh)
    batch = shard_batch(host_batch, mesh, batch_axis=1)
    assert batch["texts"].shape == (2, 8, 12), batch["texts"].shape
    state, metrics = step(state, batch)
    return float(metrics["loss"])

flat = one_step(create_mesh(), "global")
# 2 slices x 2 devices: with default device order each process's devices
# form one slice — the slice axis crosses processes like DCN would
hier = one_step(create_multislice_mesh(2, 2), "global")
sliced = one_step(create_multislice_mesh(2, 2), "slice")

assert abs(hier - flat) < 1e-4 * max(1.0, abs(flat)), (hier, flat)
assert np.isfinite(sliced)

from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("done")
print(f"PROC{proc_id} OK flat={flat:.5f} hier={hier:.5f} slice={sliced:.5f}")
"""


def test_two_process_multislice(tmp_path):
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
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        pytest.fail("2-process multislice test deadlocked (540s)")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"PROC{i} OK" in out, out[-2000:]
    # both processes computed identical global losses
    assert (outs[0].split("OK ")[1].strip()
            == outs[1].split("OK ")[1].strip())
