"""HLO-level proof of the multislice gather topology.

The equality tests show the hierarchical gather computes the right
VALUES; this inspects the lowered program to show it emits the right
COMMUNICATION — the property that actually saves DCN bandwidth:

  - gather_scope='global': feature all-gathers appear in BOTH
    topologies — intra-slice groups ({{0,1,2,3},{4,5,6,7}} on the 2x4
    factored mesh: the ICI stage) and cross-slice groups
    ({{0,4},{1,5},...}: the single DCN block-exchange stage).
  - gather_scope='slice': all feature all-gathers are intra-slice; the
    ONLY cross-slice collectives are reductions (the grad/metric pmean).
"""

import re

import jax
import numpy as np

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import create_multislice_mesh, shard_batch

TINY = dict(
    embed_dim=32,
    vision_image_size=16,
    vision_patch_size=8,
    vision_width=64,
    vision_layers=2,
    vision_head_width=16,
    text_context_length=12,
    text_vocab_size=128,
    text_width=64,
    text_heads=4,
    text_layers=2,
)

INTRA = {(0, 1, 2, 3), (4, 5, 6, 7)}          # ICI: within each slice
CROSS = {(0, 4), (1, 5), (2, 6), (3, 7)}      # DCN: across slices


def _gather_groups(scope):
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, **TINY)
    mesh = create_multislice_mesh(2, 4)
    lr = cosine_lr(1e-3, 2, 10)
    opt = create_optimizer(lr)
    step = make_train_step(model, opt, mesh,
                           TrainStepConfig(cosmos=True, lr_schedule=lr,
                                           gather_scope=scope))
    state = create_train_state(params, opt, mesh)
    rng = np.random.default_rng(0)
    b = 8
    batch = shard_batch({
        "global_images": rng.normal(size=(2, b, 16, 16, 3)).astype("float32"),
        "local_images": rng.normal(size=(2, b, 8, 8, 3)).astype("float32"),
        "texts": rng.integers(1, 127, size=(3, b, 12)).astype("int32"),
    }, mesh, batch_axis=1)
    text = step.lower(state, batch).as_text()

    groups = set()
    for op, attrs in re.findall(
            r'"stablehlo\.(all_gather|all_to_all)[^"]*"[^\n]*?'
            r'replica_groups = dense<\[\[(.*?)\]\]>', text):
        for g in attrs.split("], ["):
            groups.add((op, tuple(int(x) for x in g.split(", "))))
    return {g for op, g in groups if op == "all_gather"}


def test_global_scope_is_hierarchical():
    groups = _gather_groups("global")
    assert INTRA <= groups, groups
    assert CROSS <= groups, groups


def test_slice_scope_gathers_stay_on_ici():
    groups = _gather_groups("slice")
    assert INTRA <= groups, groups
    assert not (CROSS & groups), (
        f"slice scope must not all-gather across slices: {groups & CROSS}")
