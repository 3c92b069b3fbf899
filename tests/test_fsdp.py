"""FSDP/ZeRO parameter+optimizer sharding (parallel/fsdp.py).

On the 8-virtual-CPU-device mesh: the FSDP-placed GSPMD step must train
identically to the 1-D shard_map DP step, and params / Adam moments /
the EMA teacher must actually live sharded over the data axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    fsdp_spec,
    shard_params_fsdp,
)
from cosmos_tpu.parallel.mesh import DATA_AXIS, create_mesh, shard_batch

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


def test_fsdp_spec_rules():
    n = 8
    # big 2-D kernel: largest divisible dim sharded
    big = np.zeros((512, 768), np.float32)
    assert fsdp_spec(big, n, min_size=0) == (None, DATA_AXIS)
    # dim preference: the larger divisible dim wins
    tall = np.zeros((1024, 96), np.float32)
    assert fsdp_spec(tall, n, min_size=0) == (DATA_AXIS, None)
    # no dim divisible -> replicated
    odd = np.zeros((7, 13), np.float32)
    assert fsdp_spec(odd, n, min_size=0) == ()
    # small leaves replicate (LN scales, biases)
    small = np.zeros((768,), np.float32)
    assert fsdp_spec(small, n) == ()
    # scalars replicate
    assert fsdp_spec(np.zeros((), np.float32), n) == ()


def _tiny_cosmos_model():
    return create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, **TINY,
    )


def _cosmos_batch(b):
    rng = np.random.default_rng(3)
    return {
        "global_images": rng.normal(size=(2, b, 16, 16, 3)).astype("float32"),
        "local_images": rng.normal(size=(2, b, 8, 8, 3)).astype("float32"),
        "texts": rng.integers(1, 127, size=(3, b, 12)).astype("int32"),
    }


def test_fsdp_train_step_matches_shard_map():
    """FSDP placement + the GSPMD step == the 1-D shard_map DP step:
    same loss and same updated params after one step (the math is the
    global-batch computation either way; only WHERE the params live
    differs)."""
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        create_train_state_fsdp,
        make_train_step,
        make_train_step_gspmd,
    )

    model, params = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr)
    batch = _cosmos_batch(8)

    mesh1 = create_mesh(8)
    opt = create_optimizer(lr, weight_decay=0.1)
    step1 = make_train_step(model, opt, mesh1, cfg)
    s1 = create_train_state(jax.tree.map(jnp.copy, params), opt, mesh1)
    s1, m1 = step1(s1, shard_batch(batch, mesh1, batch_axis=1))

    mesh2 = create_mesh(8)
    opt2 = create_optimizer(lr, weight_decay=0.1)
    step2 = make_train_step_gspmd(model, opt2, mesh2, cfg)
    # min_size=0: the tiny model's biggest leaf is 8 KiB, so the default
    # threshold would replicate EVERYTHING and test nothing — force every
    # divisible leaf onto the data axis instead
    s2 = create_train_state_fsdp(jax.tree.map(jnp.copy, params), opt2,
                                 mesh2, min_size=0)
    b2 = shard_batch(batch, mesh2, batch_axis=1)
    s2, m2 = step2(s2, b2)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    got = np.asarray(jax.device_get(
        s2.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    want = np.asarray(jax.device_get(
        s1.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fsdp_state_actually_shards():
    """Params, Adam moments AND the EMA teacher live sharded over 'data'
    and STAY sharded after a step — the per-chip memory win that is the
    point of FSDP."""
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state_fsdp,
        make_train_step_gspmd,
    )

    model, params = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    opt = create_optimizer(lr, weight_decay=0.1)
    mesh = create_mesh(8)
    state = create_train_state_fsdp(params, opt, mesh, min_size=0)

    # the token embedding [128, 64] is the biggest leaf in the tiny model
    def spec_of(tree):
        return tree["text"]["token_embedding"]["embedding"].sharding.spec

    assert DATA_AXIS in spec_of(state.params)
    assert DATA_AXIS in spec_of(state.teacher_params)
    mu = state.opt_state[0].mu if hasattr(state.opt_state[0], "mu") else None
    if mu is not None:
        assert DATA_AXIS in spec_of(mu)
    # a shard is 1/8 of the full leaf
    emb = state.params["text"]["token_embedding"]["embedding"]
    shard_elems = {s.data.size for s in emb.addressable_shards}
    assert shard_elems == {emb.size // 8}

    step = make_train_step_gspmd(
        model, opt, mesh, TrainStepConfig(cosmos=True, lr_schedule=lr))
    state, metrics = step(state, shard_batch(_cosmos_batch(8), mesh,
                                             batch_axis=1))
    assert np.isfinite(float(metrics["loss"]))
    assert DATA_AXIS in spec_of(state.params)


def test_fsdp_tp_composition_matches_dp_step():
    """--fsdp on a 2-D (dp, tp) mesh: the composed placement
    (fsdp_tp_spec — Megatron over 'model', ZeRO-3 over 'data' on the
    free dims) trains to the same loss/params as the 1-D shard_map DP
    step, and at least one leaf is genuinely sharded over BOTH axes."""
    from cosmos_tpu.parallel.tp import MODEL_AXIS, create_tp_mesh
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        create_train_state_fsdp,
        make_train_step,
        make_train_step_gspmd,
    )

    model, params = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr)
    batch = _cosmos_batch(8)

    mesh1 = create_mesh(8)
    opt = create_optimizer(lr, weight_decay=0.1)
    step1 = make_train_step(model, opt, mesh1, cfg)
    s1 = create_train_state(jax.tree.map(jnp.copy, params), opt, mesh1)
    s1, m1 = step1(s1, shard_batch(batch, mesh1, batch_axis=1))

    mesh2 = create_tp_mesh(4, 2)
    opt2 = create_optimizer(lr, weight_decay=0.1)
    step2 = make_train_step_gspmd(model, opt2, mesh2, cfg)
    s2 = create_train_state_fsdp(jax.tree.map(jnp.copy, params), opt2,
                                 mesh2, min_size=0)
    s2, m2 = step2(s2, shard_batch(batch, mesh2, batch_axis=1))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    got = np.asarray(jax.device_get(
        s2.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    want = np.asarray(jax.device_get(
        s1.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    np.testing.assert_allclose(got, want, atol=2e-6)

    # composition is real: the c_fc kernel is column-parallel over
    # 'model' AND ZeRO-sharded over 'data', in params, teacher and mu
    def spec_of(tree):
        return (tree["visual"]["transformer"]["resblocks_0"]["mlp"]
                ["c_fc"]["kernel"].sharding.spec)

    for tree in (s2.params, s2.teacher_params):
        sp = spec_of(tree)
        assert MODEL_AXIS in sp and DATA_AXIS in sp, sp
    mu = s2.opt_state[0].mu if hasattr(s2.opt_state[0], "mu") else None
    if mu is not None:
        sp = spec_of(mu)
        assert MODEL_AXIS in sp and DATA_AXIS in sp, sp
    # a shard holds 1/8 of the leaf (4-way data x 2-way model)
    leaf = (s2.params["visual"]["transformer"]["resblocks_0"]["mlp"]
            ["c_fc"]["kernel"])
    assert {s.data.size for s in leaf.addressable_shards} == {leaf.size // 8}


def test_fsdp_shardings_cover_real_vit_geometry():
    """At real ViT-B-16 shapes every matmul weight shards (all dims are
    multiples of 8) — nothing big silently replicates."""
    model, params = create_model("ViT-B-16", init_params=False)
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3), jnp.float32),
                             jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(0),
    )["params"]
    mesh = create_mesh(8)
    specs = jax.tree.map(lambda l: fsdp_spec(l, 8), shapes)
    big_replicated = [
        jax.tree_util.keystr(path)
        for (path, spec), (_, leaf) in zip(
            jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, type(None))
                or not isinstance(x, dict))[0],
            jax.tree_util.tree_flatten_with_path(shapes)[0],
        )
        if leaf.size >= 2 ** 16 and spec == ()
    ]
    assert big_replicated == [], big_replicated
