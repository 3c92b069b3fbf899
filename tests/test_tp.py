"""Tensor-parallel serving (parallel/tp.py): 2-D (data, model) mesh.

On the 8-virtual-CPU-device mesh: TP-sharded encoders must produce the
same embeddings as the unsharded model, weights must actually live
sharded across the 'model' axis, and every mesh shape (pure TP, pure DP,
mixed) must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.tp import (
    MODEL_AXIS,
    create_tp_mesh,
    make_tp_encoders,
    tp_param_shardings,
)

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


@pytest.fixture(scope="module")
def model_and_data():
    model, params = create_model("ViT-B-16", **TINY)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    texts = jnp.asarray(rng.integers(1, 127, size=(8, 12)), jnp.int32)
    ref_img = model.apply({"params": params}, images, True,
                          method=model.encode_image)["image_features"]
    ref_txt = model.apply({"params": params}, texts, True,
                          method=model.encode_text)["text_features"]
    return model, params, images, texts, np.asarray(ref_img), np.asarray(ref_txt)


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (8, 1)])
def test_tp_encoders_match_unsharded(model_and_data, dp, tp):
    model, params, images, texts, ref_img, ref_txt = model_and_data
    mesh = create_tp_mesh(dp, tp)
    sharded, enc_image, enc_text = make_tp_encoders(model, params, mesh)
    got_img = np.asarray(enc_image(sharded, images))
    got_txt = np.asarray(enc_text(sharded, texts))
    np.testing.assert_allclose(got_img, ref_img, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got_txt, ref_txt, atol=2e-5, rtol=1e-4)


def test_weights_are_model_sharded(model_and_data):
    model, params, *_ = model_and_data
    mesh = create_tp_mesh(2, 4)
    sharded, _, _ = make_tp_encoders(model, params, mesh)
    mlp = sharded["visual"]["transformer"]["resblocks_0"]["mlp"]
    # column-parallel c_fc: output axis split over 'model'
    assert mlp["c_fc"]["kernel"].sharding.spec == (None, MODEL_AXIS)
    # row-parallel c_proj: input axis split, bias replicated
    assert mlp["c_proj"]["kernel"].sharding.spec == (MODEL_AXIS, None)
    assert mlp["c_proj"]["bias"].sharding.spec == ()
    # the packed QKV projection splits its 3D output columns
    attn = sharded["visual"]["transformer"]["resblocks_0"]["attn"]
    assert attn["in_proj_kernel"].sharding.spec == (None, MODEL_AXIS)
    # each model-row holds 1/tp of the kernel columns
    shard_shapes = {s.data.shape for s in attn["in_proj_kernel"].addressable_shards}
    full = attn["in_proj_kernel"].shape
    assert shard_shapes == {(full[0], full[1] // 4)}


def test_specs_cover_eva_trunk():
    """The TP rules must shard EVA02's separate q/k/v and SwiGLU mats."""
    from cosmos_tpu.models.eva import Eva, register_eva

    register_eva("eva02_tp_test", patch_size=8, width=32, layers=1, heads=2,
                 scale_mlp=True, scale_attn=True, image_size=16)
    trunk = Eva(model_name="eva02_tp_test", image_size=16)
    params = trunk.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    mesh = create_tp_mesh(1, 8)
    specs = tp_param_shardings(params, mesh)
    blk = specs["resblocks_0"]
    assert blk["attn"]["q_proj"]["kernel"].spec == (None, MODEL_AXIS)
    assert blk["attn"]["out_proj"]["kernel"].spec == (MODEL_AXIS, None)
    assert blk["w1"]["kernel"].spec == (None, MODEL_AXIS)
    assert blk["w3"]["kernel"].spec == (MODEL_AXIS, None)
    assert blk["ln_1"]["scale"].spec == ()


def test_mesh_validation():
    with pytest.raises(ValueError, match="devices"):
        create_tp_mesh(4, 4)


def test_meshes_are_device_permutations():
    # topology-aware ordering (mesh_utils) may permute devices but must
    # cover every device exactly once, for any full-device mesh shape
    from cosmos_tpu.parallel.mesh import create_mesh

    all_ids = sorted(d.id for d in jax.devices())
    for mesh in (create_mesh(), create_tp_mesh(4, 2), create_tp_mesh(2, 4)):
        ids = sorted(d.id for d in mesh.devices.flat)
        assert ids == all_ids
    # explicit device lists keep the caller's positional order
    devs = list(jax.devices())[:4]
    mesh = create_tp_mesh(2, 2, devices=devs)
    assert [d.id for d in mesh.devices.flat] == [d.id for d in devs]


def _tiny_cosmos_model():
    return create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, **TINY,
    )


def _cosmos_batch(b):
    import numpy as onp

    rng = onp.random.default_rng(3)
    return {
        "global_images": rng.normal(size=(2, b, 16, 16, 3)).astype("float32"),
        "local_images": rng.normal(size=(2, b, 8, 8, 3)).astype("float32"),
        "texts": rng.integers(1, 127, size=(3, b, 12)).astype("int32"),
    }


def test_gspmd_train_step_matches_shard_map():
    """The 2-D GSPMD step must train identically to the 1-D shard_map
    step (global-batch math is the same; only the partitioning differs):
    same loss and same updated params after one step, on (2,4) and (8,1)
    meshes."""
    import jax.numpy as jnp

    from cosmos_tpu.parallel.mesh import create_mesh, shard_batch
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        create_train_state_gspmd,
        make_train_step,
        make_train_step_gspmd,
    )

    model, params = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr)
    batch = _cosmos_batch(8)

    # reference: the 1-D shard_map step over all 8 devices
    mesh1 = create_mesh(8)
    opt = create_optimizer(lr, weight_decay=0.1)
    step1 = make_train_step(model, opt, mesh1, cfg)
    s1 = create_train_state(jax.tree.map(jnp.copy, params), opt, mesh1)
    s1, m1 = step1(s1, shard_batch(batch, mesh1, batch_axis=1))

    for dp, tp in ((2, 4), (8, 1)):
        mesh2 = create_tp_mesh(dp, tp)
        opt2 = create_optimizer(lr, weight_decay=0.1)
        step2 = make_train_step_gspmd(model, opt2, mesh2, cfg)
        s2 = create_train_state_gspmd(
            jax.tree.map(jnp.copy, params), opt2, mesh2)
        b2 = jax.tree.map(
            lambda x: jax.device_put(
                x, jax.sharding.NamedSharding(
                    mesh2, jax.sharding.PartitionSpec(None, "data"))),
            batch)
        s2, m2 = step2(s2, b2)
        np.testing.assert_allclose(
            float(m2["loss"]), float(m1["loss"]), rtol=1e-5,
            err_msg=f"mesh ({dp},{tp})")
        got = np.asarray(jax.device_get(
            s2.params["visual"]["transformer"]["resblocks_0"]["mlp"]
            ["c_fc"]["kernel"]))
        want = np.asarray(jax.device_get(
            s1.params["visual"]["transformer"]["resblocks_0"]["mlp"]
            ["c_fc"]["kernel"]))
        np.testing.assert_allclose(got, want, atol=2e-6,
                                   err_msg=f"mesh ({dp},{tp})")


def test_gspmd_state_is_model_sharded():
    """Weights AND Adam moments must actually live sharded on the model
    axis, and stay sharded after a step (the point of TP training)."""
    import jax.numpy as jnp

    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state_gspmd,
        make_train_step_gspmd,
    )

    model, params = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    opt = create_optimizer(lr, weight_decay=0.1)
    mesh = create_tp_mesh(2, 4)
    state = create_train_state_gspmd(params, opt, mesh)

    def spec_of(tree):
        return tree["visual"]["transformer"]["resblocks_0"]["mlp"][
            "c_fc"]["kernel"].sharding.spec

    assert spec_of(state.params) == (None, MODEL_AXIS)
    assert spec_of(state.teacher_params) == (None, MODEL_AXIS)
    # Adam mu inherits the sharding through zeros_like
    mu = state.opt_state[0].mu if hasattr(state.opt_state[0], "mu") else None
    if mu is not None:
        assert spec_of(mu) == (None, MODEL_AXIS)

    step = make_train_step_gspmd(
        model, opt, mesh, TrainStepConfig(cosmos=True))
    batch = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data"))),
        _cosmos_batch(8))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert spec_of(state.params) == (None, MODEL_AXIS)


def test_gspmd_step_validations():
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        make_train_step_gspmd,
    )

    model, _ = _tiny_cosmos_model()
    opt = create_optimizer(cosine_lr(1e-3, 2, 10))
    mesh = create_tp_mesh(2, 4)
    with pytest.raises(ValueError, match="local_loss"):
        make_train_step_gspmd(model, opt, mesh,
                              TrainStepConfig(cosmos=True, local_loss=True))
    with pytest.raises(ValueError, match="ring"):
        make_train_step_gspmd(model, opt, mesh,
                              TrainStepConfig(cosmos=False, siglip=True))


def test_tp_encoders_accept_uneven_batches(model_and_data):
    """Serving callers feed arbitrary batch sizes; the encoders pad to a
    data-axis multiple and slice back."""
    model, params, images, texts, ref_img, ref_txt = model_and_data
    mesh = create_tp_mesh(2, 4)
    sharded, enc_image, enc_text = make_tp_encoders(model, params, mesh)
    got = np.asarray(enc_image(sharded, images[:5]))
    assert got.shape[0] == 5
    np.testing.assert_allclose(got, ref_img[:5], atol=2e-5, rtol=1e-4)
    got_t = np.asarray(enc_text(sharded, texts[:7]))
    assert got_t.shape[0] == 7
    np.testing.assert_allclose(got_t, ref_txt[:7], atol=2e-5, rtol=1e-4)


# round-4: the Pallas kernel is custom_partitioning-wrapped, so the TP
# paths keep it instead of mandating use_flash=False.  Kernel-supported
# geometry (head dim 64) so the packed-QKV path actually engages; the
# _fwd_pallas spy proves it ran rather than silently falling back.
KERNEL_TINY = dict(
    TINY,
    vision_width=128,
    vision_head_width=64,
    text_width=128,
    text_heads=2,
)


def _spy_fwd_pallas(monkeypatch):
    import cosmos_tpu.ops.fused_attention as fa

    calls = []
    orig = fa._fwd_pallas

    def spy(*a, **k):
        calls.append(a[0].shape)
        return orig(*a, **k)

    monkeypatch.setattr(fa, "_fwd_pallas", spy)
    return calls


def test_tp_encoders_keep_fused_kernel(monkeypatch):
    """TP serving with use_flash=True: the (2,4)-mesh encoders match the
    unsharded flash forward (same formulation, so tight tolerance) and
    the kernel demonstrably executes under the model axis."""
    model, params = create_model("ViT-B-16", use_flash=True, **KERNEL_TINY)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    texts = jnp.asarray(rng.integers(1, 127, size=(8, 12)), jnp.int32)
    ref_img = model.apply({"params": params}, images, True,
                          method=model.encode_image)["image_features"]
    ref_txt = model.apply({"params": params}, texts, True,
                          method=model.encode_text)["text_features"]

    calls = _spy_fwd_pallas(monkeypatch)
    mesh = create_tp_mesh(2, 4)
    sharded, enc_image, enc_text = make_tp_encoders(model, params, mesh)
    got_img = np.asarray(enc_image(sharded, images))
    got_txt = np.asarray(enc_text(sharded, texts))
    assert calls, "fused kernel did not engage under the TP mesh"
    np.testing.assert_allclose(got_img, np.asarray(ref_img),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got_txt, np.asarray(ref_txt),
                               atol=2e-5, rtol=1e-4)


def test_gspmd_train_step_keeps_fused_kernel(monkeypatch):
    """The GSPMD (2,4) TP train step with use_flash=True matches the 1-D
    shard_map step with the same kernel: the custom_vjp fwd AND bwd
    custom calls partition over the batch axis."""
    import jax.numpy as jnp

    from cosmos_tpu.parallel.mesh import create_mesh, shard_batch
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        create_train_state_gspmd,
        make_train_step,
        make_train_step_gspmd,
    )

    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, use_flash=True, **KERNEL_TINY,
    )
    lr = cosine_lr(1e-3, 2, 10)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr)
    batch = _cosmos_batch(8)

    mesh1 = create_mesh(8)
    opt = create_optimizer(lr, weight_decay=0.1)
    step1 = make_train_step(model, opt, mesh1, cfg)
    s1 = create_train_state(jax.tree.map(jnp.copy, params), opt, mesh1)
    s1, m1 = step1(s1, shard_batch(batch, mesh1, batch_axis=1))

    calls = _spy_fwd_pallas(monkeypatch)
    mesh2 = create_tp_mesh(2, 4)
    opt2 = create_optimizer(lr, weight_decay=0.1)
    step2 = make_train_step_gspmd(model, opt2, mesh2, cfg)
    s2 = create_train_state_gspmd(jax.tree.map(jnp.copy, params), opt2, mesh2)
    b2 = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh2, jax.sharding.PartitionSpec(None, "data"))),
        batch)
    s2, m2 = step2(s2, b2)
    assert calls, "fused kernel did not engage in the GSPMD step"
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    got = np.asarray(jax.device_get(
        s2.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    want = np.asarray(jax.device_get(
        s1.params["visual"]["transformer"]["resblocks_0"]["mlp"]
        ["c_fc"]["kernel"]))
    # looser than the XLA-path twin test: the kernel picks its batch
    # block from the LOCAL batch (1 row/device under shard_map, 4 under
    # the (2,4) mesh), so f32 reduction order differs by ~1e-7 and Adam's
    # 1/(sqrt(v)+eps) normalization amplifies that to ~1e-5 in the first
    # update.  Loss above is bit-equal.
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_tp_eva_clip_with_kernel(monkeypatch):
    """EVA02-trunk CLIP under TP with the kernel ON: the EVA vision tower
    partitions natively (separate-q/kv XLA attention) while the text
    tower's packed kernel rides the custom_partitioning wrapper — the
    big-tower serving case the round-3 guard forced onto the slow path."""
    from cosmos_tpu.models.eva import register_eva

    # width 48 -> SwiGLU hidden int(8/3*48) = 128, divisible by tp=4
    # (real EVA02 hiddens are 128-multiples; width 32's hidden 85 is not)
    register_eva("eva02_tp_kernel_test", patch_size=8, width=48, layers=1,
                 heads=2, scale_mlp=True, scale_attn=True, image_size=16)
    model, params = create_model(
        "ViT-Tiny-Test",
        vision_timm_model_name="eva02_tp_kernel_test",
        vision_timm_pool="token",
        vision_timm_proj="linear",
        vision_image_size=16,
        text_width=128,
        text_heads=2,
        use_flash=True,
    )
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    ctx = model.cfg.text_cfg.context_length
    texts = jnp.asarray(
        rng.integers(1, model.cfg.text_cfg.vocab_size - 1, size=(8, ctx)),
        jnp.int32)
    ref_img = model.apply({"params": params}, images, True,
                          method=model.encode_image)["image_features"]
    ref_txt = model.apply({"params": params}, texts, True,
                          method=model.encode_text)["text_features"]

    calls = _spy_fwd_pallas(monkeypatch)
    mesh = create_tp_mesh(2, 4)
    sharded, enc_image, enc_text = make_tp_encoders(model, params, mesh)
    got_img = np.asarray(enc_image(sharded, images))
    got_txt = np.asarray(enc_text(sharded, texts))
    assert calls, "text-tower kernel did not engage under the TP mesh"
    np.testing.assert_allclose(got_img, np.asarray(ref_img),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got_txt, np.asarray(ref_txt),
                               atol=2e-5, rtol=1e-4)
