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
