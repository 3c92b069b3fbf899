"""Public-API parity with open_clip's __init__ exports.

Every name the reference package exports
(/root/reference/src/open_clip/__init__.py:1-16) must resolve on
cosmos_tpu.  Torch-specific names are intentionally aliased
(CustomTextCLIP -> the unified CLIP class) or re-typed
(convert_weights_to_lp operates on a param pytree), documented in the
export table (cosmos_tpu/__init__.py).
"""

import pytest

import cosmos_tpu

REFERENCE_EXPORTS = [
    # coca_model
    "CoCa",
    # constants
    "OPENAI_DATASET_MEAN", "OPENAI_DATASET_STD",
    # factory
    "create_model", "create_model_and_transforms",
    "create_model_from_pretrained", "get_tokenizer", "create_loss",
    "list_models", "add_model_config", "get_model_config", "load_checkpoint",
    # loss
    "ClipLoss", "DistillClipLoss", "CoCaLoss",
    # model
    "CLIP", "CustomTextCLIP", "CLIPTextCfg", "CLIPVisionCfg",
    "convert_weights_to_lp", "convert_weights_to_fp16", "trace_model",
    "get_cast_dtype", "get_input_dtype",
    "get_model_tokenize_cfg", "get_model_preprocess_cfg",
    "set_model_preprocess_cfg",
    # openai
    "load_openai_model", "list_openai_models",
    # pretrained
    "list_pretrained", "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model", "get_pretrained_url",
    "download_pretrained_from_url", "is_pretrained_cfg",
    "get_pretrained_cfg", "download_pretrained",
    # push_to_hf_hub
    "push_pretrained_to_hf_hub", "push_to_hf_hub",
    # tokenizer
    "SimpleTokenizer", "tokenize", "decode",
    # transform
    "image_transform", "AugmentationCfg",
    # zero_shot_classifier
    "build_zero_shot_classifier", "build_zero_shot_classifier_legacy",
    # zero_shot_metadata
    "OPENAI_IMAGENET_TEMPLATES", "SIMPLE_IMAGENET_TEMPLATES",
    "IMAGENET_CLASSNAMES",
]


@pytest.mark.parametrize("name", REFERENCE_EXPORTS)
def test_reference_export_resolves(name):
    assert getattr(cosmos_tpu, name) is not None


def test_metadata_shapes():
    assert len(cosmos_tpu.IMAGENET_CLASSNAMES) == 1000
    assert len(cosmos_tpu.OPENAI_IMAGENET_TEMPLATES) == 80
    assert len(cosmos_tpu.SIMPLE_IMAGENET_TEMPLATES) == 7
    assert cosmos_tpu.IMAGENET_CLASSNAMES[0] == "tench"
    # format-string templates work with the classifier builder's contract
    t = cosmos_tpu.OPENAI_IMAGENET_TEMPLATES[0]
    assert "{}" in t and t.format("dog")


def test_openai_registry():
    models = cosmos_tpu.list_openai_models()
    assert "ViT-B-16" in models and "RN50" in models
    assert cosmos_tpu.is_pretrained_cfg("ViT-B-16", "openai")
    assert cosmos_tpu.get_pretrained_url("ViT-B-16", "openai").startswith(
        "https://openaipublic")
    assert "ViT-B-16:cosmos_cc3m" in cosmos_tpu.list_pretrained()


def test_add_model_config(tmp_path):
    import json

    cfg = {"embed_dim": 8,
           "vision_cfg": {"image_size": 32, "patch_size": 16, "width": 32,
                          "layers": 1, "head_width": 16},
           "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 16,
                        "layers": 1, "heads": 2}}
    p = tmp_path / "My-Test-Model.json"
    p.write_text(json.dumps(cfg))
    cosmos_tpu.add_model_config(p)
    assert "My-Test-Model" in cosmos_tpu.list_models()
    assert cosmos_tpu.get_model_config("My-Test-Model")["embed_dim"] == 8
    model, params = cosmos_tpu.create_model("My-Test-Model", seed=0)
    assert model.cfg.embed_dim == 8


def test_cast_and_preprocess_helpers():
    import jax.numpy as jnp

    assert cosmos_tpu.get_cast_dtype("pure_bf16") == jnp.bfloat16
    assert cosmos_tpu.get_cast_dtype("amp") is None
    model, params = cosmos_tpu.create_model("ViT-Tiny-Test", seed=0)
    pp = cosmos_tpu.get_model_preprocess_cfg(model)
    assert pp["size"] == model.cfg.vision_cfg.image_size
    cosmos_tpu.set_model_preprocess_cfg(model, {**pp, "mean": (0.5, 0.5, 0.5)})
    assert cosmos_tpu.get_model_preprocess_cfg(model)["mean"] == (0.5, 0.5, 0.5)
    tk = cosmos_tpu.get_model_tokenize_cfg(model)
    assert tk["context_length"] == model.cfg.text_cfg.context_length
    # pytree weight casting keeps integers untouched
    cast = cosmos_tpu.convert_weights_to_fp16(
        {"w": jnp.zeros((2,), jnp.float32), "i": jnp.zeros((2,), jnp.int32)})
    assert cast["w"].dtype == jnp.float16 and cast["i"].dtype == jnp.int32


def test_image_transform_dispatch():
    import numpy as np
    from PIL import Image

    img = Image.fromarray(np.zeros((40, 52, 3), np.uint8))
    eval_tf = cosmos_tpu.image_transform(32, is_train=False)
    assert eval_tf(img).shape == (32, 32, 3)
    train_tf = cosmos_tpu.image_transform(
        32, is_train=True, aug_cfg=cosmos_tpu.AugmentationCfg(scale=(0.8, 1.0)))
    assert train_tf(img).shape == (32, 32, 3)
    with pytest.raises(NotImplementedError):
        cosmos_tpu.image_transform(
            32, is_train=True, aug_cfg=cosmos_tpu.AugmentationCfg(use_timm=True))


def test_pool_type_variants_forward():
    """'avg' and 'none' vision pooling produce correct shapes end-to-end
    (reference --pool-type choices, params.py:566-571)."""
    import jax
    import jax.numpy as jnp

    for pool, check in (
        ("avg", lambda out: out["image_features"].shape == (2, 32)),
        ("none", lambda out: out["image_features"].ndim in (2, 3)),
    ):
        model, params = cosmos_tpu.create_model(
            "ViT-Tiny-Test", vision_pool_type=pool, seed=1)
        out = model.apply(
            {"params": params},
            jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 16), jnp.int32))
        assert check(out), pool
        assert bool(jnp.isfinite(
            jnp.asarray(out["image_features"], jnp.float32)).all())


def test_create_model_and_transforms_accepts_aug_dataclass():
    import numpy as np
    from PIL import Image

    model, params, train_tf, val_tf = cosmos_tpu.create_model_and_transforms(
        "ViT-Tiny-Test",
        aug_cfg=cosmos_tpu.AugmentationCfg(scale=(0.5, 1.0)),
    )
    img = Image.fromarray(np.zeros((40, 40, 3), np.uint8))
    assert train_tf(img).shape == (32, 32, 3)
    assert val_tf(img).shape == (32, 32, 3)
