"""Reference-format checkpoint fixture test.

Assembles a torch .pt shaped exactly like a released COSMOS checkpoint —
{'epoch', 'name', 'student', 'teacher', 'optimizer'} with 'module.'
prefixes on every student key and the full COSMOS key set
(visual.attn_cross_pool.*, text_attn_cross_pool.*, image/text token
mappings, distill_logit_scale) — then drives the real load paths:
load_checkpoint(which='teacher'/'student') and a CLIPSegmentor built from
the teacher weights.

Parity targets: /root/reference/src/main.py:406-435 (resume key layout),
training/clip_segmentor.py:32-109 (teacher weights for segmentation),
open_clip/factory.py:147-182 (module.-prefix stripping).
"""

import numpy as np
import pytest
import torch

from cosmos_tpu.models.checkpoint import (
    load_checkpoint,
    params_to_torch_state_dict,
)
from cosmos_tpu.models.factory import create_model, get_tokenizer


def _tree_allclose(a, b, atol=1e-6):
    import jax

    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=atol
        )


@pytest.fixture(scope="module")
def cosmos_ckpt(tmp_path_factory):
    model, student = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, seed=0,
    )
    _, teacher = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, seed=7,
    )

    sd_student = {
        f"module.{k}": torch.from_numpy(np.asarray(v).copy())
        for k, v in params_to_torch_state_dict(student).items()
    }
    sd_teacher = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in params_to_torch_state_dict(teacher).items()
    }
    # released checkpoints carry the cosmos head keys — fail loudly if the
    # exporter ever stops producing them
    for want in (
        "module.visual.attn_cross_pool.ln_q.weight",
        "module.text_attn_cross_pool.attn.in_proj_weight",
        "module.image_token_mapping.weight",
        "module.text_token_mapping.bias",
        "module.distill_logit_scale",
    ):
        assert want in sd_student, sorted(sd_student)[:10]

    path = tmp_path_factory.mktemp("ckpt") / "epoch_3.pt"
    torch.save(
        {
            "epoch": 3,
            "name": "cosmos_test",
            "student": sd_student,
            "teacher": sd_teacher,
            "optimizer": {"state": {}, "param_groups": []},
        },
        str(path),
    )
    return model, student, teacher, str(path)


def test_load_teacher_weights_exact(cosmos_ckpt):
    model, student, teacher, path = cosmos_ckpt
    _, init = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, seed=99,
    )
    loaded = load_checkpoint(model, init, path, which="teacher")
    _tree_allclose(loaded, teacher)


def test_load_student_strips_module_prefix(cosmos_ckpt):
    model, student, teacher, path = cosmos_ckpt
    _, init = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, seed=99,
    )
    loaded = load_checkpoint(model, init, path, which="student")
    _tree_allclose(loaded, student)


def test_loaded_teacher_embedding_parity(cosmos_ckpt):
    """Embeddings from the loaded tree match the original teacher."""
    import jax.numpy as jnp

    model, _, teacher, path = cosmos_ckpt
    _, init = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, seed=99,
    )
    loaded = load_checkpoint(model, init, path, which="teacher")
    size = model.cfg.vision_cfg.image_size
    ctx = model.cfg.text_cfg.context_length
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, size, size, 3)), jnp.float32)
    tokens = jnp.asarray(
        rng.integers(1, model.cfg.text_cfg.vocab_size - 1, size=(2, ctx)),
        jnp.int32,
    )
    a = model.apply({"params": loaded}, images, tokens)
    b = model.apply({"params": teacher}, images, tokens)
    np.testing.assert_allclose(
        np.asarray(a["image_features"]), np.asarray(b["image_features"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(a["text_features"]), np.asarray(b["text_features"]),
        atol=1e-5,
    )


def test_segmentor_from_reference_checkpoint(cosmos_ckpt):
    """clip_segmentor.py:103-109 flow: teacher weights drive segmentation."""
    from cosmos_tpu.segmentation.segmentor import CLIPSegmentor

    model, _, teacher, path = cosmos_ckpt
    _, init = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, seed=99,
    )
    loaded = load_checkpoint(model, init, path, which="teacher")
    tok = get_tokenizer("ViT-Tiny-Test")
    seg = CLIPSegmentor(
        model, loaded, tok, ["cat", "dog, puppy", "sky"],
        slide_crop=32, slide_stride=16,
    )
    img = np.random.default_rng(1).integers(
        0, 255, (40, 56, 3), dtype=np.uint8
    )
    pred = seg.predict(img, ori_shape=(40, 56))
    assert pred.shape == (40, 56)
    assert pred.min() >= 0 and pred.max() < 3
