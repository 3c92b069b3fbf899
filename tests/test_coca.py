"""CoCa model: forward shapes, caption loss integration, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.losses import CoCaLoss


@pytest.fixture(scope="module")
def coca():
    return create_model("coca_Tiny-Test")


def test_forward_shapes(coca):
    model, params = coca
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 1, 511)
    out = model.apply({"params": params}, imgs, text)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    # teacher forcing drops the last position; CLS excluded from tokens
    assert out["logits"].shape == (2, 11, 512)
    assert out["labels"].shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(text[:, 1:]))


def test_caption_loss_integration(coca):
    model, params = coca
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 1, 511)
    out = model.apply({"params": params}, imgs, text)
    losses = CoCaLoss()(
        out["image_features"], out["text_features"], out["logits"],
        out["labels"], out["logit_scale"], output_dict=True,
    )
    assert np.isfinite(float(losses["caption_loss"]))
    assert np.isfinite(float(losses["contrastive_loss"]))


def test_generation(coca):
    from cosmos_tpu.models.coca import generate

    model, params = coca
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    toks = generate(
        model, params, imgs, seq_len=8,
        sot_token_id=510, eot_token_id=511, min_seq_len=2,
        generation_type="greedy",
    )
    assert toks.shape == (2, 8)
    assert (np.asarray(toks[:, 0]) == 510).all()
    # sampling modes run
    for gt in ("top_k", "top_p"):
        t2 = generate(
            model, params, imgs, seq_len=8, sot_token_id=510,
            eot_token_id=511, min_seq_len=2, generation_type=gt,
            top_k=5, top_p=0.9, rng=jax.random.PRNGKey(3),
        )
        assert t2.shape == (2, 8)


def test_top_p_nucleus_semantics(coca):
    """HF TopPLogitsWarper semantics: a vanishing top_p keeps only the
    argmax, so top_p sampling degenerates to greedy — the old inverted
    cutoff kept ~the whole vocabulary at small top_p instead."""
    from cosmos_tpu.models.coca import generate

    model, params = coca
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    greedy = generate(
        model, params, imgs, seq_len=8, sot_token_id=510,
        eot_token_id=511, min_seq_len=2, generation_type="greedy",
    )
    nucleus = generate(
        model, params, imgs, seq_len=8, sot_token_id=510,
        eot_token_id=511, min_seq_len=2, generation_type="top_p",
        top_p=1e-6, rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_array_equal(np.asarray(nucleus), np.asarray(greedy))


def test_beam_search(coca):
    from cosmos_tpu.models.coca import beam_search_generate

    model, params = coca
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    toks = beam_search_generate(
        model, params, imgs, num_beams=3, seq_len=8,
        sot_token_id=510, eot_token_id=511, min_seq_len=2,
    )
    assert toks.shape == (2, 8)
    assert (np.asarray(toks[:, 0]) == 510).all()


def test_coca_train_step(coca):
    """CoCa trains through the generic train step (reference routes CoCa
    through the same loop via loss(**model_out), train.py:162-190): the
    caption CE + contrastive losses both appear and the step is finite."""
    import jax.numpy as jnp
    from cosmos_tpu.parallel.mesh import create_mesh
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    model, params = coca
    mesh = create_mesh(4)
    lr = cosine_lr(1e-3, 0, 100)
    opt = create_optimizer(lr, weight_decay=0.0)
    cfg = TrainStepConfig(
        cosmos=False, coca=True,
        coca_caption_loss_weight=2.0, coca_contrastive_loss_weight=1.0,
        lr_schedule=lr,
    )
    step = make_train_step(model, opt, mesh, cfg)
    state = create_train_state(jax.tree.map(jnp.copy, params), opt)
    b = 8
    batch = {
        "global_images": jax.random.normal(
            jax.random.PRNGKey(0), (1, b, 32, 32, 3)
        ),
        "texts": jax.random.randint(jax.random.PRNGKey(1), (1, b, 12), 1, 511),
    }
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        assert "caption_loss" in m and "contrastive_loss" in m
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


def test_coca_main_dispatch():
    """main.py routes coca models into the CoCa loss branch: the parsed
    args reject incompatible modes and create_loss returns CoCaLoss."""
    import pytest
    from cosmos_tpu.models.factory import create_loss
    from cosmos_tpu.training.params import parse_args

    args = parse_args(["--model", "coca_ViT-B-32",
                       "--coca-caption-loss-weight", "1.5"])
    loss = create_loss(args)
    assert isinstance(loss, CoCaLoss)
    assert loss.caption_loss_weight == 1.5
    with pytest.raises(SystemExit):
        parse_args(["--model", "coca_ViT-B-32", "--siglip"])
    # multicrop with CoCa: the step trains on single-view batches, so the
    # 6 local crops would be decoded + transferred then discarded — the
    # flag combination must fail at parse time
    with pytest.raises(SystemExit):
        parse_args(["--model", "coca_ViT-B-32",
                    "--train-data", "x.csv", "--use-imagecrop-aug"])
    # ...but eval-only runs with the flag still parse (no training step)
    parse_args(["--model", "coca_ViT-B-32", "--use-imagecrop-aug"])
