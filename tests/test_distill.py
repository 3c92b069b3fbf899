"""Model-distillation training: DistillClipLoss numerics vs a hand-computed
case, and the frozen-teacher train-step wiring end-to-end on the CPU mesh.

Reference: /root/reference/src/open_clip/loss.py:256-292 (soft-CE distill),
src/training/main.py:232-240,289-296 (frozen dist model build),
src/training/train.py:148-166 (dist forward in the step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.losses import DistillClipLoss
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import create_mesh
from cosmos_tpu.training.scheduler import cosine_lr
from cosmos_tpu.training.train import (
    TrainStepConfig,
    create_optimizer,
    create_train_state,
    make_train_step,
)

TINY = {
    "embed_dim": 32,
    "vision_image_size": 16,
    "vision_patch_size": 8,
    "vision_width": 32,
    "vision_layers": 2,
    "vision_head_width": 16,
    "text_context_length": 12,
    "text_vocab_size": 128,
    "text_width": 32,
    "text_heads": 2,
    "text_layers": 2,
}


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _np_soft_ce(teacher_logits, student_logits):
    t = np.exp(teacher_logits - teacher_logits.max(1, keepdims=True))
    t = t / t.sum(1, keepdims=True)
    s = student_logits - student_logits.max(1, keepdims=True)
    s = s - np.log(np.exp(s).sum(1, keepdims=True))
    return -(t * s).sum(1).mean(0)


def _np_ce(logits):
    lg = logits - logits.max(1, keepdims=True)
    logp = lg - np.log(np.exp(lg).sum(1, keepdims=True))
    return -np.mean(np.diag(logp))


def test_distill_loss_matches_numpy():
    """contrastive = mean CE(img->txt, txt->img); distill = mean soft-CE of
    the student logits against the frozen teacher's logit rows/cols
    (loss.py:268-292 term-for-term)."""
    rng = np.random.default_rng(0)
    b, d = 6, 8
    img = _norm(rng.normal(size=(b, d))).astype(np.float32)
    txt = _norm(rng.normal(size=(b, d))).astype(np.float32)
    dimg = _norm(rng.normal(size=(b, d))).astype(np.float32)
    dtxt = _norm(rng.normal(size=(b, d))).astype(np.float32)
    scale, dscale = 13.0, 50.0

    out = DistillClipLoss()(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(scale),
        jnp.asarray(dimg), jnp.asarray(dtxt), jnp.asarray(dscale),
        output_dict=True,
    )

    li = scale * img @ txt.T
    lt = scale * txt @ img.T
    dli = dscale * dimg @ dtxt.T
    dlt = dscale * dtxt @ dimg.T
    np.testing.assert_allclose(
        float(out["contrastive_loss"]),
        0.5 * (_np_ce(li) + _np_ce(lt)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(out["distill_loss"]),
        0.5 * (_np_soft_ce(dli, li) + _np_soft_ce(dlt, lt)), rtol=1e-5,
    )


def test_distill_no_teacher_grad():
    """The frozen teacher's features receive zero gradient."""
    rng = np.random.default_rng(1)
    b, d = 4, 8
    feats = [
        jnp.asarray(_norm(rng.normal(size=(b, d))).astype(np.float32))
        for _ in range(4)
    ]

    def total(img, txt, dimg, dtxt):
        out = DistillClipLoss()(
            img, txt, jnp.asarray(10.0), dimg, dtxt, jnp.asarray(10.0),
            output_dict=True,
        )
        return out["contrastive_loss"] + out["distill_loss"]

    grads = jax.grad(total, argnums=(0, 1, 2, 3))(*feats)
    assert np.abs(np.asarray(grads[0])).max() > 0
    assert np.abs(np.asarray(grads[1])).max() > 0
    np.testing.assert_array_equal(np.asarray(grads[2]), 0)
    np.testing.assert_array_equal(np.asarray(grads[3]), 0)


@pytest.fixture(scope="module")
def distill_setup():
    model, params = create_model("ViT-B-16", **TINY)
    dist_model, dist_params = create_model("ViT-B-16", seed=7, **TINY)
    mesh = create_mesh(4)
    lr = cosine_lr(1e-3, 0, 100)
    opt = create_optimizer(lr, weight_decay=0.0)
    cfg = TrainStepConfig(cosmos=False, distill=True, lr_schedule=lr)
    step = make_train_step(model, opt, mesh, cfg, dist_model=dist_model)
    return step, params, opt, dist_params


def _batch(key, b=8, k=2):
    k1, k2 = jax.random.split(key)
    return {
        "global_images": jax.random.normal(k1, (2, b, 16, 16, 3)),
        "texts": jax.random.randint(k2, (k, b, 12), 1, 127),
    }


def test_distill_train_step(distill_setup):
    step, params, opt, dist_params = distill_setup
    state = create_train_state(jax.tree.map(jnp.copy, params), opt)
    before_dist = jax.tree.map(np.asarray, dist_params)
    losses = []
    for i in range(4):
        state, m = step(state, _batch(jax.random.PRNGKey(i)), dist_params)
        assert np.isfinite(float(m["loss"]))
        assert "distill_loss" in m and "contrastive_loss" in m
        losses.append(float(m["loss"]))
    assert int(state.step) == 4
    # the frozen teacher is untouched (never in the optimizer state)
    for a, b_ in zip(jax.tree.leaves(before_dist),
                     jax.tree.leaves(dist_params)):
        np.testing.assert_array_equal(a, np.asarray(b_))


def test_distill_requires_dist_model():
    model, params = create_model("ViT-B-16", **TINY)
    opt = create_optimizer(cosine_lr(1e-3, 0, 10))
    with pytest.raises(ValueError, match="dist_model"):
        make_train_step(model, opt, create_mesh(4),
                        TrainStepConfig(cosmos=False, distill=True))


def test_distill_args_wiring():
    """--distill-model/--distill-pretrained parse into args.distill and
    create_loss dispatches DistillClipLoss."""
    from cosmos_tpu.models.factory import create_loss
    from cosmos_tpu.training.params import parse_args

    args = parse_args([
        "--distill-model", "ViT-B-32", "--distill-pretrained", "/tmp/x.pt",
    ])
    assert args.distill
    assert isinstance(create_loss(args), DistillClipLoss)
    with pytest.raises(SystemExit):
        parse_args(["--distill-model", "ViT-B-32"])
    with pytest.raises(SystemExit):
        parse_args([
            "--distill-model", "ViT-B-32", "--distill-pretrained", "x.pt",
            "--cosmos", "--output-all", "--attentional-pool",
        ])
