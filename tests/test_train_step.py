"""End-to-end train-step tests on the 8-device CPU mesh: loss decreases,
EMA ordering, logit-scale clamping, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import create_mesh
from cosmos_tpu.training.scheduler import cosine_lr, cosine_scheduler
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


def make_batch(key, b=16, n_local=2, k=3):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "global_images": jax.random.normal(k1, (2, b, 16, 16, 3)),
        "local_images": jax.random.normal(k2, (n_local, b, 8, 8, 3)),
        "texts": jax.random.randint(k3, (k, b, 12), 1, 127),
    }


@pytest.fixture(scope="module")
def setup():
    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, **TINY
    )
    mesh = create_mesh(8)
    lr = cosine_lr(1e-3, 5, 100)
    optimizer = create_optimizer(lr, weight_decay=0.1, grad_clip_norm=1.0)
    cfg = TrainStepConfig(
        cosmos=True,
        momentum_schedule=cosine_scheduler(0.99, 1.0, 0, 100),
        fix_momentum=False,
        lr_schedule=lr,
        # the optimizer clips, so the norm is free — and main.py enables
        # the metric whenever clipping is on
        log_grad_norm=True,
    )
    step_fn = make_train_step(model, optimizer, mesh, cfg)

    def fresh_state():
        # step donates its input state, so each test needs its own copy
        return create_train_state(jax.tree.map(jnp.copy, params), optimizer)

    return model, step_fn, fresh_state, mesh


def test_loss_decreases(setup):
    _, step_fn, fresh_state, _ = setup
    state = fresh_state()
    batch = make_batch(jax.random.PRNGKey(0))
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    assert float(state.step) == 8


def test_metrics_keys(setup):
    _, step_fn, fresh_state, _ = setup
    state = fresh_state()
    state, metrics = step_fn(state, make_batch(jax.random.PRNGKey(1)))
    for key in ("loss", "distill_loss", "clip_loss", "grad_norm",
                "momentum", "lr", "logit_scale"):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key


def test_ema_uses_pre_update_student(setup):
    """teacher_{t+1} = m*teacher_t + (1-m)*student_t (NOT student_{t+1})."""
    model, step_fn, fresh_state, _ = setup
    state = fresh_state()
    batch = make_batch(jax.random.PRNGKey(2))
    # snapshot to host BEFORE stepping: the step donates the state buffers
    old_student = np.asarray(state.params["visual"]["class_embedding"])
    old_teacher = np.asarray(state.teacher_params["visual"]["class_embedding"])
    new_state, metrics = step_fn(state, batch)
    m = float(metrics["momentum"])
    expected = m * np.asarray(old_teacher) + (1 - m) * np.asarray(old_student)
    np.testing.assert_allclose(
        np.asarray(new_state.teacher_params["visual"]["class_embedding"]),
        expected,
        rtol=1e-5,
        atol=1e-7,
    )


def test_logit_scale_clamped(setup):
    model, step_fn, fresh_state, _ = setup
    state = fresh_state()
    # force the scales above the clamp
    params = dict(state.params)
    params["logit_scale"] = jnp.asarray(10.0)
    params["distill_logit_scale"] = jnp.asarray(10.0)
    state = state.replace(params=params)
    new_state, _ = step_fn(state, make_batch(jax.random.PRNGKey(3)))
    assert float(new_state.params["logit_scale"]) <= 4.60518
    assert float(new_state.params["distill_logit_scale"]) <= 4.60518
    assert float(new_state.teacher_params["logit_scale"]) <= 4.60518


def test_weight_decay_mask():
    from cosmos_tpu.training.train import wd_mask

    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, **TINY
    )
    mask = wd_mask(params)
    # logit scales and LN params exempt; projection matrices decayed
    assert mask["logit_scale"] is False
    assert mask["visual"]["ln_post"]["scale"] is False
    assert mask["visual"]["proj"] is True
    assert mask["text"]["token_embedding"]["embedding"] is True
    assert mask["visual"]["class_embedding"] is False  # ndim 1


def test_clip_mode_no_teacher_needed():
    model, params = create_model("ViT-B-16", **TINY)
    mesh = create_mesh(8)
    optimizer = create_optimizer(cosine_lr(1e-3, 0, 10))
    cfg = TrainStepConfig(cosmos=False)
    step_fn = make_train_step(model, optimizer, mesh, cfg)
    state = create_train_state(params, optimizer)
    batch = make_batch(jax.random.PRNGKey(0), k=1, n_local=2)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accumulation_matches_big_batch_exactly():
    """Plain-CLIP accumulation uses the OpenCLIP cached-features algorithm
    (upstream open_clip train.py accum branch): accum_freq=2 over two
    half-batches must EQUAL one full batch — same loss, same gradients,
    same updated params — because every microbatch's loss sees the full
    batch of negatives."""
    model, params = create_model("ViT-B-16", **TINY)
    mesh = create_mesh(4)
    lr = cosine_lr(1e-3, 0, 100)
    opt = create_optimizer(lr, weight_decay=0.0)

    big = make_batch(jax.random.PRNGKey(7), b=8, k=1)
    halves = {
        k: jnp.stack([v[:, :4], v[:, 4:]]) for k, v in big.items()
    }

    step_big = make_train_step(model, opt, mesh,
                               TrainStepConfig(cosmos=False,
                                               log_grad_norm=True))
    step_acc = make_train_step(model, opt, mesh,
                               TrainStepConfig(cosmos=False, accum_freq=2,
                                               log_grad_norm=True))
    s_big = create_train_state(jax.tree.map(jnp.copy, params), opt)
    s_acc = create_train_state(jax.tree.map(jnp.copy, params), opt)
    s_big, m_big = step_big(s_big, big)
    s_acc, m_acc = step_acc(s_acc, halves)

    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_big["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_acc["grad_norm"]), float(m_big["grad_norm"]), rtol=1e-4
    )
    flat_big = jax.tree.leaves(s_big.params)
    flat_acc = jax.tree.leaves(s_acc.params)
    for xb, xa in zip(flat_big, flat_acc):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=2e-4, atol=2e-5
        )


def test_grad_accumulation_cosmos_averages():
    """COSMOS accumulation (per-microbatch denominators, documented
    divergence — the reference asserts accum_freq==1 there) still steps
    finitely with the EMA/clamp machinery applied."""
    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, **TINY
    )
    mesh = create_mesh(4)
    opt = create_optimizer(cosine_lr(1e-3, 0, 100), weight_decay=0.0)
    big = make_batch(jax.random.PRNGKey(7), b=8)
    halves = {
        k: jnp.stack([v[:, :4], v[:, 4:]]) for k, v in big.items()
    }
    step_acc = make_train_step(model, opt, mesh,
                               TrainStepConfig(cosmos=True, accum_freq=2))
    s_acc = create_train_state(jax.tree.map(jnp.copy, params), opt)
    s_acc, m_acc = step_acc(s_acc, halves)
    assert np.isfinite(float(m_acc["loss"]))
    assert float(s_acc.step) == 1


def test_lit_locking_freezes_image_tower():
    from cosmos_tpu.training.train import frozen_mask

    model, params = create_model("ViT-B-16", **TINY)
    mesh = create_mesh(4)
    opt = create_optimizer(cosine_lr(1e-2, 0, 10), lock_image=True)
    step = make_train_step(model, opt, mesh, TrainStepConfig(cosmos=False))
    state = create_train_state(jax.tree.map(jnp.copy, params), opt)
    before_vis = np.asarray(params["visual"]["proj"])
    before_txt = np.asarray(params["text"]["positional_embedding"])
    state, _ = step(state, make_batch(jax.random.PRNGKey(0), k=1))
    np.testing.assert_array_equal(
        np.asarray(state.params["visual"]["proj"]), before_vis
    )
    assert np.abs(
        np.asarray(state.params["text"]["positional_embedding"]) - before_txt
    ).max() > 0


def test_remat_step_runs():
    """--grad-checkpointing path compiles and runs on the mesh."""
    model, params = create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, grad_checkpointing=True, **TINY
    )
    mesh = create_mesh(4)
    opt = create_optimizer(cosine_lr(1e-3, 0, 10))
    step = make_train_step(model, opt, mesh, TrainStepConfig(cosmos=True))
    state = create_train_state(params, opt)
    state, m = step(state, make_batch(jax.random.PRNGKey(0), b=8))
    assert np.isfinite(float(m["loss"]))


def test_remat_policy_step_matches_no_remat():
    """A named checkpoint policy (save matmul outputs) changes memory, not
    math: one step under dots_with_no_batch_dims_saveable must produce the
    same loss as the default full-recompute remat."""
    losses = []
    for policy in ("", "dots_with_no_batch_dims_saveable"):
        model, params = create_model(
            "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
            add_zero_attn=True, grad_checkpointing=True,
            remat_policy=policy, seed=0, **TINY
        )
        mesh = create_mesh(4)
        opt = create_optimizer(cosine_lr(1e-3, 0, 10))
        step = make_train_step(model, opt, mesh, TrainStepConfig(cosmos=True))
        state = create_train_state(params, opt)
        state, m = step(state, make_batch(jax.random.PRNGKey(0), b=8))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_siglip_mode_step():
    model, params = create_model(
        "ViT-B-16", init_logit_bias=-10.0, **TINY
    )
    mesh = create_mesh(4)
    opt = create_optimizer(cosine_lr(1e-3, 0, 10))
    step = make_train_step(model, opt, mesh,
                           TrainStepConfig(cosmos=False, siglip=True))
    state = create_train_state(params, opt)
    state, m = step(state, make_batch(jax.random.PRNGKey(0), b=8, k=1))
    assert np.isfinite(float(m["loss"]))


def test_lock_image_unlocked_groups():
    """--lock-image-unlocked-groups keeps the head + last blocks trainable
    (reference VisionTransformer.lock semantics)."""
    from cosmos_tpu.training.train import frozen_mask

    model, params = create_model("ViT-B-16", **TINY)
    mask = frozen_mask(params, lock_image=True, unlocked_groups=2)
    # head (ln_post/proj) and the LAST block stay trainable
    assert mask["visual"]["proj"] is False
    assert mask["visual"]["ln_post"]["scale"] is False
    assert all(
        v is False
        for v in jax.tree.leaves(mask["visual"]["transformer"]["resblocks_1"])
    )
    # earlier blocks + embeddings frozen
    assert all(
        v is True
        for v in jax.tree.leaves(mask["visual"]["transformer"]["resblocks_0"])
    )
    assert mask["visual"]["conv1_kernel"] is True
    # text untouched
    assert all(v is False for v in jax.tree.leaves(mask["text"]))

    # n=1 unlocks ONLY proj (reference transformer.py:560-578: proj is its
    # own group; ln_post belongs to group 2 with the last resblock)
    mask1 = frozen_mask(params, lock_image=True, unlocked_groups=1)
    assert mask1["visual"]["proj"] is False
    assert mask1["visual"]["ln_post"]["scale"] is True
    assert all(
        v is True
        for v in jax.tree.leaves(mask1["visual"]["transformer"]["resblocks_1"])
    )


def test_lock_image_stem_group_and_range():
    """The final lock group is the stem (reference transformer.py:565-571):
    unlocked_groups == n_layers+2 unlocks conv1/class/pos/ln_pre; out-of-
    range counts raise instead of silently no-opping."""
    from cosmos_tpu.training.train import frozen_mask

    model, params = create_model("ViT-B-16", **TINY)   # 2 vision layers
    full = frozen_mask(params, lock_image=True, unlocked_groups=4)
    assert full["visual"]["conv1_kernel"] is False
    assert full["visual"]["class_embedding"] is False
    assert full["visual"]["positional_embedding"] is False
    assert all(v is False for v in jax.tree.leaves(full["visual"]))
    near = frozen_mask(params, lock_image=True, unlocked_groups=3)
    assert near["visual"]["conv1_kernel"] is True      # stem still locked
    assert all(
        v is False
        for v in jax.tree.leaves(near["visual"]["transformer"])
    )
    with pytest.raises(ValueError, match="exceeds"):
        frozen_mask(params, lock_image=True, unlocked_groups=5)


def test_lock_text_unlocked_layers():
    """--lock-text-unlocked-layers keeps the last n text resblocks (plus
    ln_final / text_projection) trainable; embeddings + earlier blocks
    freeze.  --lock-text-freeze-layer-norm=False exempts LN params inside
    the frozen modules (reference hf_model.py:171-186 semantics)."""
    from cosmos_tpu.training.train import frozen_mask

    model, params = create_model("ViT-B-16", **TINY)   # 2 text layers
    mask = frozen_mask(params, lock_text=True, text_unlocked_layers=1)
    assert all(
        v is False
        for v in jax.tree.leaves(mask["text"]["transformer"]["resblocks_1"])
    )
    assert all(
        v is True
        for v in jax.tree.leaves(mask["text"]["transformer"]["resblocks_0"])
    )
    assert mask["text"]["ln_final"]["scale"] is False
    assert mask["text"]["text_projection_kernel"] is False
    assert mask["text"]["token_embedding"]["embedding"] is True
    assert mask["text"]["positional_embedding"] is True
    # the visual tower is untouched
    assert all(v is False for v in jax.tree.leaves(mask["visual"]))

    # LN exemption inside frozen blocks
    soft = frozen_mask(params, lock_text=True, text_unlocked_layers=0,
                       text_freeze_layer_norm=False)
    assert soft["text"]["transformer"]["resblocks_0"]["ln_1"]["scale"] is False
    assert soft["text"]["transformer"]["resblocks_0"]["attn"][
        "in_proj_kernel"] is True

    # full text lock (default) freezes everything including LNs
    hard = frozen_mask(params, lock_text=True)
    assert all(v is True for v in jax.tree.leaves(hard["text"]))


def test_grad_clip_excludes_frozen_params():
    """clip_by_global_norm must see ZEROED frozen grads (reference:
    requires_grad=False params are invisible to clip_grad_norm_) — a
    locked tower's gradient norm must not throttle the trainable one."""
    import optax

    from cosmos_tpu.training.train import frozen_mask

    model, params = create_model("ViT-B-16", **TINY)
    # artificial grads: HUGE in the (locked) image tower, tiny elsewhere
    grads = jax.tree.map(jnp.zeros_like, params)
    grads["visual"] = jax.tree.map(
        lambda x: jnp.full_like(x, 1e3), grads["visual"]
    )
    grads["text"] = jax.tree.map(
        lambda x: jnp.full_like(x, 1e-3), grads["text"]
    )
    trainable_norm = optax.global_norm(
        jax.tree.map(
            lambda f, g: jnp.zeros_like(g) if f else g,
            frozen_mask(params, lock_image=True), grads,
        )
    )
    clip = float(trainable_norm) * 10.0  # far above the trainable norm
    opt = create_optimizer(
        cosine_lr(1e-2, 0, 10), lock_image=True, grad_clip_norm=clip,
        weight_decay=0.0,
    )
    updates, _ = opt.update(grads, opt.init(params), params)
    # if the frozen tower's 1e3 grads had entered the norm, the clip
    # scale (~clip/huge) would shrink the text updates by orders of
    # magnitude; correct ordering leaves them at full (unclipped) size
    lr0 = cosine_lr(1e-2, 0, 10)(0)
    got = float(jnp.abs(updates["text"]["positional_embedding"]).max())
    assert got > 0.5 * float(lr0) * 1e-3
    # frozen leaves still receive exactly zero updates
    assert float(jnp.abs(updates["visual"]["proj"]).max()) == 0.0


def test_accum_applies_patch_dropout():
    """--accum-freq > 1 must still apply --force-patch-dropout: the
    cached-features pass used to run without the patch_drop rng, silently
    disabling the requested regularization."""
    def losses(patch_dropout):
        model, params = create_model(
            "ViT-B-16", **{**TINY, "force_patch_dropout": patch_dropout}
        )
        mesh = create_mesh(4)
        opt = create_optimizer(cosine_lr(1e-3, 0, 10), weight_decay=0.0)
        step = make_train_step(
            model, opt, mesh,
            TrainStepConfig(cosmos=False, accum_freq=2),
        )
        state = create_train_state(params, opt)
        big = make_batch(jax.random.PRNGKey(3), b=8, k=1)
        halves = {k: jnp.stack([v[:, :4], v[:, 4:]]) for k, v in big.items()}
        _, m = step(state, halves)
        return float(m["loss"])

    base = losses(0.0)
    dropped = losses(0.5)
    assert np.isfinite(base) and np.isfinite(dropped)
    # dropout active in the accum path -> the loss differs from the
    # dropout-free trace (before the fix they were bit-identical)
    assert abs(base - dropped) > 1e-6


def test_step_frozen_mask_shrinks_grad_norm_metric():
    """TrainStepConfig.frozen (set by main.py under LiT locking) zeroes
    locked grads inside the step, so the grad_norm metric reports the
    TRAINABLE subset like the reference (frozen params have no grads)."""
    from cosmos_tpu.training.train import frozen_mask

    model, params = create_model("ViT-B-16", **TINY)
    mesh = create_mesh(4)
    opt = create_optimizer(cosine_lr(1e-2, 0, 10), lock_image=True)
    batch = make_batch(jax.random.PRNGKey(1), k=1)

    def norm(frozen):
        step = make_train_step(
            model, opt, mesh,
            TrainStepConfig(cosmos=False, log_grad_norm=True, frozen=frozen),
        )
        state = create_train_state(jax.tree.map(jnp.copy, params), opt)
        _, m = step(state, batch)
        return float(m["grad_norm"])

    full = norm(None)
    masked = norm(frozen_mask(params, lock_image=True))
    assert 0.0 < masked < full


def test_patch_dropout_keys_on_seed():
    """The patch-drop mask stream must key on --seed (reference ties all
    dropout to seed + rank, main.py:46-49): different seeds draw
    different masks; the same seed is bit-reproducible."""
    def loss_with_seed(seed):
        model, params = create_model(
            "ViT-B-16", **{**TINY, "force_patch_dropout": 0.5}
        )
        mesh = create_mesh(4)
        opt = create_optimizer(cosine_lr(1e-3, 0, 10), weight_decay=0.0)
        step = make_train_step(
            model, opt, mesh, TrainStepConfig(cosmos=False, seed=seed)
        )
        state = create_train_state(jax.tree.map(jnp.copy, params), opt)
        batch = make_batch(jax.random.PRNGKey(3), b=8, k=1)
        _, m = step(state, batch)
        return float(m["loss"])

    a = loss_with_seed(0)
    b = loss_with_seed(0)
    c = loss_with_seed(1)
    assert a == b
    assert abs(a - c) > 1e-7
