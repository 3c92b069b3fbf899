"""Multislice (DCN) hierarchical contrastive gather.

SURVEY §2.3: the TPU-native replacement for the reference's flat
``gather_features`` NCCL all-gather (/root/reference/src/open_clip/loss.py:21-65)
keeps the gather ICI-local per slice when multi-slice.  On the
8-virtual-CPU-device mesh, factored (2 slices x 4 devices):

  - gather_scope='global' (hierarchical two-stage gather) must train
    IDENTICALLY to the flat 1-D data mesh — same loss, same params.
  - gather_scope='slice' must equal the mean of two independent 4-device
    runs on each slice's half of the batch (negatives slice-local), with
    grads still averaged across slices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.parallel.mesh import (
    DATA_AXIS,
    SLICE_AXIS,
    create_mesh,
    create_multislice_mesh,
    shard_batch,
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


def _tiny_cosmos_model():
    return create_model(
        "ViT-B-16", cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, **TINY,
    )


def _cosmos_batch(b, seed=3):
    rng = np.random.default_rng(seed)
    return {
        "global_images": rng.normal(size=(2, b, 16, 16, 3)).astype("float32"),
        "local_images": rng.normal(size=(2, b, 8, 8, 3)).astype("float32"),
        "texts": rng.integers(1, 127, size=(3, b, 12)).astype("int32"),
    }


def _one_step(mesh, params, batch, *, local_loss=False,
              gather_scope="global"):
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    model, _ = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    cfg = TrainStepConfig(cosmos=True, lr_schedule=lr,
                          local_loss=local_loss, gather_scope=gather_scope)
    opt = create_optimizer(lr, weight_decay=0.1)
    step = make_train_step(model, opt, mesh, cfg)
    s = create_train_state(jax.tree.map(jnp.copy, params), opt, mesh)
    s, m = step(s, shard_batch(batch, mesh, batch_axis=1))
    return s, float(m["loss"])


def test_multislice_mesh_shape():
    mesh = create_multislice_mesh(2)
    assert mesh.shape == {SLICE_AXIS: 2, DATA_AXIS: 4}
    mesh = create_multislice_mesh(4, 2)
    assert mesh.shape == {SLICE_AXIS: 4, DATA_AXIS: 2}
    with pytest.raises(ValueError):
        create_multislice_mesh(3)


@pytest.mark.parametrize("local_loss", [False, True])
def test_hierarchical_gather_matches_flat(local_loss):
    """2-stage (ICI-then-DCN) gather == flat 1-D gather: same loss and
    same updated params — the hierarchy is a communication-layout
    change, not a math change."""
    _, params = _tiny_cosmos_model()
    batch = _cosmos_batch(8)

    s1, l1 = _one_step(create_mesh(8), params, batch,
                       local_loss=local_loss)
    s2, l2 = _one_step(create_multislice_mesh(2), params, batch,
                       local_loss=local_loss, gather_scope="global")

    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    k = ["visual", "transformer", "resblocks_0", "mlp", "c_fc", "kernel"]

    def leaf(s):
        t = s.params
        for kk in k:
            t = t[kk]
        return np.asarray(jax.device_get(t))

    np.testing.assert_allclose(leaf(s2), leaf(s1), atol=2e-6)


def test_slice_scope_is_per_slice_loss():
    """gather_scope='slice': the reported loss equals the mean of two
    independent flat runs, each over one slice's half-batch (negatives
    restricted to the slice)."""
    _, params = _tiny_cosmos_model()
    batch = _cosmos_batch(8)

    _, l_slice = _one_step(create_multislice_mesh(2), params, batch,
                           gather_scope="slice")

    # shard_batch splits the batch slice-major: rows 0-3 -> slice 0,
    # rows 4-7 -> slice 1
    halves = []
    for lo, hi in ((0, 4), (4, 8)):
        half = {k: v[:, lo:hi] for k, v in batch.items()}
        _, l = _one_step(create_mesh(4), params, half)
        halves.append(l)
    np.testing.assert_allclose(l_slice, np.mean(halves), rtol=1e-5)


def test_slice_scope_grads_still_average_across_slices():
    """With slice-local negatives the LOSS differs per slice, but the
    parameter update must still be the cross-slice average — both slices
    end the step with identical params (they started identical)."""
    _, params = _tiny_cosmos_model()
    s, _ = _one_step(create_multislice_mesh(2), params, _cosmos_batch(8),
                     gather_scope="slice")
    # params replicated => every addressable shard identical
    leaf = s.params["text"]["token_embedding"]["embedding"]
    vals = {np.asarray(sh.data).tobytes() for sh in leaf.addressable_shards}
    assert len(vals) == 1
    assert np.isfinite(np.asarray(leaf)).all()


def test_siglip_refused_on_multislice():
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        make_train_step,
    )

    model, _ = _tiny_cosmos_model()
    lr = cosine_lr(1e-3, 2, 10)
    opt = create_optimizer(lr)
    with pytest.raises(ValueError, match="multislice"):
        make_train_step(model, opt, create_multislice_mesh(2),
                        TrainStepConfig(cosmos=False, siglip=True,
                                        lr_schedule=lr))
