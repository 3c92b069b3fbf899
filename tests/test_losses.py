"""Loss tests: hand-computed small cases, multi-view pairing equivalence,
and sharded-vs-single-device equality on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cosmos_tpu.losses import ClipLoss, COSMOSLoss, SigLipLoss, CoCaLoss


def _np_infonce(img, txt, scale):
    """Reference-semantics single-pair CLIP loss in numpy."""
    logits = scale * img @ txt.T

    def ce(lg):
        lg = lg - lg.max(axis=1, keepdims=True)
        logp = lg - np.log(np.exp(lg).sum(axis=1, keepdims=True))
        return -np.mean(np.diag(logp))

    return 0.5 * (ce(logits) + ce(logits.T))


def rand_feats(key, v, b, d):
    x = jax.random.normal(key, (v, b, d))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def test_clip_loss_single_view_matches_numpy():
    img = np.asarray(rand_feats(jax.random.PRNGKey(0), 1, 8, 16))[0]
    txt = np.asarray(rand_feats(jax.random.PRNGKey(1), 1, 8, 16))[0]
    expected = _np_infonce(img, txt, 10.0)
    got = ClipLoss()(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(10.0))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_clip_loss_multiview_equals_pair_loop():
    """The batched einsum must equal the reference's explicit V_i x V_t loop."""
    img = rand_feats(jax.random.PRNGKey(0), 3, 6, 16)
    txt = rand_feats(jax.random.PRNGKey(1), 4, 6, 16)
    scale = jnp.asarray(7.0)
    got = ClipLoss()(img, txt, scale)
    total = 0.0
    for i in range(3):
        for j in range(4):
            total += _np_infonce(np.asarray(img[i]), np.asarray(txt[j]), 7.0)
    np.testing.assert_allclose(got, total / 12.0, rtol=1e-5)


def test_cosmos_loss_composition():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    s_img = rand_feats(ks[0], 4, 5, 8)   # 2 global + 2 local views
    s_txt = rand_feats(ks[1], 3, 5, 8)
    t_img = rand_feats(ks[2], 2, 5, 8)
    t_txt = rand_feats(ks[3], 2, 5, 8)
    s_img_cm = rand_feats(ks[4], 4, 5, 8)
    s_txt_cm = rand_feats(ks[5], 3, 5, 8)
    scale, dscale = jnp.asarray(10.0), jnp.asarray(5.0)

    out = COSMOSLoss()(
        s_img, s_txt, scale,
        t_image_features=t_img, t_text_features=t_txt,
        distill_logit_scale=dscale,
        s_img_crossmodal_features=s_img_cm,
        s_txt_crossmodal_features=s_txt_cm,
        output_dict=True,
    )
    cl = ClipLoss()
    expected_distill = (
        cl(s_img_cm, t_img, dscale) + cl(s_img_cm, t_txt, dscale)
        + cl(s_txt_cm, t_img, dscale) + cl(s_txt_cm, t_txt, dscale)
    ) / 4
    expected_clip = cl(s_img[:2], s_txt, scale)
    np.testing.assert_allclose(out["distill_loss"], expected_distill, rtol=1e-6)
    np.testing.assert_allclose(out["clip_loss"], expected_clip, rtol=1e-6)


def test_cosmos_loss_no_teacher_grad():
    """Gradient wrt teacher features must be exactly zero."""
    s_img = rand_feats(jax.random.PRNGKey(0), 2, 4, 8)
    s_txt = rand_feats(jax.random.PRNGKey(1), 2, 4, 8)
    t_img = rand_feats(jax.random.PRNGKey(2), 2, 4, 8)

    def f(t):
        return COSMOSLoss()(
            s_img, s_txt, jnp.asarray(10.0),
            t_image_features=t, t_text_features=t,
            s_img_crossmodal_features=s_img,
            s_txt_crossmodal_features=s_txt,
        )

    g = jax.grad(f)(t_img)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


@pytest.mark.parametrize("local_loss", [False, True])
def test_sharded_clip_loss_matches_global(local_loss):
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    Bg, d = 32, 16
    img = rand_feats(jax.random.PRNGKey(0), 2, Bg, d)
    txt = rand_feats(jax.random.PRNGKey(1), 2, Bg, d)
    scale = jnp.asarray(10.0)

    global_loss = ClipLoss()(img, txt, scale)

    sharded = ClipLoss(local_loss=local_loss, gather_with_grad=True,
                       axis_name="data")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data", None)),
        out_specs=P(),
    )
    def f(i, t):
        return jax.lax.pmean(sharded(i, t, scale), "data")

    got = f(img, txt)
    np.testing.assert_allclose(got, global_loss, rtol=1e-5)


def test_sharded_clip_loss_grads_match():
    """Gradients through the sharded local-loss form must equal the global
    form's (gather_with_grad exactness)."""
    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    Bg, d = 16, 8
    img = rand_feats(jax.random.PRNGKey(0), 1, Bg, d)
    txt = rand_feats(jax.random.PRNGKey(1), 1, Bg, d)
    scale = jnp.asarray(10.0)

    g_global = jax.grad(lambda i: ClipLoss()(i, txt, scale))(img)

    sharded = ClipLoss(local_loss=True, gather_with_grad=True, axis_name="data")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data", None)),
        out_specs=P(),
    )
    def loss_fn(i, t):
        return jax.lax.pmean(sharded(i, t, scale), "data")

    g_sharded = jax.grad(loss_fn)(img, txt)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_global),
                               atol=1e-6)


def test_siglip_ring_matches_global():
    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    Bg, d = 16, 8
    img = rand_feats(jax.random.PRNGKey(0), 1, Bg, d)[0]
    txt = rand_feats(jax.random.PRNGKey(1), 1, Bg, d)[0]
    scale, bias = jnp.asarray(10.0), jnp.asarray(-2.0)

    full = SigLipLoss()(img, txt, scale, bias)

    ring = SigLipLoss(axis_name="data")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data", None), P("data", None)),
        out_specs=P(),
    )
    def f(i, t):
        return jax.lax.pmean(ring(i, t, scale, bias), "data")

    got = f(img, txt)
    np.testing.assert_allclose(got, full, rtol=1e-5)


def test_coca_loss_caption_masking():
    B, L, V = 2, 5, 11
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, L, V))
    labels = jnp.array([[1, 2, 3, 0, 0], [4, 5, 0, 0, 0]], jnp.int32)
    img = rand_feats(jax.random.PRNGKey(1), 1, B, 8)[0]
    txt = rand_feats(jax.random.PRNGKey(2), 1, B, 8)[0]
    out = CoCaLoss()(img, txt, logits, labels, jnp.asarray(10.0), output_dict=True)
    # manual masked CE
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    mask = (labels != 0)
    expected = -float((picked * mask).sum() / mask.sum()) * 2.0
    np.testing.assert_allclose(out["caption_loss"], expected, rtol=1e-5)
