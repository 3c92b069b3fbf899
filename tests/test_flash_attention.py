"""Flash attention kernel vs the jnp reference: fwd + grads, padding,
causal, and end-to-end model equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.attention import dot_product_attention
from cosmos_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, causal):
    mask = None
    if causal:
        l = q.shape[2]
        mask = jnp.triu(jnp.full((l, l), -1e9), k=1)
    return dot_product_attention(q, k, v, mask=mask)


@pytest.mark.parametrize("l", [8, 77, 197])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(l, causal):
    key = jax.random.PRNGKey(0)
    b, h, dh = 2, 3, 64
    q, k, v = (
        jax.random.normal(kk, (b, h, l, dh))
        for kk in jax.random.split(key, 3)
    )
    got = flash_attention(q, k, v, causal, True)
    want = _ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match(causal):
    key = jax.random.PRNGKey(1)
    b, h, l, dh = 1, 2, 37, 16
    q, k, v = (
        jax.random.normal(kk, (b, h, l, dh))
        for kk in jax.random.split(key, 3)
    )

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, causal, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_ref(q, k, v, causal) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_model_flash_equals_plain():
    """Full CLIP forward with use_flash must match the jnp path."""
    from cosmos_tpu.models.factory import create_model

    kw = dict(
        cosmos=True, output_all=True, attentional_pool=True,
        add_zero_attn=True, embed_dim=32, vision_image_size=16,
        vision_patch_size=8, vision_width=32, vision_layers=2,
        vision_head_width=16, text_context_length=12, text_vocab_size=128,
        text_width=32, text_heads=2, text_layers=2,
    )
    model_a, params = create_model("ViT-B-16", seed=0, **kw)
    model_b, _ = create_model("ViT-B-16", seed=0, use_flash=True,
                              init_params=False, **kw)
    g = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    t = jax.random.randint(jax.random.PRNGKey(1), (6, 12), 1, 127)
    out_a = model_a.apply({"params": params}, g, t, batch_size=2)
    out_b = model_b.apply({"params": params}, g, t, batch_size=2)
    for key in ("image_features", "text_features",
                "img_crossmodal_features", "txt_crossmodal_features"):
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]), atol=2e-5,
            err_msg=key,
        )
