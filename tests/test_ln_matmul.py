"""Fused LN->matmul kernel: forward and gradients match the unfused
composition exactly (same single-pass f32 statistics), and the fused
model path (fuse_ln=True) matches the unfused model on identical params.
Runs in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_tpu.ops.experimental.ln_matmul import ln_matmul


def _unfused(x, g, b, w, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jax.lax.square(xf), axis=-1, keepdims=True)
        - jax.lax.square(mean), 0.0,
    )
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * g + b
    y = y.astype(x.dtype)
    out = jnp.dot(y, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (out + bias).astype(x.dtype)


def test_ln_matmul_forward_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 24, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    got = ln_matmul(x, g, b, w, bias, 1e-5, True)
    want = _unfused(x, g, b, w, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ln_matmul_gradients_match_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(40, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 128)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    def f_fused(x, g, b, w, bias):
        return jnp.sum(jnp.sin(ln_matmul(x, g, b, w, bias, 1e-5, True)))

    def f_ref(x, g, b, w, bias):
        return jnp.sum(jnp.sin(_unfused(x, g, b, w, bias)))

    got = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bias)
    want = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bias)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   atol=2e-4, rtol=2e-4)


def test_fused_model_matches_unfused_model():
    """fuse_ln=True produces the same CLIP outputs and the same param tree
    as the standard path (the kernel is numerically interchangeable)."""
    from cosmos_tpu.models.factory import create_model

    tiny = dict(
        embed_dim=32, vision_image_size=16, vision_patch_size=8,
        vision_width=128, vision_layers=2, vision_head_width=64,
        text_context_length=12, text_vocab_size=128, text_width=128,
        text_heads=2, text_layers=2,
    )
    model_a, params = create_model("ViT-B-16", **tiny)
    model_b, params_b = create_model("ViT-B-16", fuse_ln=True, **tiny)
    assert jax.tree.map(np.shape, params) == jax.tree.map(np.shape, params_b)

    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 127, size=(2, 12)), jnp.int32)
    out_a = model_a.apply({"params": params}, images, tokens)
    out_b = model_b.apply({"params": params}, images, tokens)
    np.testing.assert_allclose(
        np.asarray(out_a["image_features"]),
        np.asarray(out_b["image_features"]), atol=2e-5, rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["text_features"]),
        np.asarray(out_b["text_features"]), atol=2e-5, rtol=2e-5,
    )


def test_mlp_block_matches_unfused():
    """Fused LN->c_fc->act->c_proj kernel: fwd + all grads match the
    composed reference ops."""
    from cosmos_tpu.ops.experimental.mlp_block import mlp_block

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(24, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)), jnp.float32)

    def ref(x, g, b, w1, b1, w2, b2):
        y = _unfused(x, g, b, w1, b1)
        y = jax.nn.gelu(y, approximate=False)
        return jnp.dot(y, w2, preferred_element_type=jnp.float32) + b2

    got = mlp_block(x, g, b, w1, b1, w2, b2, 1e-5, "gelu", True)
    want = ref(x, g, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(*args):
        return jnp.sum(jnp.sin(mlp_block(*args, 1e-5, "gelu", True)))

    def loss_ref(*args):
        return jnp.sum(jnp.sin(ref(*args)))

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(x, g, b, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(x, g, b, w1, b1, w2, b2)
    for a_, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)
