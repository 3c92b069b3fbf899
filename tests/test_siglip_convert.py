"""SigLIP big_vision npz conversion: a synthetic tiny npz round-trips into
a SigLIP-shaped model (no-CLS MAP-pooled ViT + last-pool biased-proj text
tower) and the MAP head matches a direct numpy transcription of the
big_vision math.

Parity target: /root/reference/src/open_clip/convert.py:13-140.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

D, H, HD, L_IMG, L_TXT = 32, 2, 16, 1, 1
GRID, PATCH, IMAGE = 2, 8, 16
VOCAB, CTX = 64, 8
MLP = 4 * D


def _rand(rng, *shape):
    return rng.normal(scale=0.2, size=shape).astype(np.float32)


def make_bv_npz(rng):
    sd = {}

    def block(prefix):
        sd[f"{prefix}/LayerNorm_0/scale"] = _rand(rng, D) + 1.0
        sd[f"{prefix}/LayerNorm_0/bias"] = _rand(rng, D)
        sd[f"{prefix}/LayerNorm_1/scale"] = _rand(rng, D) + 1.0
        sd[f"{prefix}/LayerNorm_1/bias"] = _rand(rng, D)
        att = f"{prefix}/MultiHeadDotProductAttention_0"
        for n in ("query", "key", "value"):
            sd[f"{att}/{n}/kernel"] = _rand(rng, D, H, HD)
            sd[f"{att}/{n}/bias"] = _rand(rng, H, HD)
        sd[f"{att}/out/kernel"] = _rand(rng, H, HD, D)
        sd[f"{att}/out/bias"] = _rand(rng, D)
        sd[f"{prefix}/MlpBlock_0/Dense_0/kernel"] = _rand(rng, D, MLP)
        sd[f"{prefix}/MlpBlock_0/Dense_0/bias"] = _rand(rng, MLP)
        sd[f"{prefix}/MlpBlock_0/Dense_1/kernel"] = _rand(rng, MLP, D)
        sd[f"{prefix}/MlpBlock_0/Dense_1/bias"] = _rand(rng, D)

    sd["img/embedding/kernel"] = _rand(rng, PATCH, PATCH, 3, D)
    sd["img/embedding/bias"] = _rand(rng, D)
    sd["img/pos_embedding"] = _rand(rng, 1, GRID * GRID, D)
    for i in range(L_IMG):
        block(f"img/Transformer/encoderblock_{i}")
    sd["img/Transformer/encoder_norm/scale"] = _rand(rng, D) + 1.0
    sd["img/Transformer/encoder_norm/bias"] = _rand(rng, D)
    mp = "img/MAPHead_0"
    sd[f"{mp}/probe"] = _rand(rng, 1, 1, D)
    att = f"{mp}/MultiHeadDotProductAttention_0"
    for n in ("query", "key", "value"):
        sd[f"{att}/{n}/kernel"] = _rand(rng, D, H, HD)
        sd[f"{att}/{n}/bias"] = _rand(rng, H, HD)
    sd[f"{att}/out/kernel"] = _rand(rng, H, HD, D)
    sd[f"{att}/out/bias"] = _rand(rng, D)
    sd[f"{mp}/LayerNorm_0/scale"] = _rand(rng, D) + 1.0
    sd[f"{mp}/LayerNorm_0/bias"] = _rand(rng, D)
    sd[f"{mp}/MlpBlock_0/Dense_0/kernel"] = _rand(rng, D, MLP)
    sd[f"{mp}/MlpBlock_0/Dense_0/bias"] = _rand(rng, MLP)
    sd[f"{mp}/MlpBlock_0/Dense_1/kernel"] = _rand(rng, MLP, D)
    sd[f"{mp}/MlpBlock_0/Dense_1/bias"] = _rand(rng, D)

    sd["txt/Embed_0/embedding"] = _rand(rng, VOCAB, D)
    sd["txt/pos_embedding"] = _rand(rng, 1, CTX, D)
    for i in range(L_TXT):
        block(f"txt/Encoder_0/encoderblock_{i}")
    sd["txt/Encoder_0/encoder_norm/scale"] = _rand(rng, D) + 1.0
    sd["txt/Encoder_0/encoder_norm/bias"] = _rand(rng, D)
    sd["txt/head/kernel"] = _rand(rng, D, D)
    sd["txt/head/bias"] = _rand(rng, D)
    sd["t"] = np.asarray([np.log(10.0)], np.float32)
    sd["b"] = np.asarray([-10.0], np.float32)
    return sd


@pytest.fixture(scope="module")
def siglip_model():
    from cosmos_tpu.models.factory import create_model

    return create_model(
        "ViT-B-16",
        embed_dim=D,
        vision_image_size=IMAGE,
        vision_patch_size=PATCH,
        vision_width=D,
        vision_layers=L_IMG,
        vision_head_width=HD,
        vision_pool_type="map",
        vision_class_token=False,
        vision_patch_bias=True,
        vision_no_proj=True,
        vision_no_ln_pre=True,
        text_context_length=CTX,
        text_vocab_size=VOCAB,
        text_width=D,
        text_heads=H,
        text_layers=L_TXT,
        text_no_causal_mask=True,
        text_pool_type="last",
        text_proj_bias=True,
        init_logit_bias=-5.0,
    )


def test_siglip_npz_roundtrip(siglip_model):
    from cosmos_tpu.models.convert import convert_state_dict, detect_format

    model, params = siglip_model
    sd = make_bv_npz(np.random.default_rng(0))
    assert detect_format(sd) == "big_vision_siglip"
    loaded = convert_state_dict(model, params, sd)

    # every leaf shape preserved
    ref_shapes = jax.tree.map(np.shape, params)
    new_shapes = jax.tree.map(np.shape, loaded)
    assert ref_shapes == new_shapes

    np.testing.assert_allclose(float(loaded["logit_scale"]), np.log(10.0))
    np.testing.assert_allclose(float(loaded["logit_bias"]), -10.0)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, IMAGE, IMAGE, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, VOCAB, size=(2, CTX)), jnp.int32)
    out = model.apply({"params": loaded}, images, tokens)
    assert out["image_features"].shape == (2, D)
    assert out["text_features"].shape == (2, D)
    assert np.isfinite(np.asarray(out["image_features"])).all()
    # conversion actually moved the weights
    base = model.apply({"params": params}, images, tokens)
    assert not np.allclose(
        np.asarray(out["image_features"]), np.asarray(base["image_features"])
    )


def test_map_head_matches_bigvision_math(siglip_model):
    """MAPHead on converted weights == a direct numpy transcription of
    big_vision's probe-attention + MLP-residual pooling."""
    from cosmos_tpu.models.convert import convert_state_dict
    from cosmos_tpu.models.vit import MAPHead

    model, params = siglip_model
    sd = make_bv_npz(np.random.default_rng(2))
    loaded = convert_state_dict(model, params, sd)
    ap = loaded["visual"]["attn_pool"]

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, GRID * GRID, D)).astype(np.float32)

    got = MAPHead(num_heads=H).apply({"params": ap}, jnp.asarray(x))

    # numpy oracle straight from the big_vision layout
    def proj(v, name):
        k = sd[f"img/MAPHead_0/MultiHeadDotProductAttention_0/{name}/kernel"]
        b = sd[f"img/MAPHead_0/MultiHeadDotProductAttention_0/{name}/bias"]
        return v @ k.reshape(D, H * HD) + b.reshape(-1)

    probe = np.broadcast_to(sd["img/MAPHead_0/probe"][0], (2, 1, D))
    q = proj(probe, "query").reshape(2, 1, H, HD)
    k = proj(x, "key").reshape(2, -1, H, HD)
    v = proj(x, "value").reshape(2, -1, H, HD)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(HD)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(2, 1, H * HD)
    o = o @ sd["img/MAPHead_0/MultiHeadDotProductAttention_0/out/kernel"].reshape(
        H * HD, D
    ) + sd["img/MAPHead_0/MultiHeadDotProductAttention_0/out/bias"]
    mu = o.mean(-1, keepdims=True)
    var = o.var(-1, keepdims=True)
    y = (o - mu) / np.sqrt(var + 1e-5)
    y = y * sd["img/MAPHead_0/LayerNorm_0/scale"] + sd["img/MAPHead_0/LayerNorm_0/bias"]
    h = y @ sd["img/MAPHead_0/MlpBlock_0/Dense_0/kernel"] + sd[
        "img/MAPHead_0/MlpBlock_0/Dense_0/bias"
    ]
    h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
    o = o + h @ sd["img/MAPHead_0/MlpBlock_0/Dense_1/kernel"] + sd[
        "img/MAPHead_0/MlpBlock_0/Dense_1/bias"
    ]
    np.testing.assert_allclose(np.asarray(got), o[:, 0], atol=2e-4, rtol=2e-3)
