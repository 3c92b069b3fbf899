"""Shape and invariance tests for the CLIP/COSMOS model forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_tpu.models.factory import create_model


TINY = {
    "embed_dim": 64,
    "vision_image_size": 32,
    "vision_patch_size": 8,
    "vision_width": 48,
    "vision_layers": 2,
    "vision_head_width": 24,
    "text_context_length": 16,
    "text_vocab_size": 512,
    "text_width": 32,
    "text_heads": 2,
    "text_layers": 2,
}


def make_tiny(**kw):
    defaults = dict(TINY)
    defaults.update(kw)
    return create_model("ViT-B-16", seed=0, **defaults)


def test_encode_shapes():
    model, params = make_tiny()
    imgs = jnp.zeros((3, 32, 32, 3))
    txts = jnp.zeros((5, 16), jnp.int32)
    out = model.apply({"params": params}, imgs, method=model.encode_image)
    assert out["image_features"].shape == (3, 64)
    tout = model.apply({"params": params}, txts, method=model.encode_text)
    assert tout["text_features"].shape == (5, 64)


def test_normalization():
    model, params = make_tiny()
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = model.apply(
        {"params": params}, imgs, True, method=model.encode_image
    )
    norms = jnp.linalg.norm(out["image_features"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_cosmos_forward_shapes():
    model, params = make_tiny(
        cosmos=True, output_all=True, attentional_pool=True, add_zero_attn=True
    )
    B, n_local, k = 2, 3, 4
    g = jax.random.normal(jax.random.PRNGKey(0), (2 * B, 32, 32, 3))
    l = jax.random.normal(jax.random.PRNGKey(1), (n_local * B, 16, 16, 3))
    t = jax.random.randint(jax.random.PRNGKey(2), (k * B, 16), 0, 511)
    out = model.apply({"params": params}, g, t, l, B)
    assert out["image_features"].shape == ((2 + n_local) * B, 64)
    assert out["text_features"].shape == (k * B, 64)
    assert out["img_crossmodal_features"].shape == ((2 + n_local) * B, 64)
    assert out["txt_crossmodal_features"].shape == (k * B, 64)
    assert out["logit_scale"].shape == ()
    assert out["distill_logit_scale"].shape == ()
    # all returned features are normalized
    for key in ("image_features", "text_features",
                "img_crossmodal_features", "txt_crossmodal_features"):
        np.testing.assert_allclose(
            jnp.linalg.norm(out[key], axis=-1), 1.0, atol=1e-4, err_msg=key
        )


def test_teacher_forward_no_crossmodal():
    model, params = make_tiny(
        cosmos=True, output_all=True, attentional_pool=True, add_zero_attn=True
    )
    B = 2
    g = jax.random.normal(jax.random.PRNGKey(0), (2 * B, 32, 32, 3))
    t = jax.random.randint(jax.random.PRNGKey(2), (2 * B, 16), 0, 511)
    out = model.apply({"params": params}, g, t)  # batch_size=None -> teacher mode
    assert "img_crossmodal_features" not in out
    np.testing.assert_allclose(
        jnp.linalg.norm(out["image_features"], axis=-1), 1.0, atol=1e-4
    )


def test_pos_embed_interpolation_identity():
    from cosmos_tpu.models.vit import interpolate_pos_embed

    pe = jax.random.normal(jax.random.PRNGKey(0), (17, 8))
    out = interpolate_pos_embed(pe, (4, 4), (4, 4))
    np.testing.assert_array_equal(pe, out)
    out2 = interpolate_pos_embed(pe, (4, 4), (2, 2))
    assert out2.shape == (5, 8)
    np.testing.assert_array_equal(out2[0], pe[0])


def test_eot_pooling_picks_argmax_position():
    """The pooled text feature must come from the EOT (max-id) position."""
    model, params = make_tiny()
    t1 = jnp.array([[5, 7, 511, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    t2 = jnp.array([[5, 7, 511, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    o1 = model.apply({"params": params}, t1, method=model.encode_text)
    o2 = model.apply({"params": params}, t2, method=model.encode_text)
    # same EOT position (2) but different suffix: with causal masking the
    # hidden state at position 2 is unaffected by position 3
    np.testing.assert_allclose(
        o1["text_features"], o2["text_features"], atol=1e-5
    )


def test_csa_forward_runs():
    model, params = make_tiny(output_all=True, attentional_pool=True)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    out = model.apply(
        {"params": params}, imgs, False, True, method=model.encode_image
    )
    assert out["image_tokens"].shape == (2, 16, 64)


def test_create_model_and_transforms_surface():
    """The open_clip-style bundled factory: model + train/val transforms."""
    from PIL import Image

    from cosmos_tpu.models.factory import create_model_and_transforms

    model, params, train_tf, val_tf = create_model_and_transforms(
        "ViT-Tiny-Test", use_imagecrop_aug=True, local_crops_number=2,
        crop_scale=0.4,
    )
    img = Image.fromarray(
        np.zeros((64, 80, 3), dtype=np.uint8)
    )
    crops = train_tf(img)
    assert len(crops) == 4  # 2 global + 2 local
    assert crops[0].shape == (32, 32, 3)
    out = val_tf(img)
    assert out.shape == (32, 32, 3)

    # plain (non-multicrop) train transform branch
    _, _, plain_tf, _ = create_model_and_transforms("ViT-Tiny-Test")
    assert plain_tf(img).shape == (32, 32, 3)


def test_patch_dropout_wiring():
    """--force-patch-dropout must actually drop tokens in training: the
    vision tower pulls a 'patch_drop' rng collection (the train step
    supplies it); eval paths without rngs trace dropout-free."""
    from cosmos_tpu.models.factory import create_model

    model, params = create_model("ViT-B-16", force_patch_dropout=0.5, **TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))

    def enc(rngs=None):
        return model.apply({"params": params}, imgs, True,
                           method=model.encode_image,
                           rngs=rngs)["image_features"]

    # eval: deterministic, dropout-free
    np.testing.assert_array_equal(np.asarray(enc()), np.asarray(enc()))
    # training rng: dropout active -> different features
    dropped = enc(rngs={"patch_drop": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(dropped), np.asarray(enc()))


def test_interpolate_pos_embed_matches_torch_bicubic():
    """Pos-embed interpolation must be torch-F.interpolate-exact
    (bicubic a=-0.75, align_corners=False) — jax.image.resize's Keys
    kernel (a=-0.5) differs on every interpolated row."""
    import torch
    import torch.nn.functional as F

    from cosmos_tpu.models.vit import interpolate_pos_embed

    rng = np.random.default_rng(0)
    for (s, d) in ((14, 6), (14, 24), (7, 14)):
        pe = rng.normal(size=(1 + s * s, 16)).astype(np.float32)
        got = np.asarray(interpolate_pos_embed(pe, (s, s), (d, d)))
        grid = torch.from_numpy(pe[1:].reshape(s, s, 16)).permute(2, 0, 1)[None]
        ref = F.interpolate(grid, size=(d, d), mode="bicubic",
                            align_corners=False)[0].permute(1, 2, 0)
        np.testing.assert_allclose(got[1:], ref.reshape(-1, 16).numpy(),
                                   atol=1e-5)
        np.testing.assert_array_equal(got[0], pe[0])    # CLS untouched


def test_sincos_pos_embed_matches_reference_order():
    """Bit-parity with the reference's get_2d_sincos_pos_embed
    (pos_embed.py:20-67): first half of the dims encodes grid[0] (the
    w mesh — MAE's famous naming quirk), [sin|cos] within each half."""
    from cosmos_tpu.models.vit import sincos_2d_pos_embed

    def reference(embed_dim, grid_size, cls_token):
        def _1d(d, pos):
            omega = np.arange(d // 2, dtype=float) / (d / 2.0)
            omega = 1.0 / 10000 ** omega
            out = np.einsum("m,d->md", pos.reshape(-1), omega)
            return np.concatenate([np.sin(out), np.cos(out)], axis=1)

        gh = np.arange(grid_size, dtype=np.float32)
        gw = np.arange(grid_size, dtype=np.float32)
        grid = np.stack(np.meshgrid(gw, gh), axis=0)  # w first
        emb = np.concatenate(
            [_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])],
            axis=1)
        if cls_token:
            emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
        return emb.astype(np.float32)

    for grid, cls in ((4, True), (7, False)):
        np.testing.assert_allclose(
            sincos_2d_pos_embed(32, grid, cls_token=cls),
            reference(32, grid, cls), atol=1e-7)


def test_sincos_pos_embed_is_frozen():
    """sin_cos_2d tables are constants (reference requires_grad=False) —
    NOT params that AdamW would update and weight-decay."""
    from cosmos_tpu.models.vit import VisionTransformer

    vt = VisionTransformer(image_size=16, patch_size=8, width=32, layers=1,
                           num_heads=2, output_dim=16,
                           pos_embed_type="sin_cos_2d")
    params = vt.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 16, 16, 3)))["params"]
    assert "positional_embedding" not in params


def test_text_bucket_exact_vs_full():
    """text_bucket forward == unbucketed forward up to float
    reassociation (~1e-7 abs): truncating a caption at >= eot+1
    preserves its argmax-EOT pooled feature under the causal mask, and
    the sort/scatter is a permutation round trip.  Splitting the batch
    changes GEMM shapes, so XLA's reduction blocking differs — the math
    is exact, the floats agree to reassociation noise only.
    Covers both the fits-fast-path and the cond fallback."""
    kw = dict(TINY, cosmos=True, output_all=True, attentional_pool=True,
              add_zero_attn=True)
    model0, params = create_model("ViT-B-16", **kw)
    model1, _ = create_model("ViT-B-16", text_bucket=8, init_params=False,
                             **kw)

    b, k, L = 4, 4, TINY["text_context_length"]
    rng = np.random.default_rng(0)
    g = rng.normal(size=(2 * b, 16, 16, 3)).astype("float32")

    def toks_with_eots(eots):
        t = np.zeros((len(eots), L), dtype="int32")
        for i, e in enumerate(eots):
            n = e - 1
            t[i, 0] = 2                              # sot-ish
            t[i, 1:n + 1] = rng.integers(3, 120, n)  # body
            t[i, e] = 127                            # eot = max id
        return t

    # globals long; local views short (fit the 8-token bucket)
    eots = [L - 1, L - 2] * b + list(rng.integers(2, 8, (k - 2) * b))
    texts = toks_with_eots(eots)

    out0 = model0.apply({"params": params}, g, texts, batch_size=b)
    out1 = model1.apply({"params": params}, g, texts, batch_size=b)
    np.testing.assert_allclose(
        np.asarray(out0["text_features"]), np.asarray(out1["text_features"]),
        atol=2e-6, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out0["txt_crossmodal_features"]),
        np.asarray(out1["txt_crossmodal_features"]), atol=2e-6, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out0["img_crossmodal_features"]),
        np.asarray(out1["img_crossmodal_features"]), atol=2e-6, rtol=2e-3)

    # one local caption too long for the bucket -> cond fallback, still exact
    eots_long = list(eots)
    eots_long[2 * b + 1] = L - 1
    texts2 = toks_with_eots(eots_long)
    out0b = model0.apply({"params": params}, g, texts2, batch_size=b)
    out1b = model1.apply({"params": params}, g, texts2, batch_size=b)
    np.testing.assert_allclose(
        np.asarray(out0b["text_features"]),
        np.asarray(out1b["text_features"]), atol=2e-6, rtol=2e-3)

    # teacher/eval forward (batch_size=None) never buckets: text_tokens
    # keep full k*B rows there
    out_ev = model1.apply({"params": params}, g, texts)
    assert out_ev["text_features"].shape[0] == k * b


def test_text_bucket_disengages_for_non_causal_towers():
    """A SigLIP-style tower (no_causal_mask, last-pool) must NOT bucket:
    truncation there changes every feature (tokens attend bidirectionally
    past the EOT), so with text_bucket set the forward must be identical
    to the unbucketed model — proof the guard disengaged."""
    kw = dict(TINY, cosmos=True, output_all=True, attentional_pool=True,
              add_zero_attn=True, text_no_causal_mask=True,
              text_pool_type="last")
    model0, params = create_model("ViT-B-16", **kw)
    model1, _ = create_model("ViT-B-16", text_bucket=8, init_params=False,
                             **kw)
    b, k, L = 4, 4, TINY["text_context_length"]
    rng = np.random.default_rng(0)
    g = rng.normal(size=(2 * b, 16, 16, 3)).astype("float32")
    texts = np.zeros((k * b, L), dtype="int32")
    texts[:, 0] = 2
    for i in range(k * b):
        n = int(rng.integers(2, 7))
        texts[i, 1:n] = rng.integers(3, 120, n - 1)
        texts[i, n] = 127
    out0 = model0.apply({"params": params}, g, texts, batch_size=b)
    out1 = model1.apply({"params": params}, g, texts, batch_size=b)
    np.testing.assert_array_equal(
        np.asarray(out0["text_features"]), np.asarray(out1["text_features"]))


def test_supports_eot_truncation_gate():
    from cosmos_tpu.training.zero_shot import supports_eot_truncation

    kw = dict(TINY, init_params=False)
    ok, _ = create_model("ViT-B-16", **kw)
    assert supports_eot_truncation(ok)
    siglip_style, _ = create_model("ViT-B-16", text_no_causal_mask=True,
                                   text_pool_type="last", **kw)
    assert not supports_eot_truncation(siglip_style)
    assert not supports_eot_truncation(object())  # no cfg at all
