"""Eval-stack tests: retrieval rank math vs a direct reference-semantics
loop, and the zero-shot classifier builder."""

import jax.numpy as jnp
import numpy as np

from cosmos_tpu.training.retrieval import (
    compute_retrieval_metrics,
    get_clip_metrics,
)
from cosmos_tpu.training.zero_shot import (
    accuracy,
    build_zero_shot_classifier,
    load_classification_banks,
    load_imagenet_metadata,
)


def _loop_reference_metrics(sim, img2txt, txt2img):
    """Direct translation of the reference's per-row loops (train.py:716-757)."""
    n_img, n_txt = sim.shape
    i2t = np.zeros(n_img)
    for i in range(n_img):
        inds = np.argsort(-sim[i])
        rank = 1e10
        for c in img2txt[i]:
            tmp = int(np.where(inds == c)[0][0])
            rank = min(rank, tmp)
        i2t[i] = rank
    t2i = np.zeros(n_txt)
    simT = sim.T
    for c in range(n_txt):
        inds = np.argsort(-simT[c])
        t2i[c] = int(np.where(inds == txt2img[c])[0][0])
    return {
        "image_to_text_R@1": float(np.mean(i2t < 1)),
        "text_to_image_R@1": float(np.mean(t2i < 1)),
        "image_to_text_R@5": float(np.mean(i2t < 5)),
        "text_to_image_R@5": float(np.mean(t2i < 5)),
    }


def test_retrieval_metrics_match_reference_loop():
    rng = np.random.default_rng(0)
    n_img, n_per = 20, 5
    n_txt = n_img * n_per
    sim = rng.normal(size=(n_img, n_txt)).astype(np.float32)
    img2txt = {i: list(range(i * n_per, (i + 1) * n_per)) for i in range(n_img)}
    txt2img = {c: c // n_per for c in range(n_txt)}
    got = compute_retrieval_metrics(sim, img2txt, txt2img)
    want = _loop_reference_metrics(sim, img2txt, txt2img)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_retrieval_perfect_alignment():
    n = 8
    feats = np.eye(n, dtype=np.float32)
    sim = feats @ feats.T
    img2txt = {i: [i] for i in range(n)}
    txt2img = {i: i for i in range(n)}
    m = compute_retrieval_metrics(sim, img2txt, txt2img)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_R@1"] == 1.0
    assert m["image_to_text_mean_rank"] == 1.0


def test_clip_metrics_diag():
    f = np.eye(6, dtype=np.float32)
    m = get_clip_metrics(f, f, 10.0)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_mean_rank"] == 1.0


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    target = np.array([1, 2])
    a1, a2 = accuracy(logits, target, topk=(1, 2))
    assert a1 == 1.0  # only first sample correct at top-1
    assert a2 == 1.0  # second sample's class 2 not in top-2 ([0, then 1 or 2])


def test_build_classifier_shapes_and_norm():
    from cosmos_tpu.data.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer(context_length=16)
    d = 8

    def fake_encode(tokens):
        # deterministic pseudo-features from token sums
        s = np.asarray(tokens).sum(axis=1, keepdims=True).astype(np.float32)
        rng = np.random.default_rng(3)
        proj = rng.normal(size=(1, d)).astype(np.float32)
        return jnp.asarray(s * proj + np.arange(d)[None, :])

    classifier = build_zero_shot_classifier(
        fake_encode, tok, ["cat", "dog", "frog"],
        ["a photo of a {}.", "an image of a {}."],
        num_classes_per_batch=2,
    )
    assert classifier.shape == (d, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(classifier), axis=0), 1.0, rtol=1e-5
    )


def test_asset_banks_complete():
    meta = load_imagenet_metadata()
    assert len(meta["classnames"]) == 1000
    assert len(meta["templates"]) == 80
    assert all("{}" in t for t in meta["templates"])
    from cosmos_tpu.training.zero_shot import CLASSIFICATION_DATASETS, bank_key

    banks = load_classification_banks()
    for ds in CLASSIFICATION_DATASETS:
        assert bank_key(ds) in banks["templates"], ds
        assert bank_key(ds) in banks["labels"], ds
    # dataloader-module aliases resolve too
    for alias in ("fgvc_aircraft", "oxford_pets", "flowers102"):
        assert bank_key(alias) in banks["templates"], alias


def test_mesh_sharded_encoders_match_single_device():
    import jax
    from cosmos_tpu.models.factory import create_model
    from cosmos_tpu.parallel.mesh import create_mesh
    from cosmos_tpu.training.evaluate import make_encoders

    model, params = create_model("ViT-Tiny-Test")
    mesh = create_mesh(8)
    enc_i_plain, enc_t_plain, _ = make_encoders(model, params, mesh=None)
    enc_i_mesh, enc_t_mesh, _ = make_encoders(model, params, mesh=mesh)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    toks = jax.random.randint(jax.random.PRNGKey(1), (16, 16), 1, 49407)
    np.testing.assert_allclose(
        np.asarray(enc_i_mesh(imgs)), np.asarray(enc_i_plain(imgs)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(enc_t_mesh(toks)), np.asarray(enc_t_plain(toks)), atol=1e-5
    )


def test_mesh_encoders_accept_uneven_batches():
    """Batch sizes not divisible by the device count must work on the
    mesh path (build_zero_shot_classifier feeds n_classes x n_templates
    chunks — e.g. 180 rows on 8 devices — which crashed P(data)
    placement before the pad-and-slice fix)."""
    import jax
    from cosmos_tpu.models.factory import create_model
    from cosmos_tpu.parallel.mesh import create_mesh
    from cosmos_tpu.training.evaluate import make_encoders

    model, params = create_model("ViT-Tiny-Test")
    mesh = create_mesh(8)
    _, enc_t_plain, _ = make_encoders(model, params, mesh=None)
    _, enc_t_mesh, _ = make_encoders(model, params, mesh=mesh)
    toks = jax.random.randint(jax.random.PRNGKey(2), (180, 16), 1, 49407)
    got = np.asarray(enc_t_mesh(toks))
    assert got.shape[0] == 180
    np.testing.assert_allclose(got, np.asarray(enc_t_plain(toks)), atol=1e-5)


def test_eot_truncated_classifier_matches_full():
    """eot_truncate=True builds the SAME classifier as the full-context
    encode on a real (tiny) causal text tower: host truncation at
    max(eot)+1 is exact under causal masking + argmax-EOT pooling (same
    argument as --text-bucket; only GEMM-shape float reassociation can
    differ).  Also checks truncate_to_eot's rounding contract."""
    import jax

    from cosmos_tpu.data.tokenizer import SimpleTokenizer
    from cosmos_tpu.models.factory import create_model
    from cosmos_tpu.training.zero_shot import truncate_to_eot

    model, params = create_model(
        "ViT-B-16", embed_dim=32, vision_image_size=16, vision_patch_size=8,
        vision_width=32, vision_layers=2, vision_head_width=16,
        text_context_length=64, text_vocab_size=49408, text_width=32,
        text_heads=2, text_layers=2,
    )
    tok = SimpleTokenizer(context_length=64)

    def enc(tokens):
        return model.apply(
            {"params": params}, jnp.asarray(np.asarray(tokens, np.int32)),
            False, method=model.encode_text)["text_features"]

    names = ["cat", "dog", "frog", "axolotl"]
    templates = ["a photo of a {}.", "an image of a {}."]
    full = np.asarray(build_zero_shot_classifier(
        enc, tok, names, templates, num_classes_per_batch=2))
    trunc = np.asarray(build_zero_shot_classifier(
        enc, tok, names, templates, num_classes_per_batch=2,
        eot_truncate=True))
    np.testing.assert_allclose(trunc, full, atol=2e-6, rtol=2e-3)

    # rounding contract: short prompts slice to the 16-multiple, and a
    # full-length batch is left alone
    t = tok(["a photo of a cat."])
    cut = truncate_to_eot(t)
    assert cut.shape[1] == 16
    assert int(cut.argmax(axis=-1).max()) == int(
        np.asarray(t).argmax(axis=-1).max())
    long = np.zeros((1, 64), np.int32)
    long[0, -1] = 9
    assert truncate_to_eot(long).shape[1] == 64
