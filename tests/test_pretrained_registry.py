"""Pretrained-tag registry coverage (reference pretrained.py:326-549).

Every architecture the native towers support must be reachable by tag —
COSMOS, OpenAI, MobileCLIP (earlier rounds) plus EVA02-CLIP and SigLIP
(round 5) — with the right preprocess config attached, and the download
dispatcher must route a tag to its HF repo (mocked offline).
"""

import numpy as np
import pytest

from cosmos_tpu.models import pretrained as P


def test_registry_covers_supported_families():
    tags = P.list_pretrained()
    for want in (
        "ViT-B-16:cosmos_merged30m",
        "ViT-B-16:openai",
        "MobileCLIP-B:datacompdr_lt",
        "EVA02-B-16:merged2b_s8b_b131k",
        "EVA02-L-14:merged2b_s4b_b131k",
        "ViT-B-16-SigLIP:webli",
    ):
        assert want in tags, f"{want} missing from registry"


def test_siglip_cfg_preprocess():
    cfg = P.get_pretrained_cfg("ViT-B-16-SigLIP", "webli")
    assert cfg["mean"] == (0.5, 0.5, 0.5)
    assert cfg["resize_mode"] == "squash"
    assert cfg["hf_repo"] == "timm/ViT-B-16-SigLIP"


def test_eva02_resolves_via_hf_mock(monkeypatch, tmp_path):
    """resolve_pretrained routes an EVA02 tag to its HF repo/filename —
    verified with a mocked hub download (offline)."""
    seen = {}

    def fake_hf(repo_id, filename, cache_dir=None):
        seen["repo"] = repo_id
        seen["file"] = filename
        p = tmp_path / filename
        p.write_bytes(b"stub")
        return str(p)

    monkeypatch.setattr(P, "download_pretrained_from_hf", fake_hf)
    path = P.resolve_pretrained("EVA02-B-16", "merged2b_s8b_b131k")
    assert seen == {"repo": "timm/eva02_base_patch16_clip_224."
                            "merged2b_s8b_b131k",
                    "file": "open_clip_pytorch_model.bin"}
    assert path.endswith("open_clip_pytorch_model.bin")


def test_unknown_tag_lists_alternatives():
    with pytest.raises(ValueError, match="webli"):
        P.resolve_pretrained("ViT-B-16-SigLIP", "nonsense_tag")


def test_siglip_model_config_builds():
    """The new ViT-B-16-SigLIP config constructs the SigLIP-shaped
    towers: MAP-pooled no-CLS vision at width==embed_dim, bidirectional
    last-pool text with a biased projection and a logit bias."""
    import jax
    import jax.numpy as jnp

    from cosmos_tpu.models.factory import create_model

    model, params = create_model("ViT-B-16-SigLIP", init_params=False)
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 64), jnp.int32)),
        jax.random.PRNGKey(0),
    )["params"]
    # no CLS token: pos embed covers exactly the 14x14 patch grid
    assert shapes["visual"]["positional_embedding"].shape == (196, 768)
    # MAP head present, no final projection
    assert "attn_pool" in shapes["visual"]
    assert "proj" not in shapes["visual"]
    # biased text projection at width==embed_dim, plus the logit bias
    assert shapes["text"]["text_projection"]["kernel"].shape == (768, 768)
    assert shapes["text"]["text_projection"]["bias"].shape == (768,)
    assert "logit_bias" in shapes
