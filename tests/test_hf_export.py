"""Offline HF-hub export: save_for_hf writes loadable torch + flax
weights and a rebuildable config (reference push_to_hf_hub.py:63-90
save_for_hf), and the torch .bin round-trips through load_checkpoint."""

import json
import os

import numpy as np
import torch

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.models.push_to_hf_hub import generate_readme, save_for_hf

TINY = dict(
    embed_dim=32, vision_image_size=16, vision_patch_size=8,
    vision_width=32, vision_layers=2, vision_head_width=16,
    text_context_length=12, text_vocab_size=128, text_width=32,
    text_heads=2, text_layers=2,
)


def test_save_for_hf_roundtrip(tmp_path):
    model, params = create_model("ViT-B-16", **TINY)
    out = tmp_path / "hfexport"
    save_for_hf(model, params, str(out))

    names = sorted(os.listdir(out))
    assert any(n.endswith(".bin") for n in names), names
    assert any(n.endswith(".msgpack") for n in names), names
    assert "open_clip_config.json" in names or any(
        n.endswith("config.json") for n in names
    ), names

    # config carries a rebuildable model_cfg
    cfg_file = next(n for n in names if n.endswith("config.json"))
    cfg = json.loads((out / cfg_file).read_text())
    assert cfg["model_cfg"]["embed_dim"] == 32
    assert cfg["model_cfg"]["vision_cfg"]["image_size"] == 16
    assert cfg["preprocess_cfg"]["size"] == 16

    # torch .bin round-trips through the public load path
    from cosmos_tpu.models.checkpoint import load_checkpoint

    bin_file = next(n for n in names if n.endswith(".bin"))
    _, init = create_model("ViT-B-16", seed=9, **TINY)
    loaded = load_checkpoint(model, init, str(out / bin_file))
    import jax

    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )

    # flax msgpack loads too
    from flax import serialization

    msg_file = next(n for n in names if n.endswith(".msgpack"))
    with open(out / msg_file, "rb") as f:
        restored = serialization.from_bytes(init, f.read())
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )


def test_generate_readme_sections():
    md = generate_readme(
        {"description": "d", "sections": {"Usage": "u"}}, "m"
    )
    assert "# Model card for m" in md
    assert "## Usage" in md and "library_name: open_clip" in md
