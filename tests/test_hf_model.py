"""HF text tower wiring: a config with hf_model_config builds through the
factory, initializes params (HF weights under params['text']['hf']),
encodes text, and loads params round-trip.

Parity target: /root/reference/src/open_clip/factory.py:87-110 (tokenizer
dispatch + hf text tower via text_cfg) and hf_model.py:96-152.
Offline: uses AutoConfig.for_model('bert', ...) — no network fetch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


TINY_BERT = {
    "model_type": "bert",
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "vocab_size": 256,
    "max_position_embeddings": 64,
}


@pytest.fixture(scope="module")
def hf_clip():
    from cosmos_tpu.models.factory import create_model

    model, params = create_model(
        "ViT-B-16",
        embed_dim=32,
        vision_image_size=16,
        vision_patch_size=8,
        vision_width=32,
        vision_layers=2,
        vision_head_width=16,
        text_hf_model_config=TINY_BERT,
        text_hf_model_pretrained=False,
        text_context_length=16,
        text_pad_id=0,
    )
    return model, params


def test_hf_tower_builds_and_encodes(hf_clip):
    model, params = hf_clip
    assert "hf" in params["text"], sorted(params["text"])
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, 255, size=(4, 16)), jnp.int32
    )
    out = model.apply({"params": params}, tokens, True,
                      method=model.encode_text)
    feats = out["text_features"]
    assert feats.shape == (4, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats, np.float64), axis=-1), 1.0, atol=1e-3
    )


def test_hf_tower_full_forward_contrastive(hf_clip):
    """Image + text forward produces aligned embedding dims and logits."""
    model, params = hf_clip
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 255, size=(4, 16)), jnp.int32)
    out = model.apply({"params": params}, images, tokens)
    assert out["image_features"].shape == out["text_features"].shape == (4, 32)
    assert np.isfinite(float(out["logit_scale"]))


def test_hf_tower_param_load_roundtrip(hf_clip):
    """Perturbed params round-trip through apply (the tower is a real
    member of the pytree, not side-state)."""
    model, params = hf_clip
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(1, 255, size=(2, 16)), jnp.int32
    )
    base = model.apply({"params": params}, tokens, False,
                       method=model.encode_text)["text_features"]
    bumped = jax.tree.map(lambda x: x + 0.05, params)
    moved = model.apply({"params": bumped}, tokens, False,
                        method=model.encode_text)["text_features"]
    assert not np.allclose(np.asarray(base), np.asarray(moved))


def test_hf_pooler_mean_masks_padding():
    from cosmos_tpu.models.hf_model import mean_pooler

    hidden = jnp.asarray(
        [[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]], jnp.float32
    )
    mask = jnp.asarray([[1, 1, 0]], jnp.int32)
    out = mean_pooler(hidden, mask)
    np.testing.assert_allclose(np.asarray(out), [[2.0, 3.0]], atol=1e-6)


def test_get_tokenizer_hf_dispatch(tmp_path, monkeypatch):
    """A config naming hf_tokenizer_name dispatches to HFTokenizer."""
    import cosmos_tpu.models.config as config_mod
    from cosmos_tpu.models.factory import get_tokenizer

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "patch_size": 8, "width": 32,
                       "layers": 2, "head_width": 16},
        "text_cfg": {"context_length": 16,
                     "hf_tokenizer_name": "definitely-not-a-real-tokenizer"},
    }
    (tmp_path / "hf-test-model.json").write_text(__import__("json").dumps(cfg))
    monkeypatch.setattr(config_mod, "_CONFIG_DIR", tmp_path)
    # offline: instantiation reaches AutoTokenizer.from_pretrained and fails
    # on the fake name — proving dispatch chose the HF path
    with pytest.raises(Exception):
        get_tokenizer("hf-test-model")


def test_hf_tower_lock_text_mask(hf_clip):
    """frozen_mask implements the reference HF lock (hf_model.py:172-186):
    [embeddings, *encoder.layer][:-n] frozen, LayerNorm exempt when
    freeze_layer_norm=False, pooler/projection never frozen."""
    from cosmos_tpu.training.train import frozen_mask

    _, params = hf_clip

    def flat(mask):
        return {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_leaves_with_path(mask)
        }

    # full lock, freeze_layer_norm=True: every hf transformer param frozen
    m = flat(frozen_mask(params, lock_text=True,
                         text_freeze_layer_norm=True))
    hf_keys = [k for k in m if "['text']['hf']" in k]
    assert hf_keys, "expected HF params under text/hf"
    assert all(m[k] for k in hf_keys if "pooler" not in k)
    assert not any(v for k, v in m.items()
                   if "['text']['proj']" in k or "pooler" in k)

    # freeze_layer_norm=False exempts LayerNorm params inside frozen blocks
    m = flat(frozen_mask(params, lock_text=True,
                         text_freeze_layer_norm=False))
    ln_keys = [k for k in hf_keys if "LayerNorm" in k]
    assert ln_keys and not any(m[k] for k in ln_keys)
    assert all(m[k] for k in hf_keys
               if "LayerNorm" not in k and "pooler" not in k)

    # unlocked_layers=1: last encoder layer trainable, embeddings+layer 0
    # frozen (reference modules[:-1])
    m = flat(frozen_mask(params, lock_text=True, text_unlocked_layers=1,
                         text_freeze_layer_norm=True))
    assert not any(v for k, v in m.items() if "['layer']['1']" in k)
    assert all(v for k, v in m.items() if "['layer']['0']" in k)
    assert all(v for k, v in m.items() if "embeddings" in k)

    # unlocked_layers >= n_layers+1 unlocks embeddings too
    m = flat(frozen_mask(params, lock_text=True, text_unlocked_layers=3,
                         text_freeze_layer_norm=True))
    assert not any(v for k, v in m.items() if "['text']['hf']" in k)
