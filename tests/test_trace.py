"""AOT serving export (--trace): StableHLO round-trip matches the live
model (reference torch.jit.trace parity, model.py:639-654)."""

import jax.numpy as jnp
import numpy as np

from cosmos_tpu.models.factory import create_model
from cosmos_tpu.models.trace import load_traced, save_traced, trace_model

TINY = dict(
    embed_dim=32, vision_image_size=16, vision_patch_size=8,
    vision_width=32, vision_layers=2, vision_head_width=16,
    text_context_length=12, text_vocab_size=128, text_width=32,
    text_heads=2, text_layers=2,
)


def test_trace_roundtrip(tmp_path):
    model, params = create_model("ViT-B-16", **TINY)
    artifacts = trace_model(model, params, batch_size=4)
    assert set(artifacts) == {"encode_image", "encode_text"}
    save_traced(artifacts, str(tmp_path / "traced"))
    loaded = load_traced(str(tmp_path / "traced"))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(1, 127, size=(4, 12)), jnp.int32)

    got_img = loaded["encode_image"](params, images)
    got_txt = loaded["encode_text"](params, tokens)
    want_img = model.apply({"params": params}, images, True,
                           method=model.encode_image)["image_features"]
    want_txt = model.apply({"params": params}, tokens, True,
                           method=model.encode_text)["text_features"]
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt),
                               atol=1e-5)
