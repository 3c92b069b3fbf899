"""AOT model export for serving — the TPU-native analog of the
reference's ``trace_model`` / ``--trace`` torch.jit path
(/root/reference/src/open_clip/model.py:639-654, params.py:350-353).

``jax.export`` serializes the jitted encoders to StableHLO: a
self-contained artifact a serving runtime (or a later process) can load
and run without the Python model definition — the same contract
torch.jit.trace gives torch serving.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _encoder_fns(model):
    def _feat(out, key):
        # CLIP encoders return a dict; CoCa's return the bare array
        return out[key] if isinstance(out, dict) else out

    def encode_image(params, images):
        return _feat(model.apply(
            {"params": params}, images, True, method=model.encode_image
        ), "image_features")

    def encode_text(params, tokens):
        return _feat(model.apply(
            {"params": params}, tokens, True, method=model.encode_text
        ), "text_features")

    return encode_image, encode_text


def trace_model(
    model,
    params,
    batch_size: int = 256,
    image_size: Optional[int] = None,
    context_length: Optional[int] = None,
) -> Dict[str, bytes]:
    """Serialize jitted normalized encoders to StableHLO bytes.

    Returns {'encode_image': ..., 'encode_text': ...} serialized
    artifacts; deserialize with ``load_traced`` (or jax.export directly).
    """
    from jax import export

    image_size = image_size or model.cfg.vision_cfg.image_size
    context_length = context_length or model.cfg.text_cfg.context_length
    encode_image, encode_text = _encoder_fns(model)

    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        params,
    )
    img_spec = jax.ShapeDtypeStruct(
        (batch_size, image_size, image_size, 3), jnp.float32
    )
    txt_spec = jax.ShapeDtypeStruct((batch_size, context_length), jnp.int32)

    exp_img = export.export(jax.jit(encode_image))(params_spec, img_spec)
    exp_txt = export.export(jax.jit(encode_text))(params_spec, txt_spec)
    return {
        "encode_image": exp_img.serialize(),
        "encode_text": exp_txt.serialize(),
    }


def save_traced(artifacts: Dict[str, bytes], path: str) -> None:
    """Write the serialized encoders as <path>/{name}.stablehlo."""
    import os

    os.makedirs(path, exist_ok=True)
    for name, blob in artifacts.items():
        with open(os.path.join(path, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)


def load_traced(path: str) -> Dict:
    """Load serialized encoders back as callables (params, batch) -> feats."""
    import os

    from jax import export

    out = {}
    for fname in os.listdir(path):
        if not fname.endswith(".stablehlo"):
            continue
        with open(os.path.join(path, fname), "rb") as f:
            exp = export.deserialize(f.read())
        out[fname[: -len(".stablehlo")]] = functools.partial(exp.call)
    return out
