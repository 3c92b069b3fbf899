"""Checkpoint I/O: released torch .pt weights <-> flax param pytrees.

Parity targets:
  - /root/reference/src/open_clip/factory.py:147-182 load_checkpoint:
    'module.' prefix stripping, positional-embedding resize on image-size
    mismatch, strict=False semantics.
  - /root/reference/src/main.py:406-435 resume: checkpoint dicts carry
    {'epoch', 'name', 'student', 'teacher', 'optimizer'[, 'scaler']}.
  - /root/reference/src/training/clip_segmentor.py:103-109: segmentation
    loads the TEACHER weights by default.

The name map below encodes the reference CLIP state_dict layout
(model.py:240-300 + transformer.py) against this package's module tree.
Linear weights transpose ([out,in] -> [in,out]); conv1 reorders OIHW ->
HWIO; packed attention in_proj transposes to [D, 3D].
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _block_entries(prefix_t: str, prefix_f: Tuple[str, ...], i: int):
    """Name map for one ResidualAttentionBlock."""
    t = f"{prefix_t}.resblocks.{i}"
    f = prefix_f + (f"resblocks_{i}",)
    return [
        (f"{t}.ln_1.weight", f + ("ln_1", "scale"), None),
        (f"{t}.ln_1.bias", f + ("ln_1", "bias"), None),
        (f"{t}.attn.in_proj_weight", f + ("attn", "in_proj_kernel"), "t"),
        (f"{t}.attn.in_proj_bias", f + ("attn", "in_proj_bias"), None),
        (f"{t}.attn.out_proj.weight", f + ("attn", "out_proj", "kernel"), "t"),
        (f"{t}.attn.out_proj.bias", f + ("attn", "out_proj", "bias"), None),
        (f"{t}.ln_2.weight", f + ("ln_2", "scale"), None),
        (f"{t}.ln_2.bias", f + ("ln_2", "bias"), None),
        (f"{t}.mlp.c_fc.weight", f + ("mlp", "c_fc", "kernel"), "t"),
        (f"{t}.mlp.c_fc.bias", f + ("mlp", "c_fc", "bias"), None),
        (f"{t}.mlp.c_proj.weight", f + ("mlp", "c_proj", "kernel"), "t"),
        (f"{t}.mlp.c_proj.bias", f + ("mlp", "c_proj", "bias"), None),
    ]


def _cross_pool_entries(prefix_t: str, prefix_f: Tuple[str, ...]):
    return [
        (f"{prefix_t}.ln_q.weight", prefix_f + ("ln_q", "scale"), None),
        (f"{prefix_t}.ln_q.bias", prefix_f + ("ln_q", "bias"), None),
        (f"{prefix_t}.ln_k.weight", prefix_f + ("ln_k", "scale"), None),
        (f"{prefix_t}.ln_k.bias", prefix_f + ("ln_k", "bias"), None),
        (f"{prefix_t}.attn.in_proj_weight", prefix_f + ("attn", "in_proj_kernel"), "t"),
        (f"{prefix_t}.attn.in_proj_bias", prefix_f + ("attn", "in_proj_bias"), None),
        (f"{prefix_t}.attn.out_proj.weight",
         prefix_f + ("attn", "out_proj", "kernel"), "t"),
        (f"{prefix_t}.attn.out_proj.bias",
         prefix_f + ("attn", "out_proj", "bias"), None),
    ]


def _bn_entries(tkey: str, fpath: Tuple[str, ...]):
    """torch BatchNorm2d -> FrozenBatchNorm params."""
    return [
        (f"{tkey}.weight", fpath + ("scale",), None),
        (f"{tkey}.bias", fpath + ("bias",), None),
        (f"{tkey}.running_mean", fpath + ("mean",), None),
        (f"{tkey}.running_var", fpath + ("var",), None),
    ]


def build_resnet_vision_map(visual_params: Dict):
    """Name map for a ModifiedResNet visual tower (OpenAI RN checkpoints,
    reference modified_resnet.py:110-181 layout). Stage/block structure and
    downsample presence are derived from the target param tree."""
    entries = []
    for i in (1, 2, 3):
        entries.append(
            (f"visual.conv{i}.weight", ("visual", f"conv{i}", "kernel"), "conv")
        )
        entries += _bn_entries(f"visual.bn{i}", ("visual", f"bn{i}"))
    blocks = sorted(
        (k for k in visual_params if re.fullmatch(r"layer\d+_\d+", k)),
        key=lambda s: tuple(map(int, re.findall(r"\d+", s))),
    )
    for name in blocks:
        stage, blk = map(int, re.findall(r"\d+", name))
        t = f"visual.layer{stage}.{blk}"
        f = ("visual", name)
        for j in (1, 2, 3):
            entries.append(
                (f"{t}.conv{j}.weight", f + (f"conv{j}", "kernel"), "conv")
            )
            entries += _bn_entries(f"{t}.bn{j}", f + (f"bn{j}",))
        if "downsample_conv" in visual_params[name]:
            # torch Sequential(OrderedDict('-1' pool, '0' conv, '1' bn))
            entries.append(
                (f"{t}.downsample.0.weight",
                 f + ("downsample_conv", "kernel"), "conv")
            )
            entries += _bn_entries(f"{t}.downsample.1", f + ("downsample_bn",))
    ap = ("visual", "attnpool")
    entries.append(
        ("visual.attnpool.positional_embedding",
         ap + ("positional_embedding",), None)
    )
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        entries.append((f"visual.attnpool.{p}.weight", ap + (p, "kernel"), "t"))
        entries.append((f"visual.attnpool.{p}.bias", ap + (p, "bias"), None))
    return entries


def build_name_map(vision_layers: int, text_layers: int,
                   has_cosmos_heads: bool, has_poolers: bool,
                   resnet_visual: Optional[Dict] = None):
    """List of (torch_key, flax_path, transform) for the CLIP layout."""
    entries = [
        ("logit_scale", ("logit_scale",), None),
        ("token_embedding.weight", ("text", "token_embedding", "embedding"), None),
        ("positional_embedding", ("text", "positional_embedding"), None),
        ("ln_final.weight", ("text", "ln_final", "scale"), None),
        ("ln_final.bias", ("text", "ln_final", "bias"), None),
        ("text_projection", ("text", "text_projection_kernel"), None),
        # proj_bias=True models store an nn.Linear (reference
        # transformer.py:850: 'text_projection.weight/.bias') mapping to a
        # flax Dense at text/text_projection — only the form present in
        # the target tree merges; the other is skipped by path-existence
        ("text_projection.weight", ("text", "text_projection", "kernel"), "t"),
        ("text_projection.bias", ("text", "text_projection", "bias"), None),
    ]
    if resnet_visual is not None:
        entries += build_resnet_vision_map(resnet_visual)
    else:
        entries += [
            ("visual.conv1.weight", ("visual", "conv1_kernel"), "conv"),
            ("visual.class_embedding", ("visual", "class_embedding"), None),
            ("visual.positional_embedding",
             ("visual", "positional_embedding"), None),
            ("visual.ln_pre.weight", ("visual", "ln_pre", "scale"), None),
            ("visual.ln_pre.bias", ("visual", "ln_pre", "bias"), None),
            ("visual.ln_post.weight", ("visual", "ln_post", "scale"), None),
            ("visual.ln_post.bias", ("visual", "ln_post", "bias"), None),
            ("visual.proj", ("visual", "proj"), None),
        ]
        for i in range(vision_layers):
            entries += _block_entries(
                "visual.transformer", ("visual", "transformer"), i
            )
    for i in range(text_layers):
        entries += _block_entries("transformer", ("text", "transformer"), i)
    if has_cosmos_heads:
        entries += [
            ("distill_logit_scale", ("distill_logit_scale",), None),
            ("image_token_mapping.weight",
             ("image_token_mapping", "kernel"), "t"),
            ("image_token_mapping.bias", ("image_token_mapping", "bias"), None),
            ("text_token_mapping.weight", ("text_token_mapping", "kernel"), "t"),
            ("text_token_mapping.bias", ("text_token_mapping", "bias"), None),
        ]
    if has_poolers:
        entries += _cross_pool_entries(
            "visual.attn_cross_pool", ("visual", "attn_cross_pool")
        )
        entries += _cross_pool_entries(
            "text_attn_cross_pool", ("text", "attn_cross_pool")
        )
    return entries


def _apply_tf(value: np.ndarray, tf: Optional[str]) -> np.ndarray:
    if tf is None:
        return value
    if tf == "t":
        return value.T
    if tf == "conv":  # OIHW -> HWIO
        return value.transpose(2, 3, 1, 0)
    raise ValueError(tf)


def _invert_tf(value: np.ndarray, tf: Optional[str]) -> np.ndarray:
    if tf is None:
        return value
    if tf == "t":
        return value.T
    if tf == "conv":  # HWIO -> OIHW
        return value.transpose(3, 2, 0, 1)
    raise ValueError(tf)


def resize_pos_embed(pe: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic-resize a [1+N, D] vision pos embed to [target_len, D]
    (factory.py pos-embed resize behavior on image-size mismatch)."""
    if pe.shape[0] == target_len:
        return pe
    src = int(round((pe.shape[0] - 1) ** 0.5))
    dst = int(round((target_len - 1) ** 0.5))
    from cosmos_tpu.models.vit import interpolate_pos_embed

    return np.asarray(interpolate_pos_embed(pe, (src, src), (dst, dst)))


def resize_text_pos_embed(pe: np.ndarray, target_len: int) -> np.ndarray:
    """Linear-resize a [L, D] text pos embed on context-length mismatch
    (reference model.py:696-724 resize_text_pos_embed; keeps the old
    embedding when lengths already match).  Truncation for a SHORTER
    target uses interpolation too — matching torch F.interpolate
    semantics EXACTLY: mode='linear' with align_corners=False maps output
    i to source x = (i + 0.5) * src/dst - 0.5 (an endpoint-pinned
    linspace is the align_corners=TRUE formula and differs on every
    interpolated row)."""
    src = pe.shape[0]
    if src == target_len:
        return pe
    x = (np.arange(target_len, dtype=np.float64) + 0.5) * (
        src / target_len) - 0.5
    x = np.clip(x, 0.0, src - 1.0)
    i0 = np.floor(x).astype(np.int64)
    i1 = np.minimum(i0 + 1, src - 1)
    w = (x - i0)[:, None].astype(pe.dtype)
    return pe[i0] * (1 - w) + pe[i1] * w


def torch_state_dict_to_params(
    state_dict: Dict[str, Any],
    reference_params: Dict,
    strict: bool = False,
) -> Dict:
    """Convert a reference torch state_dict into this package's param tree.

    reference_params supplies the expected tree (shapes for pos-embed
    resize and layer counts).
    """
    sd = {
        re.sub(r"^module\.", "", k): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        )
        for k, v in state_dict.items()
    }
    if any(k.startswith("text.transformer.resblocks.") for k in sd):
        # CustomTextCLIP layout (model.py:440): text tower under a 'text.'
        # prefix instead of inlined at the top level — normalize to the
        # inlined CLIP naming the map below expects
        sd = {
            (k[len("text."):] if k.startswith("text.") else k): v
            for k, v in sd.items()
        }
    is_resnet = "attnpool" in reference_params["visual"]
    vision_layers = 0 if is_resnet else len(
        [k for k in reference_params["visual"]["transformer"] if k.startswith("resblocks")]
    )
    text_layers = len(
        [k for k in reference_params["text"]["transformer"] if k.startswith("resblocks")]
    )
    has_cosmos = "image_token_mapping" in reference_params
    has_poolers = "attn_cross_pool" in reference_params.get("visual", {})
    name_map = build_name_map(
        vision_layers, text_layers, has_cosmos, has_poolers,
        resnet_visual=reference_params["visual"] if is_resnet else None,
    )

    # the text projection exists in two torch forms (bare matrix vs
    # nn.Linear when proj_bias, reference transformer.py:850); a
    # checkpoint carries exactly one — the other form's map entries are
    # skipped silently, not warned about
    _ALT_FORMS = {
        "text_projection": "text_projection.weight",
        "text_projection.weight": "text_projection",
        "text_projection.bias": "text_projection",
    }

    out: Dict = {}
    used = set()
    for tkey, fpath, tf in name_map:
        if tkey not in sd:
            if tkey == "distill_logit_scale":
                continue  # plain CLIP ckpt loaded into a cosmos model
            alt = _ALT_FORMS.get(tkey)
            if alt is not None and alt in sd:
                continue
            msg = f"missing torch key {tkey}"
            if strict:
                raise KeyError(msg)
            logger.warning(msg)
            continue
        val = _apply_tf(sd[tkey], tf)
        if fpath == ("visual", "positional_embedding"):
            target = reference_params["visual"]["positional_embedding"].shape[0]
            val = resize_pos_embed(val, target)
        elif fpath == ("text", "positional_embedding"):
            target = reference_params["text"]["positional_embedding"].shape[0]
            val = resize_text_pos_embed(val, target)
        # normalize rank mismatches (e.g. scalars round-tripped as [1])
        ref_leaf = reference_params
        try:
            for p in fpath:
                ref_leaf = ref_leaf[p]
            if val.shape != ref_leaf.shape and val.size == ref_leaf.size:
                val = val.reshape(ref_leaf.shape)
        except (KeyError, TypeError):
            pass
        _set(out, fpath, val.astype(np.float32))
        used.add(tkey)
    extra = set(sd) - used - {"attn_mask"}
    if extra:
        logger.info(f"unused torch keys: {sorted(extra)[:8]}{'...' if len(extra)>8 else ''}")

    # fill anything not present from the reference tree (strict=False)
    def merge(ref, new):
        if not isinstance(ref, dict):
            return new if new is not None else ref
        return {
            k: merge(ref[k], (new or {}).get(k)) for k in ref
        }

    merged = merge(reference_params, out)
    # keep distill_logit_scale from reference init when absent
    return merged


def params_to_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse conversion (for push_to_hf / interop tests)."""
    is_resnet = "attnpool" in params["visual"]
    vision_layers = 0 if is_resnet else len(
        [k for k in params["visual"]["transformer"] if k.startswith("resblocks")]
    )
    text_layers = len(
        [k for k in params["text"]["transformer"] if k.startswith("resblocks")]
    )
    has_cosmos = "image_token_mapping" in params
    has_poolers = "attn_cross_pool" in params.get("visual", {})
    name_map = build_name_map(
        vision_layers, text_layers, has_cosmos, has_poolers,
        resnet_visual=params["visual"] if is_resnet else None,
    )
    out = {}
    for tkey, fpath, tf in name_map:
        node = params
        try:
            for p in fpath:
                node = node[p]
        except KeyError:
            continue
        out[tkey] = _invert_tf(np.asarray(node), tf)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference-format .pt checkpoint via torch (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def load_checkpoint(
    model,
    params: Dict,
    path: str,
    *,
    which: str = "student",
    strict: bool = False,
) -> Dict:
    """Public load_checkpoint (factory.py:147): torch .pt (reference
    format: raw state_dict or {'student': ..., 'teacher': ...}) or a
    native .msgpack flax file."""
    if path.endswith((".msgpack", ".flax")):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(params, f.read())

    ckpt = load_torch_checkpoint(path)
    if not isinstance(ckpt, dict) and hasattr(ckpt, "state_dict"):
        # OpenAI-release TorchScript archives load as a ScriptModule
        # (reference factory.py:229-231 routes these through
        # load_openai_model); its state_dict has the standard visual.*
        # naming the converter handles
        sd = {k: v for k, v in ckpt.state_dict().items()}
    elif isinstance(ckpt, dict) and which in ckpt:
        sd = ckpt[which]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    # third-party formats (MobileCLIP, bare timm trunks, SigLIP npz
    # saved as a dict) route through the fingerprint dispatch, exactly
    # like the reference's load_checkpoint -> convert_state_dict hook
    # (factory.py:147-182 there)
    from .convert import convert_state_dict, detect_format

    if detect_format(sd) not in ("open_clip", "unknown"):
        return convert_state_dict(model, params, sd)
    return torch_state_dict_to_params(sd, params, strict=strict)
