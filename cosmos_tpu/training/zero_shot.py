"""Zero-shot classification: prompt-ensembled classifier + top-k eval.

Parity targets:
  - /root/reference/src/open_clip/zero_shot_classifier.py:21-71
    build_zero_shot_classifier: batches of classnames x templates ->
    encode_text -> per-template L2 normalize -> template mean -> renorm ->
    [D, n_classes] weight matrix.
  - /root/reference/src/training/zero_shot.py:12-121: accuracy top-k, the
    `logits = 100 * img_feat @ classifier` eval loop, ImageNet eval, and
    the 10 extra classification datasets driven by the
    templates.json/label.json prompt banks (bundled here as
    assets/classification_banks.json).
"""

from __future__ import annotations

import functools
import json
import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_ASSETS = Path(__file__).resolve().parent.parent / "assets"


@functools.lru_cache(maxsize=1)
def load_imagenet_metadata() -> Dict:
    # cached: the multi-MB 1000-class/80-template bank is re-requested
    # every eval epoch (student AND teacher) and on each metadata-
    # constant attribute access
    return json.loads((_ASSETS / "imagenet_zeroshot.json").read_text())


@functools.lru_cache(maxsize=1)
def load_classification_banks() -> Dict:
    return json.loads((_ASSETS / "classification_banks.json").read_text())


# open_clip-API metadata constants (reference zero_shot_metadata.py):
# loaded lazily from the bundled asset.  Templates are '{}'-style format
# strings — build_zero_shot_classifier accepts those or callables.
def __getattr__(name: str):
    if name in ("OPENAI_IMAGENET_TEMPLATES", "SIMPLE_IMAGENET_TEMPLATES",
                "IMAGENET_CLASSNAMES"):
        meta = load_imagenet_metadata()
        key = {
            "OPENAI_IMAGENET_TEMPLATES": "templates",
            "SIMPLE_IMAGENET_TEMPLATES": "simple_templates",
            "IMAGENET_CLASSNAMES": "classnames",
        }[name]
        return tuple(meta[key])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# canonical eval dataset names (train.py:508) -> bank keys, with aliases
# for the dataloader module names
CLASSIFICATION_DATASETS = (
    "food101", "cifar10", "cifar100", "sun397", "stanford_car",
    "aircraft", "dtd", "pets", "flowers", "caltech101",
)
_BANK_ALIASES = {
    "fgvc_aircraft": "aircraft",
    "oxford_pets": "pets",
    "flowers102": "flowers",
}


def bank_key(dataset_name: str) -> str:
    return _BANK_ALIASES.get(dataset_name, dataset_name)


def supports_eot_truncation(model) -> bool:
    """THE gate for EOT-slicing a model's text inputs (truncate_to_eot /
    the training-side --text-bucket share the exactness argument): the
    text tower must be the native causal + argmax-EOT one.  HF towers
    (bidirectional / CLS pooling), embed_cls towers, and SigLIP-style
    towers (no_causal_mask / last-pool) must encode at full context."""
    tcfg = getattr(getattr(model, "cfg", None), "text_cfg", None)
    # the rule itself lives on TextCfg (eot_truncation_exact) so the
    # training-side --text-bucket gate in models/clip.py cannot drift
    # from this eval-side one
    return bool(tcfg is not None
                and getattr(tcfg, "eot_truncation_exact", False))


def truncate_to_eot(tokens: np.ndarray, multiple: int = 16) -> np.ndarray:
    """Host-side EXACT shortening for causal + argmax-EOT text towers:
    slice a padded [N, L] prompt batch at max(eot)+1, rounded up to
    ``multiple`` (bounds jit recompiles to <= L/multiple shapes).

    Prompt-bank texts are ~8-16 tokens; the reference encodes every one
    at the full 77-token context (zero_shot_classifier.py:21-71 via the
    tokenizer's fixed context_length), paying ~5x the text-tower FLOPs.
    Exact by the same argument as the training-side --text-bucket
    (models/clip.py): under the causal mask positions <= eot attend only
    to positions <= eot, and truncation at >= eot+1 preserves the
    argmax-EOT pool position.  Only valid for the native causal tower —
    callers gate on (no hf_model_name, no embed_cls)."""
    toks = np.asarray(tokens)
    l_eff = int(toks.argmax(axis=-1).max()) + 1
    l_eff = min(-(-l_eff // multiple) * multiple, toks.shape[1])
    return toks[:, :l_eff]


def build_zero_shot_classifier(
    encode_text_fn: Callable[[np.ndarray], jax.Array],
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[str],
    num_classes_per_batch: int = 10,
    eot_truncate: bool = False,
) -> jax.Array:
    """Returns [D, n_classes] classifier weights.

    encode_text_fn: tokens [N, L] -> UNNORMALIZED text features [N, D]
    templates: format strings with a '{}' placeholder (or callables).
    eot_truncate: host-slice each chunk to max(eot)+1 (see
    truncate_to_eot) — exact for the native causal tower, ~5x fewer
    text FLOPs on the short prompt banks.
    """
    fmt = [
        (t if callable(t) else t.format) for t in templates
    ]
    num_templates = len(fmt)
    weights = []
    for start in range(0, len(classnames), num_classes_per_batch):
        batch = classnames[start : start + num_classes_per_batch]
        texts = [f(c) for c in batch for f in fmt]
        tokens = tokenizer(texts)
        if eot_truncate:
            tokens = truncate_to_eot(tokens)
        feats = encode_text_fn(tokens)  # [Nb*T, D]
        feats = feats.astype(jnp.float32)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        feats = feats.reshape(len(batch), num_templates, -1).mean(axis=1)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        weights.append(feats)
    return jnp.concatenate(weights, axis=0).T  # [D, n_classes]


def build_zero_shot_classifier_legacy(
    encode_text_fn: Callable[[np.ndarray], jax.Array],
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[str],
) -> jax.Array:
    """One-class-at-a-time variant (zero_shot_classifier.py:74-98 keeps it
    for exact-order reproducibility of old results)."""
    return build_zero_shot_classifier(
        encode_text_fn, tokenizer, classnames, templates,
        num_classes_per_batch=1,
    )


def accuracy(logits: np.ndarray, target: np.ndarray,
             topk: Sequence[int] = (1,)) -> List[float]:
    """Top-k correct counts (zero_shot.py:12-15)."""
    pred = np.argsort(-logits, axis=-1)
    return [
        float((pred[:, :k] == target[:, None]).any(axis=1).sum()) for k in topk
    ]


def run_classification_eval(
    encode_image_fn: Callable,
    classifier: jax.Array,
    dataloader,
) -> Tuple[float, float]:
    """logits = 100 * normalized image features @ classifier (zero_shot.py:17-42)."""
    top1 = top5 = n = 0.0
    expected_batch = None
    for images, target in dataloader:
        real = images.shape[0]
        if expected_batch is None:
            expected_batch = real
        if real < expected_batch:
            # pad ragged final batch (one compiled/sharded shape)
            pad = np.repeat(images[-1:], expected_batch - real, axis=0)
            images = np.concatenate([images, pad], axis=0)
        feats = encode_image_fn(jnp.asarray(images))[:real]
        feats = feats.astype(jnp.float32)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        logits = 100.0 * feats @ classifier
        a1, a5 = accuracy(np.asarray(logits), np.asarray(target), topk=(1, 5))
        top1 += a1
        top5 += a5
        n += real  # count REAL rows, not the padded batch (reference divides
        # by the true sample count, zero_shot.py:40-41)
    return top1 / n, top5 / n


def zero_shot_eval(
    encode_image_fn: Callable,
    encode_text_fn: Callable,
    tokenizer,
    data: Dict,
    use_simple_templates: bool = False,
    eot_truncate: bool = False,
) -> Dict[str, float]:
    """ImageNet zero-shot (zero_shot.py:44-85)."""
    results: Dict[str, float] = {}
    meta = load_imagenet_metadata()
    templates = (
        meta["simple_templates"] if use_simple_templates else meta["templates"]
    )
    classifier = build_zero_shot_classifier(
        encode_text_fn, tokenizer, meta["classnames"], templates,
        eot_truncate=eot_truncate,
    )
    for split in ("imagenet-val", "imagenet-v2"):
        if split in data:
            top1, top5 = run_classification_eval(
                encode_image_fn, classifier, data[split]
            )
            key = "imagenet-zeroshot-val-top1" if split == "imagenet-val" else "imagenetv2-zeroshot-val-top1"
            results[key] = top1
            results[key.replace("top1", "top5")] = top5
    return results


def zero_shot_classification_eval(
    encode_image_fn: Callable,
    encode_text_fn: Callable,
    tokenizer,
    dataset_name: str,
    dataloader,
    eot_truncate: bool = False,
) -> Dict[str, float]:
    """One of the extra datasets via its prompt/label bank
    (zero_shot.py:87-121)."""
    banks = load_classification_banks()
    key = bank_key(dataset_name)
    if key not in banks["templates"]:
        raise KeyError(
            f"no prompt bank for {dataset_name}; have "
            f"{sorted(banks['templates'])[:10]}..."
        )
    templates = banks["templates"][key]
    labels = banks["labels"][key]
    classifier = build_zero_shot_classifier(
        encode_text_fn, tokenizer, labels, templates,
        eot_truncate=eot_truncate,
    )
    top1, top5 = run_classification_eval(encode_image_fn, classifier, dataloader)
    # key naming matches the reference exactly (zero_shot.py:117-119
    # writes f'{name}-zeroshot-val-top1') so results.jsonl/tensorboard
    # runs line up with reference runs
    return {
        f"{dataset_name}-zeroshot-val-top1": top1,
        f"{dataset_name}-zeroshot-val-top5": top5,
    }
