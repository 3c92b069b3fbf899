"""Evaluation orchestration for train-loop and eval-only runs.

Parity targets (/root/reference/src/training/train.py):
  - evaluate (:325-424): runs retrieval + zero-shot for student AND the
    EMA teacher each eval epoch, merges metric dicts, appends to
    results.jsonl.
  - zeroshot_evaluate_retrieval (:427), zeroshot_evaluate_classification
    (:477).
"""

from __future__ import annotations

import functools
import json
import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_tpu.data.datasets import RetrievalData
from cosmos_tpu.data.loader import MapDatasetLoader
from cosmos_tpu.data.transforms import EvalTransform, eval_transform_from_args
from cosmos_tpu.training.retrieval import evaluate_retrieval, get_clip_metrics
from cosmos_tpu.training.zero_shot import (
    zero_shot_classification_eval,
    zero_shot_eval,
)

logger = logging.getLogger(__name__)


class RetrievalImageDataset:
    """(eval-transformed image, raw image id) pairs for one retrieval set."""

    def __init__(self, data: RetrievalData, image_size: int = 224,
                 transform=None):
        self.data = data
        self.transform = transform or EvalTransform(image_size=image_size)

    def __len__(self):
        return len(self.data.image_paths)

    def __getitem__(self, idx):
        from PIL import Image

        img = Image.open(self.data.image_paths[idx]).convert("RGB")
        return self.transform(img), self.data.image_ids[idx]


# jitted encoder triplets are cached per (model, mesh) so an in-training
# eval every --val-frequency epochs reuses the compiled executables instead
# of paying a fresh TPU compile each time (params flow in as an argument)
# Bounded (LRU, insertion-ordered) so long-lived processes that evaluate
# many models (sweeps, test suites) don't pin every jitted executable +
# model object forever.  Each entry holds a STRONG reference to the
# objects its id()-key names (anchors): CPython reuses a freed object's
# address, so without the anchor a dead model's cache entry could alias a
# new model allocated at the same id and return encoders closed over the
# wrong architecture.
_ENCODER_CACHE: "dict" = {}
_ENCODER_CACHE_MAX = 4


def _cached(cache_key, build, anchors=()):
    """Insertion-ordered LRU get-or-build: the ONE place the eviction
    policy lives (both the encoder triple and the val-loss feature fn
    use it).  `anchors` are kept alive with the entry (see above)."""
    if cache_key not in _ENCODER_CACHE:
        value = build()
        while len(_ENCODER_CACHE) >= _ENCODER_CACHE_MAX:
            _ENCODER_CACHE.pop(next(iter(_ENCODER_CACHE)))
        _ENCODER_CACHE[cache_key] = (anchors, value)
    return _ENCODER_CACHE[cache_key][1]


def make_encoders(model, params, mesh=None):
    """Jitted normalized encoders over fixed batch shapes.

    With a mesh, eval batches shard over the data axis — ALL local devices
    evaluate (the reference gates eval to rank 0, train.py:327-328;
    SURVEY.md §2.3 notes full-mesh eval as the TPU-native upgrade).
    In a multi-host run the caller must pass a HOST-LOCAL mesh (see
    main.py): jitting over the global mesh from the master process alone
    would deadlock the other processes.
    """
    cache_key = (id(model), id(mesh))

    def _build():
        kwargs = {}
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from cosmos_tpu.parallel.mesh import DATA_AXIS

            kwargs = dict(
                in_shardings=(
                    NamedSharding(mesh, P()),
                    NamedSharding(mesh, P(DATA_AXIS)),
                ),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
            )

        @functools.partial(jax.jit, **kwargs)
        def enc_image(p, images):
            out = model.apply({"params": p}, images, True,
                              method=model.encode_image)
            return out["image_features"]

        @functools.partial(jax.jit, **kwargs)
        def enc_text_norm(p, tokens):
            out = model.apply({"params": p}, tokens, True,
                              method=model.encode_text)
            return out["text_features"]

        @functools.partial(jax.jit, **kwargs)
        def enc_text_raw(p, tokens):
            out = model.apply({"params": p}, tokens, False,
                              method=model.encode_text)
            return out["text_features"]

        return enc_image, enc_text_norm, enc_text_raw

    enc_image, enc_text_norm, enc_text_raw = _cached(
        cache_key, _build, anchors=(model, mesh)
    )

    if mesh is not None and mesh.devices.size > 1:
        # explicit placement: jit with non-trivial in_shardings refuses raw
        # numpy operands in multi-process runs (even on a host-local mesh),
        # so batches and params are device_put against the mesh first
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cosmos_tpu.parallel.mesh import DATA_AXIS

        params = jax.device_put(params, NamedSharding(mesh, P()))
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))

        ndev = mesh.devices.size

        def _wrap(fn):
            def call(x):
                # pad to a device-count multiple: P(DATA_AXIS) placement
                # requires even shards, and callers feed uneven batches
                # (e.g. build_zero_shot_classifier's n_classes x
                # n_templates chunks — cifar10 x 18 templates = 180 rows
                # on an 8-device mesh would crash the first in-training
                # eval otherwise)
                x = jnp.asarray(x)
                n = x.shape[0]
                pad = (-n) % ndev
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
                out = fn(params, jax.device_put(x, batch_sh))
                return out[:n] if pad else out
            return call

        return (_wrap(enc_image), _wrap(enc_text_norm), _wrap(enc_text_raw))

    return (
        functools.partial(enc_image, params),
        functools.partial(enc_text_norm, params),
        functools.partial(enc_text_raw, params),
    )


def host_local_params(params):
    """Pull a global-mesh param pytree onto this host as plain arrays, so
    the master process can run eval on a host-local mesh without a
    cross-process collective (multi-host rank-0 eval path).

    Replicated leaves copy one shard; SHARDED leaves (a 2-D dp,tp mesh)
    are reassembled from this host's addressable shards — valid whenever
    the model axis lies within a host, the layout parallel/tp.py
    prescribes.  If this host's shards don't cover a leaf (model axis
    spanning hosts) there is no collective-free reassembly: raise rather
    than silently evaluate partial weight tensors."""
    if jax.process_count() == 1:
        return params

    def _local(x):
        if not hasattr(x, "addressable_shards"):
            return np.asarray(x)
        if getattr(x, "is_fully_replicated", False):
            return np.asarray(x.addressable_data(0))
        out = np.empty(x.shape, x.dtype)
        covered = 0
        seen = set()
        for s in x.addressable_shards:
            idx = tuple(
                (sl.start, sl.stop) for sl in s.index
            )
            if idx in seen:
                continue
            seen.add(idx)
            block = np.asarray(s.data)
            out[s.index] = block
            covered += block.size
        if covered != x.size:
            raise ValueError(
                "host_local_params: this host's shards cover "
                f"{covered}/{x.size} elements of a {x.shape} param — the "
                "model axis spans hosts, so master-only eval cannot "
                "reassemble the weights locally.  Keep the tp axis within "
                "one host (parallel/tp.py) or disable in-loop eval."
            )
        return out

    return jax.tree.map(_local, params)


def evaluate_model(
    model,
    params,
    tokenizer,
    data: Dict,
    *,
    prefix: str = "",
    batch_size: int = 256,
    image_size: int = 224,
    mesh=None,
    zero_shot: bool = True,
    retrieval: bool = True,
    eval_transform=None,
) -> Dict[str, float]:
    """Run every eval the data dict carries for one set of weights."""
    enc_image, enc_text_norm, enc_text_raw = make_encoders(model, params, mesh)
    metrics: Dict[str, float] = {}

    # host-side EOT truncation of caption/prompt batches is exact only
    # for the native causal + argmax-EOT text tower — one shared gate
    # (zero_shot.supports_eot_truncation) keeps the rule from drifting
    from cosmos_tpu.training.zero_shot import supports_eot_truncation

    eot_truncate = supports_eot_truncation(model)

    for name in ("coco-retrieval", "flickr-retrieval"):
        if retrieval and name in data:
            rd: RetrievalData = data[name]
            img_loader = MapDatasetLoader(
                RetrievalImageDataset(rd, image_size,
                                      transform=eval_transform), batch_size
            )
            m = evaluate_retrieval(
                enc_image,
                lambda t: enc_text_norm(jnp.asarray(np.asarray(t, np.int32))),
                rd,
                img_loader,
                batch_size=batch_size,
                prefix=f"{prefix}{name.split('-')[0]}_",
                eot_truncate=eot_truncate,
            )
            metrics.update(m)
            logger.info(f"{name} [{prefix or 'student'}]: "
                        + json.dumps({k: round(v, 4) for k, v in m.items()}))

    if not zero_shot:
        return metrics

    if "imagenet-val" in data or "imagenet-v2" in data:
        m = zero_shot_eval(
            enc_image,
            lambda t: enc_text_raw(jnp.asarray(np.asarray(t, np.int32))),
            tokenizer,
            data,
            eot_truncate=eot_truncate,
        )
        metrics.update({f"{prefix}{k}": v for k, v in m.items()})
        logger.info(f"imagenet [{prefix or 'student'}]: {m}")

    from cosmos_tpu.training.zero_shot import CLASSIFICATION_DATASETS

    for name in CLASSIFICATION_DATASETS:
        if name in data:
            m = zero_shot_classification_eval(
                enc_image,
                lambda t: enc_text_raw(jnp.asarray(np.asarray(t, np.int32))),
                tokenizer,
                name,
                data[name],
                eot_truncate=eot_truncate,
            )
            metrics.update({f"{prefix}{k}": v for k, v in m.items()})
            logger.info(f"{name} [{prefix or 'student'}]: {m}")

    return metrics


def evaluate(
    model,
    state,
    tokenizer,
    data: Dict,
    epoch: int,
    args,
    mesh=None,
) -> Dict[str, float]:
    """Student + EMA-teacher evaluation (train.py:325-424 surface)."""
    metrics: Dict[str, float] = {"epoch": epoch}
    # zero-shot classification runs at its own cadence (--zeroshot-frequency,
    # reference zero_shot.py:48-51), retrieval/val-loss at --val-frequency
    zs_freq = getattr(args, "zeroshot_frequency", 1)
    rt_freq = getattr(args, "retrieval_frequency", 1)
    epochs = getattr(args, "epochs", epoch)
    zero_shot = bool(zs_freq) and (epoch % zs_freq == 0 or epoch == epochs)
    retrieval = bool(rt_freq) and (epoch % rt_freq == 0 or epoch == epochs)
    # --eval-mode narrows an eval-only run to one family (the inference
    # scripts pass it); it used to be accepted but never dispatched
    mode = getattr(args, "eval_mode", "")
    if mode == "retrieval":
        zero_shot = False
    elif mode == "classification":
        retrieval = False
    student_params = host_local_params(state.params)
    eval_teacher = (
        getattr(args, "eval_teacher", True) and state.teacher_params is not None
    )
    teacher_params = (
        host_local_params(state.teacher_params) if eval_teacher else None
    )
    # val loss + (reference train.py:355-374) the train-distribution
    # eval split, each for the student and the EMA teacher
    for split, kw in (("val", ""), ("train_eval", "train_eval")):
        if split not in data:
            continue
        metrics.update(
            evaluate_on_split(
                model, student_params, data[split], keyword=kw, epoch=epoch
            )
        )
        if eval_teacher:
            metrics.update(
                evaluate_on_split(
                    model, teacher_params, data[split],
                    keyword=f"ema_{kw}" if kw else "ema", epoch=epoch,
                )
            )
    eval_transform = eval_transform_from_args(
        args, model.cfg.vision_cfg.image_size)
    metrics.update(
        evaluate_model(
            model, student_params, tokenizer, data,
            prefix="", batch_size=args.batch_size, mesh=mesh,
            zero_shot=zero_shot, retrieval=retrieval,
            eval_transform=eval_transform,
        )
    )
    if eval_teacher:
        metrics.update(
            evaluate_model(
                model, teacher_params, tokenizer,
                data, prefix="ema_", batch_size=args.batch_size, mesh=mesh,
                zero_shot=zero_shot, retrieval=retrieval,
                eval_transform=eval_transform,
            )
        )
    if getattr(args, "checkpoint_path", None):
        results_file = os.path.join(
            os.path.dirname(args.checkpoint_path), "results.jsonl"
        )
        os.makedirs(os.path.dirname(results_file), exist_ok=True)
        with open(results_file, "a") as f:
            f.write(json.dumps(metrics) + "\n")
    return metrics


def evaluate_on_split(
    model,
    params,
    dataloader,
    *,
    keyword: str = "",
    epoch: int = 0,
) -> Dict[str, float]:
    """Contrastive val loss + in-batch rank metrics over a val split
    (train.py:527-610).  Features accumulate on host; the in-batch CLIP
    loss uses per-batch diagonal labels like the reference."""
    import jax.numpy as jnp

    # the jitted feature fn lives in the same LRU as the encoders: a fresh
    # @jax.jit closure per evaluate_on_split call would recompile the full
    # forward every --val-frequency epochs (minutes on TPU)
    def _build():
        @jax.jit
        def batch_feats(p, images, texts):
            out = model.apply({"params": p}, images, texts)
            return (
                out["image_features"],
                out["text_features"],
                out["logit_scale"],
            )

        return batch_feats

    batch_feats = _cached(("val_feats", id(model)), _build, anchors=(model,))

    all_img, all_txt = [], []
    cumulative_loss = 0.0
    num_samples = 0
    scale = 1.0
    for images, texts in dataloader:
        img_f, txt_f, scale_v = batch_feats(
            params, jnp.asarray(images), jnp.asarray(np.asarray(texts, np.int32))
        )
        scale = float(scale_v)
        img_f32 = np.asarray(img_f, np.float32)
        txt_f32 = np.asarray(txt_f, np.float32)
        all_img.append(img_f32)
        all_txt.append(txt_f32)
        logits = scale * img_f32 @ txt_f32.T
        b = logits.shape[0]

        def ce(lg):
            lg = lg - lg.max(axis=1, keepdims=True)
            logp = lg - np.log(np.exp(lg).sum(axis=1, keepdims=True))
            return -np.mean(np.diag(logp))

        cumulative_loss += 0.5 * (ce(logits) + ce(logits.T)) * b
        num_samples += b
    if num_samples == 0:
        return {}
    prefix = f"{keyword}_" if keyword else ""
    metrics = {
        f"{prefix}{k}": v
        for k, v in get_clip_metrics(
            np.concatenate(all_img), np.concatenate(all_txt), scale
        ).items()
    }
    metrics[f"{prefix}clip_val_loss"] = float(cumulative_loss / num_samples)
    metrics[f"{prefix}num_samples"] = num_samples
    return metrics
