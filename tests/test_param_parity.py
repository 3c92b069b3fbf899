"""Reference CLI-surface parity: the round-3 flag additions.

Covers --pool-type, --force-custom-text, --skip-scheduler,
--train-eval-data/--train-val-num-samples, --copy-codebase,
--wandbkeyword, --wandb-entity-name/notes, and the --pretrained-image
refusal (reference params.py / main.py / train.py:365-374).
"""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from cosmos_tpu.training.main import experiment_name, main
from cosmos_tpu.training.params import parse_args


def _make_val_shard(path, n, seed=7):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{seed:03d}{i:05d}"
            img = Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{key}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            meta = json.dumps({"raw_caption": [f"val sample {i}"]}).encode()
            tj = tarfile.TarInfo(f"{key}.json")
            tj.size = len(meta)
            tf.addfile(tj, io.BytesIO(meta))
    return str(path)


def test_new_flags_parse():
    ns = parse_args([
        "--pool-type", "avg", "--force-custom-text", "--skip-scheduler",
        "--train-eval-data", "shard.tar", "--train-val-num-samples", "64",
        "--copy-codebase", "--wandbkeyword", "abl1",
        "--wandb-entity-name", "team", "--wandb-notes", "note",
    ])
    assert ns.pool_type == "avg"
    assert ns.force_custom_text and ns.skip_scheduler and ns.copy_codebase
    assert ns.train_eval_data == "shard.tar"
    assert ns.train_val_num_samples == 64
    # defaults: no pooling override, reference's 5120-sample cap
    ns2 = parse_args([])
    assert ns2.pool_type is None
    assert ns2.train_val_num_samples == 5120


def test_pretrained_image_refused():
    with pytest.raises(SystemExit):
        parse_args(["--pretrained-image"])


def test_wandbkeyword_in_experiment_name():
    ns = parse_args(["--wandbkeyword", "abl1"])
    assert "key_abl1" in experiment_name(ns)
    ns_named = parse_args(["--name", "fixed"])
    assert experiment_name(ns_named) == "fixed"


def test_pool_type_override_builds():
    from cosmos_tpu.models.factory import create_model

    model, _ = create_model(
        "ViT-Tiny-Test", vision_pool_type="avg", init_params=False)
    assert model.cfg.vision_cfg.pool_type == "avg"


def test_train_eval_split_and_skip_scheduler(tmp_path):
    """One tiny e2e run: --train-eval-data produces train_eval_* metrics
    for the student AND the EMA teacher, --skip-scheduler reports the
    constant base LR, --copy-codebase snapshots the package."""
    shard = _make_val_shard(tmp_path / "te-000.tar", 6)
    logs = str(tmp_path / "logs")
    metrics = main([
        "--model", "ViT-Tiny-Test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "64",
        "--batch-size", "2",
        "--steps-per-epoch", "2",
        "--lr", "1e-3",
        "--use-imagecrop-aug",
        "--local-crops-number", "2",
        "--caption-sampling-mode", "textcrop",
        "--num-sampled-captions", "3",
        "--cosmos", "--output-all", "--attentional-pool", "--add-zero-attn",
        "--fix-momentum",
        "--val-frequency", "1",
        "--zeroshot-frequency", "0",
        "--retrieval-frequency", "0",
        "--workers", "0",
        "--precision", "fp32",
        "--epochs", "1",
        "--save-frequency", "0",
        "--skip-scheduler",
        "--copy-codebase",
        "--train-eval-data", shard,
        "--train-val-num-samples", "4",
        "--logs-dir", logs, "--name", "parity",
    ])
    assert np.isfinite(metrics["train_loss"])
    # constant LR: with the scheduler skipped there is no warmup ramp, so
    # the reported LR after step 1 is exactly the base LR
    assert metrics["train_lr"] == pytest.approx(1e-3)
    # train-distribution eval ran for student and teacher
    assert "train_eval_clip_val_loss" in metrics
    assert "ema_train_eval_clip_val_loss" in metrics
    assert metrics["train_eval_num_samples"] == 4
    # codebase snapshot
    assert os.path.isfile(
        os.path.join(logs, "parity", "code", "cosmos_tpu", "__init__.py"))


def test_image_preprocess_flags():
    """--image-mean/--image-std/--image-interpolation/--image-resize-mode
    (reference params.py:258-271) reach the eval transform builder."""
    from cosmos_tpu.data.transforms import eval_transform_from_args

    ns = parse_args([
        "--image-mean", "0", "0", "0", "--image-std", "1", "1", "1",
        "--image-interpolation", "bilinear", "--image-resize-mode", "squash",
    ])
    tf = ns and eval_transform_from_args(ns, 64)
    assert tf.mean == (0.0, 0.0, 0.0)
    assert tf.std == (1.0, 1.0, 1.0)
    assert tf.interpolation == "bilinear"
    assert tf.resize_mode == "squash"
    # unset flags keep the OpenAI/bicubic defaults
    tf2 = eval_transform_from_args(parse_args([]), 64)
    assert tf2.interpolation == "bicubic" and tf2.resize_mode == "shortest"
    assert tf2.mean != (0.0, 0.0, 0.0)


def test_use_ema_model_alias():
    """--use-ema-model (reference params.py:585-588) aliases --eval-teacher
    without clobbering its default."""
    assert parse_args([]).eval_teacher is True
    assert parse_args(["--no-eval-teacher"]).eval_teacher is False
    assert parse_args(["--use-ema-model"]).eval_teacher is True


def test_pretrained_preprocess_flags_merge_into_args():
    """The pretrained tag's registry preprocess cfg (e.g. MobileCLIP's
    identity mean/std + bilinear) fills unset --image-* flags on the
    trainer path — the reference gets this from merge_preprocess_dict
    inside create_model_and_transforms (factory.py:329-330); this
    trainer builds transforms from args, so main.py merges into args."""
    from cosmos_tpu.training.main import apply_pretrained_preprocess_flags

    ns = parse_args(["--model", "MobileCLIP-S1",
                     "--pretrained", "datacompdr"])
    apply_pretrained_preprocess_flags(ns)
    assert tuple(ns.image_mean) == (0.0, 0.0, 0.0)
    assert tuple(ns.image_std) == (1.0, 1.0, 1.0)
    assert ns.image_interpolation == "bilinear"
    assert ns.image_resize_mode == "shortest"

    # explicit flags win over the registry entry
    ns = parse_args(["--model", "MobileCLIP-S1",
                     "--pretrained", "datacompdr",
                     "--image-mean", "0.5", "0.5", "0.5",
                     "--image-interpolation", "bicubic"])
    apply_pretrained_preprocess_flags(ns)
    assert tuple(ns.image_mean) == (0.5, 0.5, 0.5)
    assert ns.image_interpolation == "bicubic"
    assert tuple(ns.image_std) == (1.0, 1.0, 1.0)

    # a non-registry --pretrained (local path) merges nothing
    ns = parse_args(["--model", "ViT-B-16",
                     "--pretrained", "/tmp/ckpt.pt"])
    apply_pretrained_preprocess_flags(ns)
    assert ns.image_mean is None and ns.image_interpolation is None
