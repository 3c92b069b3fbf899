"""get_data dispatch (training/data_pipeline.py — the reference's
data.py get_data split registry, :915-957): type auto-detection, split
creation, and epoch sizing."""

import io
import json
import tarfile

import numpy as np
import pytest
from PIL import Image

from cosmos_tpu.training.data_pipeline import _detect_dataset_type, get_data
from cosmos_tpu.training.params import parse_args


def _args(extra):
    return parse_args([
        "--batch-size", "2", "--workers", "0",
        "--use-imagecrop-aug", "--local-crops-number", "2",
        "--caption-sampling-mode", "textcrop", "--num-sampled-captions", "3",
    ] + extra)


def _mini_shard(path, n=4):
    rng = np.random.default_rng(5)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"x{i:05d}"
            img = Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{key}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            meta = json.dumps({"raw_caption": [f"cap {i}"]}).encode()
            tj = tarfile.TarInfo(f"{key}.json")
            tj.size = len(meta)
            tf.addfile(tj, io.BytesIO(meta))
    return str(path)


def test_detect_dataset_type():
    assert _detect_dataset_type(_args(["--dataset-type", "synthetic"])) == "synthetic"
    assert _detect_dataset_type(_args(["--train-data", "a.csv"])) == "csv"
    assert _detect_dataset_type(_args(["--train-data", "a.tsv"])) == "csv"
    assert _detect_dataset_type(
        _args(["--train-data", "s-{00..03}.tar"])) == "webdataset"
    assert _detect_dataset_type(_args([])) == "none"


def test_synthetic_epoch_sizing():
    args = _args(["--dataset-type", "synthetic", "--train-num-samples", "32"])
    data = get_data(args, tokenizer=None, image_size=32, context_length=12)
    info = data["train"]
    assert info.num_samples == 32
    # global batch = batch_size * devices(1) * processes(1) = 2
    assert info.num_batches == 16
    batch = next(iter(info.dataloader))
    assert batch["global_images"].shape[0] == 2  # views-major
    assert batch["texts"].shape[0] == 3          # k captions


def test_steps_per_epoch_override():
    args = _args(["--dataset-type", "synthetic", "--train-num-samples", "32",
                  "--steps-per-epoch", "5"])
    data = get_data(args, tokenizer=None, image_size=32, context_length=12)
    assert data["train"].num_batches == 5


def test_webdataset_requires_num_samples(tmp_path):
    shard = _mini_shard(tmp_path / "s-000.tar")
    args = _args(["--train-data", shard])
    with pytest.raises(ValueError, match="train-num-samples"):
        get_data(args, tokenizer=None, image_size=32, context_length=12)


def test_val_and_train_eval_splits(tmp_path):
    shard = _mini_shard(tmp_path / "v-000.tar")
    args = _args([
        "--dataset-type", "synthetic", "--train-num-samples", "8",
        "--val-data", shard, "--val-num-samples", "4",
        "--train-eval-data", shard, "--train-val-num-samples", "2",
    ])
    data = get_data(args, tokenizer=None, image_size=32, context_length=12)
    assert "val" in data and "train_eval" in data
    val_batches = list(data["val"])
    assert sum(b[0].shape[0] for b in val_batches) == 4
    te_batches = list(data["train_eval"])
    assert sum(b[0].shape[0] for b in te_batches) == 2
    imgs, toks = te_batches[0]
    assert imgs.shape[1:] == (32, 32, 3)
    assert toks.shape[1] == 12
