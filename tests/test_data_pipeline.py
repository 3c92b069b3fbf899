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


def test_accum_freq_divides_epoch_steps():
    """One optimizer step eats accum_freq micro-batches (reference
    train.py:106 divides num_batches by accum_freq) — otherwise each
    'epoch' would traverse the dataset accum_freq times."""
    args = _args(["--dataset-type", "synthetic", "--train-num-samples", "32",
                  "--accum-freq", "4"])
    data = get_data(args, tokenizer=None, image_size=32, context_length=12)
    assert data["train"].num_batches == 4  # 32 / (2 * 4)


def test_set_epoch_rekeys_long_lived_iterator():
    """main.py creates ONE iter() for the whole run and calls set_epoch
    each epoch: the stream must re-key itself when the epoch advances,
    and a resume at epoch k must reproduce epoch k's batches."""
    def loader(extra=()):
        args = _args(["--dataset-type", "synthetic",
                      "--train-num-samples", "16"] + list(extra))
        return get_data(args, tokenizer=None, image_size=32,
                        context_length=12)["train"].dataloader

    a = loader()
    it = iter(a)
    e0 = next(it)
    a.set_epoch(1)
    e1 = next(it)
    # epoch keying changed the stream
    assert not np.array_equal(e0["global_images"], e1["global_images"])

    # a FRESH loader jumped straight to epoch 1 (resume) sees the same
    # epoch-1 stream the continuous run saw
    b = loader()
    b.set_epoch(1)
    r1 = next(iter(b))
    np.testing.assert_array_equal(e1["global_images"], r1["global_images"])
    np.testing.assert_array_equal(e1["texts"], r1["texts"])


def test_csv_loader_shards_rows_per_process(tmp_path):
    """Multi-host CSV training must feed DISJOINT row slices (the
    reference partitions via DistributedSampler) — identical per-host
    batches would fill the contrastive matrix with duplicate negatives."""
    import csv

    from cosmos_tpu.training.data_pipeline import CsvTrainLoader
    from cosmos_tpu.training.data_pipeline import make_train_config

    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
        rows.append((str(p), f"caption number {i}"))
    csv_path = tmp_path / "train.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filepath", "title"])
        w.writerows(rows)

    def tokens_for(pi, pc):
        args = _args(["--train-data", str(csv_path),
                      "--train-num-samples", "8"])
        cfg = make_train_config(args, process_index=pi, process_count=pc)
        ldr = CsvTrainLoader(cfg, str(csv_path), "filepath", "title", ",")
        batch = next(iter(ldr))
        return batch["texts"]

    t0, t1 = tokens_for(0, 2), tokens_for(1, 2)
    # per-host batches draw from disjoint row slices -> different captions
    assert not np.array_equal(t0, t1)


def test_default_non_multicrop_webdataset_batches(tmp_path):
    """Plain CLIP training (no --use-imagecrop-aug, the params.py default)
    must produce [1, B, H, W, 3] batches — the old _collate indexed
    global_crops_number crops into 1-crop samples and killed every worker
    on the first full batch."""
    shard = _mini_shard(tmp_path / "s0.tar", n=6)
    args = parse_args([
        "--batch-size", "2", "--workers", "0",
        "--train-data", shard, "--train-num-samples", "6",
        "--caption-sampling-mode", "raw",
    ])
    assert not args.use_imagecrop_aug  # the default under test
    data = get_data(args, tokenizer=None, image_size=32, context_length=12)
    loader = data["train"].dataloader
    batch = next(iter(loader))
    loader.shutdown()
    assert batch["global_images"].shape[:2] == (1, 2)
    assert "local_images" not in batch
    assert batch["texts"].shape[0] == 1  # raw mode: one caption


def test_synthetic_honors_non_multicrop():
    args = _args(["--dataset-type", "synthetic", "--train-num-samples", "8"])
    args.use_imagecrop_aug = False
    data = get_data(args, tokenizer=None, image_size=32, context_length=12)
    batch = next(iter(data["train"].dataloader))
    assert batch["global_images"].shape[0] == 1
    assert "local_images" not in batch


def test_empty_caption_pools_do_not_crash():
    from cosmos_tpu.data.caption import default_caption, sample_captions

    assert sample_captions({"raw_caption": []}, 1, "raw") == [""]
    assert sample_captions({}, 1, "raw_pixelprose") == [""]
    got = sample_captions({}, 3, "random_pixelprose")
    assert got == ["", "", ""]
    # default_caption: pixelprose fallback + str coercion
    assert default_caption({"original_caption": "a dog"}) == "a dog"
    assert default_caption({"caption": ["x", "y"]}) == "x"
    assert default_caption({"raw_caption": [["nested"]]}) == "['nested']"
    assert default_caption({}) == ""


def test_csv_loader_rejects_batch_larger_than_host_rows(tmp_path):
    """When rows-per-host < batch_size a full pass would yield nothing
    (the loop drops partial batches) and the old path raised a misleading
    'no readable images' error — the loader must name the real
    constraint up front."""
    import csv

    from cosmos_tpu.training.data_pipeline import (
        CsvTrainLoader,
        make_train_config,
    )

    rows = [(f"/nonexistent/im{i}.jpg", f"cap {i}") for i in range(3)]
    csv_path = tmp_path / "tiny.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filepath", "title"])
        w.writerows(rows)
    args = _args(["--train-data", str(csv_path),
                  "--train-num-samples", "3", "--batch-size", "2"])
    cfg = make_train_config(args, process_index=0, process_count=2)
    with pytest.raises(ValueError, match="batch_size"):
        CsvTrainLoader(cfg, str(csv_path), "filepath", "title", ",")
