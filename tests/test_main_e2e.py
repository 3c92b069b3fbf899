"""End-to-end trainer test: synthetic data, 1 epoch, save + resume."""

import os

import numpy as np
import pytest

from cosmos_tpu.training.main import main

BASE_ARGS = [
    "--model", "ViT-Tiny-Test",
    "--dataset-type", "synthetic",
    "--train-num-samples", "64",
    "--batch-size", "2",
    "--steps-per-epoch", "2",
    "--lr", "1e-3",
    "--warmup", "1",
    "--use-imagecrop-aug",
    "--local-crops-number", "2",
    "--caption-sampling-mode", "textcrop",
    "--num-sampled-captions", "3",
    "--cosmos", "--output-all", "--attentional-pool", "--add-zero-attn",
    "--fix-momentum",
    "--log-every-n-steps", "1",
    "--val-frequency", "0",
    "--workers", "0",
    "--precision", "fp32",
]


def test_train_save_resume(tmp_path):
    logs = str(tmp_path / "logs")
    args = BASE_ARGS + [
        "--logs-dir", logs, "--name", "e2e", "--epochs", "1",
        "--save-frequency", "1",
    ]
    m1 = main(args)
    assert np.isfinite(m1["train_loss"])
    ckpt_dir = os.path.join(logs, "e2e", "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))

    # resume latest and continue to epoch 2
    args2 = BASE_ARGS + [
        "--logs-dir", logs, "--name", "e2e", "--epochs", "2",
        "--save-frequency", "1", "--resume", "latest",
    ]
    m2 = main(args2)
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))
    assert np.isfinite(m2["train_loss"])


def test_train_tensor_parallel_mesh(tmp_path):
    """--mesh-shape dp,tp routes through the GSPMD tensor-parallel step:
    trains, checkpoints, and resumes (TP-aware re-placement) on a (4,2)
    mesh of the 8 virtual devices."""
    logs = str(tmp_path / "logs")
    args = BASE_ARGS + [
        "--logs-dir", logs, "--name", "tp-e2e", "--epochs", "1",
        "--save-frequency", "1", "--mesh-shape", "4,2",
    ]
    m1 = main(args)
    assert np.isfinite(m1["train_loss"])
    ckpt_dir = os.path.join(logs, "tp-e2e", "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))

    args2 = BASE_ARGS + [
        "--logs-dir", logs, "--name", "tp-e2e", "--epochs", "2",
        "--save-frequency", "1", "--resume", "latest",
        "--mesh-shape", "4,2",
    ]
    m2 = main(args2)
    assert np.isfinite(m2["train_loss"])
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))


def test_train_fsdp(tmp_path):
    """--fsdp routes through the GSPMD step with ZeRO placement
    (parallel/fsdp.py): trains, checkpoints, and resumes (FSDP-aware
    re-placement) on the 8-device mesh.  The tiny model's leaves sit
    under FSDP_MIN_SIZE so most replicate — the e2e value here is the
    routing + resume path; sharding itself is covered by test_fsdp.py."""
    logs = str(tmp_path / "logs")
    args = BASE_ARGS + [
        "--logs-dir", logs, "--name", "fsdp-e2e", "--epochs", "1",
        "--save-frequency", "1", "--fsdp",
    ]
    m1 = main(args)
    assert np.isfinite(m1["train_loss"])
    ckpt_dir = os.path.join(logs, "fsdp-e2e", "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))

    args2 = BASE_ARGS + [
        "--logs-dir", logs, "--name", "fsdp-e2e", "--epochs", "2",
        "--save-frequency", "1", "--resume", "latest", "--fsdp",
    ]
    m2 = main(args2)
    assert np.isfinite(m2["train_loss"])
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))


def test_train_fsdp_tp_composed(tmp_path):
    """--fsdp --mesh-shape dp,tp (round 5): the composed placement
    (fsdp_tp_spec) trains end-to-end through main.py on a (4,2) mesh."""
    logs = str(tmp_path / "logs")
    args = BASE_ARGS + [
        "--logs-dir", logs, "--name", "fsdp-tp", "--epochs", "1",
        "--save-frequency", "1", "--fsdp", "--mesh-shape", "4,2",
    ]
    m = main(args)
    assert np.isfinite(m["train_loss"])
    assert os.path.isdir(os.path.join(
        logs, "fsdp-tp", "checkpoints", "epoch_1"))


def test_train_multislice(tmp_path):
    """--num-slices 2 factors the data mesh ('slice','data') and runs
    the hierarchical gather end-to-end; --gather-scope slice trains with
    slice-local negatives."""
    logs = str(tmp_path / "logs")
    for name, scope in (("ms-global", "global"), ("ms-slice", "slice")):
        args = BASE_ARGS + [
            "--logs-dir", logs, "--name", name, "--epochs", "1",
            "--num-slices", "2", "--gather-scope", scope,
        ]
        m = main(args)
        assert np.isfinite(m["train_loss"])


def test_multislice_rejects_tp_mesh(tmp_path):
    logs = str(tmp_path / "logs")
    args = BASE_ARGS + [
        "--logs-dir", logs, "--name", "ms-tp", "--epochs", "1",
        "--num-slices", "2", "--mesh-shape", "4,2",
    ]
    with pytest.raises(ValueError, match="num-slices"):
        main(args)
