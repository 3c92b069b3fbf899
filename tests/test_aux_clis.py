"""Coverage for the auxiliary CLIs/utilities that had no direct tests:
the FLOPs profiler CLI (reference profiler.py), remote-sync file utils,
logging setup, last-layer re-init, and seg_eval arg surface."""

import logging
import os

import jax
import numpy as np
import pytest


def test_profiler_cli(tmp_path):
    from cosmos_tpu.training.profiler import main

    out = tmp_path / "profile.csv"
    rows = main(["--model", "ViT-Tiny-Test", "--results-file", str(out)])
    assert len(rows) == 1
    row = rows[0]
    assert row["model"] == "ViT-Tiny-Test"
    assert row["mparams"] > 0
    # XLA's CPU backend reports flops=0 in cost_analysis, so only the
    # structure is asserted here; TPU runs return real compiled FLOPs
    assert row["gflops"] >= 0
    assert "image_gflops" in row and "text_gflops" in row
    # params split accounts for everything
    assert row["image_mparams"] + row["text_mparams"] == pytest.approx(
        row["mparams"], abs=0.01)
    text = out.read_text()
    assert "gflops" in text and "ViT-Tiny-Test" in text


def test_remote_sync_fsspec_local(tmp_path):
    from cosmos_tpu.training.file_utils import remote_sync

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    (src / "epoch_3.bin").write_bytes(b"abc")
    (src / "epoch_latest.bin").write_bytes(b"skip me")
    assert remote_sync(str(src), str(dst), protocol="fsspec")
    assert (dst / "epoch_3.bin").read_bytes() == b"abc"
    # the mutable latest-pointer is excluded from sync (reference
    # file_utils.py keep_latest exclusion)
    assert not (dst / "epoch_latest.bin").exists()


def test_setup_logging(tmp_path):
    from cosmos_tpu.training.logger import setup_logging

    log_file = tmp_path / "out.log"
    setup_logging(str(log_file), level=logging.INFO)
    logging.getLogger("cosmos_tpu.test").info("hello-aux-test")
    for h in logging.root.handlers:
        h.flush()
    assert "hello-aux-test" in log_file.read_text()


def test_reinit_last_transformer_layer():
    from cosmos_tpu.models.factory import create_model
    from cosmos_tpu.models.init_utils import reinit_last_transformer_layer

    _, params = create_model("ViT-Tiny-Test", seed=0)
    new = reinit_last_transformer_layer(params, jax.random.PRNGKey(7))

    def block(p, tower, i):
        return p[tower]["transformer"][f"resblocks_{i}"]

    for tower in ("visual", "text"):
        last_old = block(params, tower, 1)
        last_new = block(new, tower, 1)
        changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(last_old), jax.tree.leaves(last_new))
        )
        assert changed, f"{tower} last block should be re-drawn"
        first_old = jax.tree.leaves(block(params, tower, 0))
        first_new = jax.tree.leaves(block(new, tower, 0))
        for a, b in zip(first_old, first_new):
            np.testing.assert_array_equal(a, b)


def test_seg_eval_args():
    from cosmos_tpu.training.seg_eval import parse_args

    ns = parse_args(["--model", "ViT-B-16", "--use-csa",
                     "--benchmarks", "voc20"])
    assert ns.model == "ViT-B-16"
    assert ns.use_csa
