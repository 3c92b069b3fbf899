"""Segmentation stack tests: class parsing, IoU metric, postprocess
semantics, and an end-to-end benchmark run on synthetic data."""

import dataclasses
import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from cosmos_tpu.segmentation import (
    CLIPSegmentor,
    IoUMetric,
    SegBenchmark,
    SegDataset,
)
from cosmos_tpu.segmentation.segmentor import get_cls_idx
from cosmos_tpu.segmentation.metrics import reduce_zero_label
from cosmos_tpu.segmentation.dataset import keep_ratio_resize_dims


def test_get_cls_idx_synonyms():
    words, idx = get_cls_idx(["cat", "dog, puppy", "sky, cloud, heaven"])
    assert words == ["cat", "dog", "puppy", "sky", "cloud", "heaven"]
    assert idx == [0, 1, 1, 2, 2, 2]


def test_iou_metric_perfect_and_half():
    m = IoUMetric(num_classes=2)
    pred = np.array([[0, 0], [1, 1]])
    m.update(pred, pred)
    out = m.compute()
    assert out["mIoU"] == 100.0 and out["aAcc"] == 100.0

    m2 = IoUMetric(num_classes=2)
    label = np.array([[0, 0], [1, 1]])
    pred2 = np.array([[0, 1], [1, 1]])
    m2.update(pred2, label)
    out2 = m2.compute()
    # class0: inter 1, union 2 -> 0.5; class1: inter 2, union 3 -> 2/3
    np.testing.assert_allclose(out2["mIoU"], (0.5 + 2 / 3) / 2 * 100, rtol=1e-6)


def test_iou_ignores_255():
    m = IoUMetric(num_classes=2)
    label = np.array([[255, 0], [1, 255]])
    pred = np.array([[1, 0], [1, 0]])
    m.update(pred, label)
    assert m.compute()["aAcc"] == 100.0


def test_reduce_zero_label():
    lab = np.array([[0, 1], [2, 255]])
    out = reduce_zero_label(lab)
    np.testing.assert_array_equal(out, [[255, 0], [1, 255]])


def test_keep_ratio_resize():
    # (2048, 336): short side bound dominates for normal photos
    h, w = keep_ratio_resize_dims(480, 640, (2048, 336))
    assert min(h, w) == 336
    # very wide image: long side bound dominates
    h, w = keep_ratio_resize_dims(300, 4000, (2048, 336))
    assert max(h, w) == 2048


@pytest.fixture(scope="module")
def tiny_seg_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("segdata")
    (tmp / "imgs").mkdir()
    (tmp / "anns").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp / "imgs" / f"s{i}.jpg")
        lab = rng.integers(0, 3, (40, 56)).astype(np.uint8)
        Image.fromarray(lab).save(tmp / "anns" / f"s{i}.png")
    bench = SegBenchmark(
        name="tiny",
        classnames_key="voc20",
        data_root=str(tmp),
        img_dir="imgs",
        ann_dir="anns",
        scale=(64, 48),
    )
    return bench, tmp


def test_seg_dataset(tiny_seg_setup):
    bench, _ = tiny_seg_setup
    ds = SegDataset(bench)
    assert len(ds) == 2
    img, lab = ds[0]
    assert img.dtype == np.uint8
    assert lab.shape == (40, 56)


def test_segmentor_end_to_end(tiny_seg_setup):
    from cosmos_tpu.models.factory import create_model, get_tokenizer

    bench, _ = tiny_seg_setup
    model, params = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True,
    )
    tok = get_tokenizer("ViT-Tiny-Test")
    seg = CLIPSegmentor(
        model, params, tok,
        ["cat", "dog, puppy", "sky"],
        slide_crop=32, slide_stride=16,
        pamr_steps=2, pamr_stride=(2, 4),
        prob_thd=0.0,
    )
    assert seg.num_queries == 4 and seg.num_classes == 3
    ds = SegDataset(bench)
    img, lab = ds[0]
    pred = seg.predict(img, ori_shape=lab.shape[:2])
    assert pred.shape == lab.shape
    assert pred.min() >= 0 and pred.max() < 3
    # CSA path also runs
    seg_csa = CLIPSegmentor(
        model, params, tok, ["cat", "dog"], slide_crop=32, slide_stride=16,
        use_csa=True,
    )
    pred2 = seg_csa.predict(img, ori_shape=lab.shape[:2])
    assert pred2.shape == lab.shape


def test_postprocess_synonym_merge_and_thresholds():
    from cosmos_tpu.models.factory import create_model, get_tokenizer

    model, params = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True,
    )
    tok = get_tokenizer("ViT-Tiny-Test")
    seg = CLIPSegmentor(
        model, params, tok, ["bg", "cat, kitten"], prob_thd=0.9,
        logit_scale=100.0,
    )
    # query 1 and 2 are synonyms of class 1
    logits = np.zeros((2, 2, 3), np.float32)
    logits[..., 1] = 0.2
    logits[0, 0, 2] = 0.9   # synonym spike -> class 1 via max-merge
    pred = seg.postprocess(logits)
    assert pred[0, 0] == 1
    # low-confidence pixels fall to background given prob_thd
    seg.prob_thd = 1.01  # prob can never exceed 1
    pred2 = seg.postprocess(logits)
    assert (pred2 == 0).all()


def test_slide_equals_single_window():
    """One 32x32 image with crop 32: the sliding path must equal a direct
    forward_feature pass (count_mat == 1 everywhere)."""
    from cosmos_tpu.models.factory import create_model, get_tokenizer
    from cosmos_tpu.segmentation.segmentor import resize_bilinear

    import jax.numpy as jnp

    model, params = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True,
    )
    tok = get_tokenizer("ViT-Tiny-Test")
    seg = CLIPSegmentor(
        model, params, tok, ["cat", "dog"], slide_crop=32, slide_stride=16,
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    slid = seg.forward_slide(img)
    direct = np.asarray(
        resize_bilinear(
            seg._forward_feature(
                jnp.asarray(seg._normalize(img)[None])
            ),
            (32, 32),
        )
    )[0]
    np.testing.assert_allclose(slid, direct, atol=1e-5)


def test_seg_eval_cli_end_to_end(tiny_seg_setup, monkeypatch, capsys):
    """Drives the seg_eval CLI main() (training/seg_eval.py): benchmark
    selection, segmentor construction from args, the eval loop, and the
    JSON report — against the tiny on-disk dataset."""
    import json as _json

    import cosmos_tpu.segmentation as segpkg
    from cosmos_tpu.training import seg_eval

    bench, _ = tiny_seg_setup
    monkeypatch.setitem(segpkg.SEG_BENCHMARKS, "tiny-cli", bench)
    results = seg_eval.main([
        "--model", "ViT-Tiny-Test", "--benchmarks", "tiny-cli",
        "--limit", "1",
    ])
    assert "tiny-cli" in results
    out = results["tiny-cli"]
    assert 0.0 <= out["mIoU"] <= 100.0
    # the CLI prints one JSON object for scripting
    printed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "tiny-cli" in printed


def test_reduce_zero_label_matches_reference():
    """Per-benchmark zero-label reduction must mirror the reference:
    voc20 (custom_datasets.py:30), context59 (:152) and ade20k
    (cfg_ade20k.py:17) reduce; coco_stuff does NOT (mmseg
    COCOStuffDataset + plain LoadAnnotations in cfg_coco_stuff164k.py —
    _labelTrainIds.png already maps unlabeled to 255), nor do the
    with-background variants or cityscapes/coco_object."""
    from cosmos_tpu.segmentation.configs import SEG_BENCHMARKS

    expected = {
        "voc20": True, "context59": True, "ade20k": True,
        "voc21": False, "context60": False, "coco_object": False,
        "coco_stuff": False, "cityscapes": False,
    }
    got = {k: v.reduce_zero_label for k, v in SEG_BENCHMARKS.items()}
    assert got == expected


def test_window_chunking_is_equivalent(tiny_seg_setup):
    """forward_slide must give identical logits whether the windows run
    in one batch or in fixed-size zero-padded chunks (the chunking
    exists so varying per-image window counts reuse ONE compiled
    encoder instead of recompiling per aspect ratio)."""
    from cosmos_tpu.models.factory import create_model, get_tokenizer

    bench, _ = tiny_seg_setup
    model, params = create_model(
        "ViT-Tiny-Test", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True,
    )
    tok = get_tokenizer("ViT-Tiny-Test")
    kw = dict(slide_crop=32, slide_stride=16)
    ds = SegDataset(bench)
    img, _ = ds[0]
    big = CLIPSegmentor(model, params, tok, ["cat", "dog"],
                        window_chunk=64, **kw)
    small = CLIPSegmentor(model, params, tok, ["cat", "dog"],
                          window_chunk=2, **kw)
    np.testing.assert_allclose(
        big.forward_slide(img), small.forward_slide(img),
        atol=1e-5, rtol=1e-5)
