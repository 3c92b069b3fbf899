"""Data pipeline tests: brace expansion, tar streaming, caption sampling,
multicrop transform shapes, and an end-to-end loader batch."""

import io
import json
import random
import tarfile

import numpy as np
import pytest
from PIL import Image

from cosmos_tpu.data.caption import sample_captions, split_caption
from cosmos_tpu.data.transforms import EvalTransform, MulticropAugmentation
from cosmos_tpu.data.webdataset import (
    ShardedShardList,
    braceexpand,
    decode_sample,
    expand_urls,
    tar_to_samples,
)


def _make_shard(path, n, seed=0):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{seed:03d}{i:05d}"
            img = Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{key}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            meta = json.dumps(
                {
                    "raw_caption": [f"sample {i} from shard {seed}"],
                    "shortIB_captions": ["a short caption"],
                    "shortSV_captions": [],
                    "shortLLA_captions": [],
                    "longIB_captions": ["a much longer caption. with two parts"],
                    "longSV_captions": [],
                    "longLLA_captions": [],
                }
            ).encode()
            tj = tarfile.TarInfo(f"{key}.json")
            tj.size = len(meta)
            tf.addfile(tj, io.BytesIO(meta))
    return str(path)


def test_braceexpand():
    assert braceexpand("x-{0000..0003}.tar") == [
        "x-0000.tar", "x-0001.tar", "x-0002.tar", "x-0003.tar"
    ]
    assert braceexpand("{a,b}/{01..02}.tar") == [
        "a/01.tar", "a/02.tar", "b/01.tar", "b/02.tar"
    ]
    assert braceexpand("plain.tar") == ["plain.tar"]


def test_expand_urls_weighted():
    urls, w = expand_urls("a-{00..01}.tar::b.tar", "2::1")
    assert urls == ["a-00.tar", "a-01.tar", "b.tar"]
    assert w == [2.0, 2.0, 1.0]


def test_tar_to_samples(tmp_path):
    shard = _make_shard(tmp_path / "s.tar", 5)
    samples = list(tar_to_samples(shard))
    assert len(samples) == 5
    img, meta = decode_sample(samples[0])
    assert img.size == (64, 64)
    assert "raw_caption" in meta


def test_shard_split_disjoint_and_complete():
    urls = [f"s{i}.tar" for i in range(16)]
    seen = []
    for host in range(2):
        for worker in range(2):
            sl = ShardedShardList(
                urls, shuffle=True, seed=7,
                process_index=host, process_count=2,
                worker_index=worker, worker_count=2,
            )
            seen.append(list(sl.epoch_shards(epoch=3)))
    flat = sum(seen, [])
    assert sorted(flat) == sorted(urls)          # complete cover
    assert len(set(flat)) == len(flat)           # disjoint
    # deterministic across calls
    again = list(
        ShardedShardList(urls, shuffle=True, seed=7, process_index=0,
                         process_count=2, worker_index=0,
                         worker_count=2).epoch_shards(3)
    )
    assert again == seen[0]
    # different epoch -> different order
    other = list(
        ShardedShardList(urls, shuffle=True, seed=7, process_index=0,
                         process_count=2, worker_index=0,
                         worker_count=2).epoch_shards(4)
    )
    assert sorted(other) != sorted(again) or other != again


def test_caption_textcrop():
    meta = {
        "raw_caption": ["base caption"],
        "shortIB_captions": ["short one"],
        "shortSV_captions": ["short two"],
        "shortLLA_captions": [],
        "longIB_captions": ["long one"],
        "longSV_captions": [],
        "longLLA_captions": ["long two"],
    }
    rng = random.Random(0)
    caps = sample_captions(meta, k=8, sampling_mode="textcrop", rng=rng)
    assert len(caps) == 8
    # global captions may join multiple sentences with '. '
    assert all(isinstance(c, str) and c for c in caps)


def test_split_caption():
    assert split_caption("One. Two.\nThree</s>Four") == [
        "One", "Two", "Three", "Four"
    ]


def test_multicrop_shapes():
    aug = MulticropAugmentation(image_size=32, local_size=16,
                                local_crops_number=4, crop_scale=0.4,
                                as_uint8=True)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 100, 3), dtype=np.uint8)
    )
    crops = aug(img, random.Random(0))
    assert len(crops) == 6
    assert crops[0].shape == (32, 32, 3) and crops[0].dtype == np.uint8
    assert crops[2].shape == (16, 16, 3)
    # determinism with the same rng seed
    crops2 = aug(img, random.Random(0))
    np.testing.assert_array_equal(crops[0], crops2[0])


def test_eval_transform():
    t = EvalTransform(image_size=32)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 100, 3), dtype=np.uint8)
    )
    out = t(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32


def test_loader_end_to_end(tmp_path):
    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    shards = [_make_shard(tmp_path / f"s{i}.tar", 8, seed=i) for i in range(2)]
    cfg = WdsTrainConfig(
        urls=shards,
        batch_size=4,
        num_workers=0,      # inline thread path for tests
        local_crops_number=2,
        image_size=32,
        local_size=16,
        num_sampled_captions=4,
        context_length=16,
        shuffle_buffer=4,
    )
    loader = WdsTrainLoader(cfg)
    it = iter(loader)
    batch = next(it)
    assert batch["global_images"].shape == (2, 4, 32, 32, 3)
    assert batch["global_images"].dtype == np.uint8
    assert batch["local_images"].shape == (2, 4, 16, 16, 3)
    assert batch["texts"].shape == (4, 4, 16)
    assert batch["texts"].dtype == np.int32


def test_aug_cfg_knobs_plumb_through():
    """--aug-cfg color_jitter_prob/gray_scale_prob reach the train
    transform (reference transform.py:245-274 wrappers)."""
    import random

    from PIL import Image as PILImage

    from cosmos_tpu.data.transforms import image_transform_train

    tf = image_transform_train(
        32,
        aug_cfg={"scale": (0.5, 1.0), "color_jitter": "0.4 0.4 0.2 0.1",
                 "color_jitter_prob": 1.0, "gray_scale_prob": 1.0},
    )
    assert tf.scale == (0.5, 1.0)
    assert tf.color_jitter_prob == 1.0
    img = PILImage.fromarray(
        (np.random.default_rng(0).integers(0, 255, (48, 48, 3)))
        .astype(np.uint8)
    )
    out = tf(img, random.Random(0))
    assert out.shape == (32, 32, 3)
    # gray_scale_prob=1.0 forces grayscale: channels equal pre-normalize
    tf_u8 = image_transform_train(
        32, aug_cfg={"gray_scale_prob": 1.0}, as_uint8=True
    )
    u8 = tf_u8(img, random.Random(0))
    assert u8.dtype == np.uint8
    assert np.array_equal(u8[..., 0], u8[..., 1])
    assert np.array_equal(u8[..., 1], u8[..., 2])


def test_loader_multiprocess_workers(tmp_path):
    """Real worker PROCESSES (the production path — every other loader
    test uses the num_workers=0 inline-thread debug path): batches
    arrive well-formed from 2 workers and shutdown() reaps them."""
    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    shards = [_make_shard(tmp_path / f"w{i}.tar", 8, seed=10 + i)
              for i in range(2)]
    cfg = WdsTrainConfig(
        urls=shards,
        batch_size=4,
        num_workers=2,
        local_crops_number=2,
        image_size=32,
        local_size=16,
        num_sampled_captions=3,
        context_length=16,
        shuffle_buffer=4,
    )
    loader = WdsTrainLoader(cfg)
    procs = []
    try:
        it = iter(loader)
        for i in range(3):
            batch = next(it)
            if i == 0:
                # workers start lazily on the first next()
                procs = list(loader._procs)
                assert len(procs) == 2
                assert all(p.is_alive() for p in procs)
            assert batch["global_images"].shape == (2, 4, 32, 32, 3)
            assert batch["local_images"].shape == (2, 4, 16, 16, 3)
            assert batch["texts"].shape == (3, 4, 16)
            assert batch["texts"].dtype == np.int32
    finally:
        loader.shutdown()
    for p in procs:
        p.join(timeout=10)
        assert not p.is_alive()


def test_shortest_geometry_matches_torchvision():
    """Resize(short)+CenterCrop geometry must be torchvision-exact:
    F.resize truncates the long side, F.center_crop rounds the offset."""
    from cosmos_tpu.data.transforms import shortest_resize_crop_geometry

    # (w, h, size) -> torchvision (nw, nh, left, top), hand-computed
    cases = {
        (500, 375, 224): (298, 224, 37, 0),   # int(224*500/375)=298
        (375, 500, 224): (224, 298, 0, 37),
        (640, 480, 224): (298, 224, 37, 0),
        (401, 400, 224): (224, 224, 0, 0),    # int(224*401/400)=224
        (333, 500, 336): (336, 504, 0, 84),
        (224, 224, 224): (224, 224, 0, 0),
    }
    for (w, h, size), want in cases.items():
        assert shortest_resize_crop_geometry(w, h, size) == want, (w, h, size)


def test_loader_rejects_starved_workers(tmp_path):
    """Fewer shards than total workers must fail loudly at start (the
    reference asserts the same, data.py:466) — a worker with an empty
    strided shard split would otherwise spin forever producing nothing."""
    import pytest as _pytest

    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    shard = _make_shard(tmp_path / "only.tar", 4)
    cfg = WdsTrainConfig(urls=[shard], batch_size=2, num_workers=4,
                         image_size=32, local_size=16, context_length=16)
    loader = WdsTrainLoader(cfg)
    with _pytest.raises(ValueError, match="shards"):
        next(iter(loader))
    # resampled mode samples with replacement: no starvation possible
    cfg2 = WdsTrainConfig(urls=[shard], batch_size=2, num_workers=0,
                          resampled=True, image_size=32, local_size=16,
                          num_sampled_captions=2, context_length=16,
                          local_crops_number=2, shuffle_buffer=2)
    batch = next(iter(WdsTrainLoader(cfg2)))
    assert batch["global_images"].shape[1] == 2


def test_inline_loader_set_epoch_reaches_worker(tmp_path):
    """num_workers=0: the inline thread must be persistent (no new thread
    per iter()) and wired to a real epoch queue so set_epoch's
    deterministic reseeding contract holds (it used to be silently
    dropped on this path)."""
    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    shards = [_make_shard(tmp_path / f"e{i}.tar", 8, seed=i) for i in range(2)]
    cfg = WdsTrainConfig(
        urls=shards, batch_size=4, num_workers=0, local_crops_number=2,
        image_size=32, local_size=16, num_sampled_captions=2,
        context_length=16, shuffle_buffer=4,
    )
    loader = WdsTrainLoader(cfg)
    next(iter(loader))
    assert len(loader._procs) == 1 and len(loader._epoch_qs) == 1
    next(iter(loader))                    # re-iter: same thread, no leak
    assert len(loader._procs) == 1
    loader.set_epoch(7)
    assert loader._epoch_qs[0].get(timeout=5) == 7


def test_expand_urls_keeps_weights_for_list_input():
    from cosmos_tpu.data.webdataset import expand_urls

    urls, w = expand_urls(["a.tar", "b.tar"], "1::3")
    assert urls == ["a.tar", "b.tar"] and w == [1.0, 3.0]
    urls, w = expand_urls("a-{0..1}.tar::b.tar", "2::5")
    assert w == [2.0, 2.0, 5.0]


def test_upsampling_without_resampled_rejected(tmp_path):
    """--train-data-upsampling-factors needs --dataset-resampled (the
    strided no-replacement split can't honor weights; reference
    data.py:460-461 asserts the same)."""
    import pytest as _pytest

    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    shard = _make_shard(tmp_path / "w0.tar", 4)
    cfg = WdsTrainConfig(urls=[shard], weights=[2.0], batch_size=2,
                         num_workers=0, image_size=32, local_size=16,
                         context_length=16)
    with _pytest.raises(ValueError, match="resampled"):
        next(iter(WdsTrainLoader(cfg)))


def test_missing_shards_fail_fast(tmp_path):
    import pytest as _pytest

    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    cfg = WdsTrainConfig(urls=[str(tmp_path / "nope-000.tar")],
                         batch_size=2, num_workers=0, image_size=32,
                         local_size=16, context_length=16)
    with _pytest.raises(FileNotFoundError, match="train-data"):
        next(iter(WdsTrainLoader(cfg)))


def test_duplicate_key_tar_yields_new_sample(tmp_path):
    """A repeated key.ext starts a NEW sample (reference
    group_by_keys_nothrow) instead of silently dropping the later pair."""
    import io
    import tarfile

    from cosmos_tpu.data.webdataset import tar_to_samples

    path = tmp_path / "dup.tar"
    with tarfile.open(path, "w") as tf:
        for payload in (b"one", b"two"):
            ti = tarfile.TarInfo("0001.txt")
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    samples = list(tar_to_samples(str(path)))
    assert [s["txt"] for s in samples] == [b"one", b"two"]


def test_mid_epoch_resume_shard_invariant():
    """Bound the documented mid-epoch resume divergence (WdsTrainLoader
    docstring / PARITY.md): a resume into epoch e reproduces epoch e's
    SHARD partition exactly — per-stream order identical and no shard
    duplicated or skipped across the (process, worker) grid — because
    epoch_shards(e) is a pure function of (seed, epoch, process,
    worker), independent of loader history.  Only the intra-epoch
    SAMPLE interleaving (shuffle buffer vs batch boundary) may differ
    on a mid-epoch resume."""
    urls = [f"shard-{i:04d}.tar" for i in range(37)]
    P, W = 2, 3

    def streams(epoch):
        return [
            list(
                ShardedShardList(
                    urls, shuffle=True, seed=11,
                    process_index=p, process_count=P,
                    worker_index=w, worker_count=W,
                ).epoch_shards(epoch)
            )
            for p in range(P) for w in range(W)
        ]

    for epoch in (0, 1, 5):
        original = streams(epoch)
        resumed = streams(epoch)  # fresh objects = a restarted process
        assert original == resumed
        flat = [s for st in original for s in st]
        assert sorted(flat) == sorted(urls)  # each shard exactly once
    assert streams(0) != streams(1)  # epochs permute (detshuffle2 keying)


def test_worker_sample_rng_is_history_free():
    """The worker sample rng keys on (seed, epoch, process, worker) only
    (loader.py _worker_loop): a worker RESUMED at epoch e draws the same
    shuffle-buffer/augmentation stream as one that self-advanced to e,
    so the mid-epoch divergence is bounded to where within the epoch the
    resume happened — never to WHICH data the epoch contains."""
    keyed = lambda e: random.Random(hash((0, e, 1, 2))).random()
    assert keyed(3) == keyed(3)
    assert keyed(3) != keyed(4)
