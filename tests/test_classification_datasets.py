"""Classification dataset readers on synthetic on-disk layouts."""

import pickle

import numpy as np
import pytest
from PIL import Image

from cosmos_tpu.data.classification import ClassificationDataset


def test_cifar10_reader(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (6, 3 * 32 * 32), dtype=np.uint8)
    batch = {b"data": data, b"labels": [0, 1, 2, 3, 4, 5]}
    with open(d / "test_batch", "wb") as f:
        pickle.dump(batch, f)
    ds = ClassificationDataset("cifar10", str(tmp_path))
    assert len(ds) == 6
    img, lab = ds[2]
    assert lab == 2
    assert img.size == (32, 32)


def test_dtd_reader(tmp_path):
    for cls in ("banded", "dotted"):
        (tmp_path / "images" / cls).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8)
            ).save(tmp_path / "images" / cls / f"{cls}_{i}.jpg")
    (tmp_path / "labels").mkdir()
    (tmp_path / "labels" / "test1.txt").write_text(
        "banded/banded_0.jpg\ndotted/dotted_1.jpg\n"
    )
    ds = ClassificationDataset("dtd", str(tmp_path))
    assert len(ds) == 2
    _, lab0 = ds[0]
    _, lab1 = ds[1]
    assert (lab0, lab1) == (0, 1)


def test_pets_reader(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "annotations").mkdir()
    for name in ("Abyssinian_1", "beagle_2"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "images" / f"{name}.jpg"
        )
    (tmp_path / "annotations" / "test.txt").write_text(
        "Abyssinian_1 1 1 1\nbeagle_2 2 2 2\n"
    )
    ds = ClassificationDataset("pets", str(tmp_path))
    assert len(ds) == 2
    _, lab = ds[0]
    assert lab == 0  # 'abyssinian' sorts before 'beagle'


def test_unknown_dataset():
    with pytest.raises(KeyError):
        ClassificationDataset("nope", "/tmp")
