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


def test_cifar100_reader(tmp_path):
    d = tmp_path / "cifar-100-python"
    d.mkdir()
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, (4, 3 * 32 * 32), dtype=np.uint8)
    with open(d / "test", "wb") as f:
        pickle.dump({b"data": data, b"fine_labels": [7, 3, 99, 0]}, f)
    ds = ClassificationDataset("cifar100", str(tmp_path))
    assert len(ds) == 4
    img, lab = ds[2]
    assert lab == 99
    assert img.size == (32, 32)


def test_food101_reader(tmp_path):
    meta = tmp_path / "meta"
    meta.mkdir()
    meta.joinpath("classes.txt").write_text("apple_pie\nwaffles\n")
    meta.joinpath("test.txt").write_text("waffles/001\napple_pie/002\n")
    for cls, n in (("waffles", "001"), ("apple_pie", "002")):
        (tmp_path / "images" / cls).mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "images" / cls / f"{n}.jpg"
        )
    ds = ClassificationDataset("food101", str(tmp_path))
    assert len(ds) == 2
    assert ds[0][1] == 1 and ds[1][1] == 0  # waffles=1, apple_pie=0


def test_sun397_reader(tmp_path):
    # ClassName.txt order (NOT sorted) defines the label index, matching
    # torchvision SUN397 / the prompt-bank ordering
    (tmp_path / "ClassName.txt").write_text("/z/zoo\n/a/abbey\n")
    (tmp_path / "Partitions").mkdir()
    (tmp_path / "Partitions" / "Testing_01.txt").write_text(
        "/a/abbey/sun_0001.jpg\n/z/zoo/sun_0002.jpg\n"
    )
    for p in ("a/abbey/sun_0001.jpg", "z/zoo/sun_0002.jpg"):
        f = tmp_path / p
        f.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(f)
    ds = ClassificationDataset("sun397", str(tmp_path))
    assert len(ds) == 2
    assert ds[0][1] == 1  # abbey is second in ClassName.txt
    assert ds[1][1] == 0


def test_fgvc_aircraft_reader(tmp_path):
    data = tmp_path / "data"
    (data / "images").mkdir(parents=True)
    data.joinpath("variants.txt").write_text("707-320\nA300B4\n")
    data.joinpath("images_variant_test.txt").write_text(
        "0001 A300B4\n0002 707-320\n"
    )
    for n in ("0001", "0002"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            data / "images" / f"{n}.jpg"
        )
    ds = ClassificationDataset("aircraft", str(tmp_path))
    assert len(ds) == 2
    assert ds[0][1] == 1 and ds[1][1] == 0


def test_flowers102_reader(tmp_path):
    from scipy.io import savemat

    (tmp_path / "jpg").mkdir()
    # 1-based image ids and labels (official .mat layout)
    savemat(tmp_path / "imagelabels.mat",
            {"labels": np.array([[5, 2, 9]], dtype=np.uint8)})
    savemat(tmp_path / "setid.mat",
            {"tstid": np.array([[1, 3]], dtype=np.uint16)})
    for i in (1, 3):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "jpg" / f"image_{i:05d}.jpg"
        )
    ds = ClassificationDataset("flowers", str(tmp_path))
    assert len(ds) == 2
    assert ds[0][1] == 4   # label 5 -> 0-based 4
    assert ds[1][1] == 8   # image 3 has label 9 -> 8


def test_stanford_car_reader(tmp_path):
    from scipy.io import savemat

    (tmp_path / "cars_test").mkdir()
    annos = np.zeros((1, 2), dtype=[("bbox_x1", "O"), ("class", "O"),
                                    ("fname", "O")])
    annos[0, 0] = (np.array([[1]]), np.array([[14]], dtype=np.uint8),
                   np.array(["00001.jpg"]))
    annos[0, 1] = (np.array([[2]]), np.array([[3]], dtype=np.uint8),
                   np.array(["00002.jpg"]))
    savemat(tmp_path / "cars_test_annos_withlabels.mat",
            {"annotations": annos})
    for n in ("00001", "00002"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "cars_test" / f"{n}.jpg"
        )
    ds = ClassificationDataset("stanford_car", str(tmp_path))
    assert len(ds) == 2
    assert ds[0][1] == 13 and ds[1][1] == 2  # 1-based -> 0-based
    img, _ = ds[0]
    assert img.size == (8, 8)


def test_caltech101_reader(tmp_path):
    base = tmp_path / "101_ObjectCategories"
    for cls in ("BACKGROUND_Google", "accordion", "watch"):
        (base / cls).mkdir(parents=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            base / cls / "image_0001.jpg"
        )
    ds = ClassificationDataset("caltech101", str(tmp_path))
    # BACKGROUND_Google excluded (torchvision Caltech101 convention)
    assert len(ds) == 2
    assert ds[0][1] == 0 and ds[1][1] == 1
