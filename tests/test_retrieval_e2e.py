"""End-to-end retrieval eval from a synthetic COCO-format dataset:
annotation json -> RetrievalData -> encoders -> R@k metrics."""

import json

import numpy as np
import pytest
from PIL import Image

from cosmos_tpu.data.datasets import RetrievalData
from cosmos_tpu.models.factory import create_model, get_tokenizer
from cosmos_tpu.training.evaluate import evaluate_model


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "images" / "val2017").mkdir(parents=True)
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(6):
        fname = f"{i:012d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(root / "images" / "val2017" / fname)
        images.append({"id": 1000 + i, "file_name": fname})
        for c in range(2):
            annotations.append(
                {"image_id": 1000 + i, "caption": f"photo {i} caption {c}"}
            )
    (root / "annotations" / "captions_val2017.json").write_text(
        json.dumps({"images": images, "annotations": annotations})
    )
    return str(root)


def test_retrieval_data_load(coco_dir):
    tok = get_tokenizer("ViT-Tiny-Test")
    rd = RetrievalData.load("coco", coco_dir, tok)
    assert len(rd.image_paths) == 6
    assert rd.captions.shape == (12, 16)
    assert all(len(v) == 2 for v in rd.img2txt.values())


def test_full_retrieval_eval(coco_dir):
    model, params = create_model("ViT-Tiny-Test")
    tok = get_tokenizer("ViT-Tiny-Test")
    rd = RetrievalData.load("coco", coco_dir, tok)
    metrics = evaluate_model(
        model, params, tok, {"coco-retrieval": rd},
        batch_size=4, image_size=32,
    )
    for key in ("coco_image_to_text_R@1", "coco_text_to_image_R@5",
                "coco_image_to_text_mean_rank"):
        assert key in metrics, sorted(metrics)
    # random model: ranks must still be valid probabilities/counts
    assert 0.0 <= metrics["coco_image_to_text_R@1"] <= 1.0
    assert metrics["coco_text_to_image_mean_rank"] >= 1.0
