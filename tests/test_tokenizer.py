"""Golden-token tests for the byte-BPE tokenizer.

golden_tokens.json was produced by running the reference implementation
(/root/reference/src/open_clip/tokenizer.py) on the same strings.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from cosmos_tpu.data.tokenizer import SimpleTokenizer, tokenize, decode

GOLDEN = json.loads((Path(__file__).parent / "golden_tokens.json").read_text())


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


@pytest.mark.parametrize("case", GOLDEN, ids=[c["text"][:20] or "<empty>" for c in GOLDEN])
def test_golden_tokens(tok, case):
    ids = tok([case["text"]])[0]
    np.testing.assert_array_equal(ids, np.asarray(case["ids"], dtype=np.int32))


def test_special_ids(tok):
    assert tok.sot_token_id == 49406
    assert tok.eot_token_id == 49407
    assert tok.vocab_size == 49408


def test_roundtrip(tok):
    text = "a photo of a cat"
    ids = tok.encode(text)
    assert decode.__module__  # module-level helpers exist
    assert tok.decode(ids).strip() == text


def test_truncation_keeps_eot(tok):
    ids = tok(["word " * 200])[0]
    assert ids.shape == (77,)
    assert ids[-1] == tok.eot_token_id


def test_batch_shape():
    out = tokenize(["a", "b", "c"])
    assert out.shape == (3, 77)
    assert out.dtype == np.int32


def test_reduction_masks():
    long_text = "the quick brown fox jumps over the lazy dog " * 20
    for mode in ("simple", "random", "shuffle", "syntax"):
        t = SimpleTokenizer(context_length=16, reduction_mask=mode)
        ids = t([long_text])
        assert ids.shape == (1, 16)
        assert ids[0, 0] == t.sot_token_id
        assert (ids[0] == t.eot_token_id).any()
