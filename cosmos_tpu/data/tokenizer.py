"""Byte-BPE tokenizer matching the OpenAI CLIP vocabulary.

Parity target: /root/reference/src/open_clip/tokenizer.py:133-277.
The merge table asset (cosmos_tpu/assets/bpe_merges.json.gz) is the public
OpenAI CLIP merge list re-serialized as JSON; vocab construction follows
the same recipe: 256 byte symbols, their '</w>' variants, one entry per
merge, then '<start_of_text>'/'<end_of_text>' — 49408 ids total.

Outputs are numpy int32 arrays of shape [N, context_length] (the reference
returns torch.LongTensor).
"""

from __future__ import annotations

import gzip
import html
import json
import random
import string
from functools import lru_cache
from pathlib import Path
from typing import Callable, List, Optional, Union

import numpy as np
import regex as re

try:
    import ftfy

    _HAS_FTFY = True
except ImportError:  # pragma: no cover - env without ftfy
    _HAS_FTFY = False

DEFAULT_CONTEXT_LENGTH = 77
_ASSETS = Path(__file__).resolve().parent.parent / "assets"


@lru_cache()
def default_merges_path() -> str:
    return str(_ASSETS / "bpe_merges.json.gz")


@lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode mapping (tokenizer.py:31-51)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


def canonicalize_text(
    text,
    *,
    keep_punctuation_exact_string=None,
    trans_punctuation: dict = str.maketrans("", "", string.punctuation),
):
    """Lowercase + strip punctuation (tokenizer.py:103-130)."""
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(trans_punctuation)
            for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(trans_punctuation)
    text = text.lower()
    return " ".join(text.split()).strip()


def _clean_canonicalize(x):
    return canonicalize_text(basic_clean(x))


def _clean_lower(x):
    return whitespace_clean(basic_clean(x)).lower()


def _clean_whitespace(x):
    return whitespace_clean(basic_clean(x))


def get_clean_fn(type_: str):
    return {
        "canonicalize": _clean_canonicalize,
        "lower": _clean_lower,
        "whitespace": _clean_whitespace,
    }[type_]


class SimpleTokenizer:
    def __init__(
        self,
        merges_path: Optional[str] = None,
        additional_special_tokens: Optional[List[str]] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
        reduction_mask: str = "",
    ):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(merges_path or default_merges_path(), "rt", encoding="utf-8") as f:
            merges = [tuple(p) for p in json.load(f)]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        special_tokens = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            special_tokens += additional_special_tokens
        vocab.extend(special_tokens)
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {t: t for t in special_tokens}
        special = "|".join(special_tokens)
        self.pat = re.compile(
            special + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.vocab_size = len(self.encoder)
        self.all_special_ids = [self.encoder[t] for t in special_tokens]
        self.sot_token_id = self.all_special_ids[0]
        self.eot_token_id = self.all_special_ids[1]
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.reduction_fn = (
            get_reduction_mask_fn(reduction_mask) if reduction_mask else None
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = self.clean_fn(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )

    def __call__(
        self,
        texts: Union[str, List[str]],
        context_length: Optional[int] = None,
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length"

        if self.reduction_fn is not None:
            return self.reduction_fn(
                texts,
                context_length=context_length,
                sot_token_id=self.sot_token_id,
                eot_token_id=self.eot_token_id,
                encode_fn=self.encode,
            )

        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token_id
            result[i, : len(tokens)] = tokens
        return result


_default_tokenizer: Optional[SimpleTokenizer] = None


def _get_default() -> SimpleTokenizer:
    global _default_tokenizer
    if _default_tokenizer is None:
        _default_tokenizer = SimpleTokenizer()
    return _default_tokenizer


def tokenize(
    texts: Union[str, List[str]], context_length: int = DEFAULT_CONTEXT_LENGTH
) -> np.ndarray:
    return _get_default()(texts, context_length=context_length)


def decode(output_ids) -> str:
    return _get_default().decode(np.asarray(output_ids))


# --- reduction-mask strategies (tokenizer.py:280-420) ----------------------


def random_mask_tokenize(
    texts, context_length, sot_token_id, eot_token_id, encode_fn, shuffle=False
) -> np.ndarray:
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text))
        num_tokens = len(tokens)
        if num_tokens > context_length - 2:
            num_keep = context_length - 2
            indices = np.random.permutation(num_tokens)[:num_keep]
            if not shuffle:
                indices = np.sort(indices)
            tokens = tokens[indices]
            num_tokens = num_keep
        result[i, 0] = sot_token_id
        result[i, 1 : num_tokens + 1] = tokens
        result[i, num_tokens + 1] = eot_token_id
    return result


def simple_mask_tokenize(
    texts, context_length, sot_token_id, eot_token_id, encode_fn
) -> np.ndarray:
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = encode_fn(text)
        num_tokens = len(tokens)
        if num_tokens > context_length - 2:
            num_keep = context_length - 2
            start = random.randint(0, num_tokens - num_keep)
            tokens = tokens[start : start + num_keep]
        tokens = [sot_token_id] + tokens + [eot_token_id]
        result[i, : len(tokens)] = tokens
    return result


def syntax_mask_tokenize(
    texts, context_length, sot_token_id, eot_token_id, encode_fn
) -> np.ndarray:
    """Keep nouns > adjectives > verbs when truncating (tokenizer.py:332-404)."""
    import nltk

    def get_order(tag):
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    new_texts = []
    for text in texts:
        try:
            words = nltk.tokenize.word_tokenize(text)
            pos_tags = nltk.pos_tag(words)
        except LookupError:  # offline env without nltk corpora
            words = text.split()
            pos_tags = [(w, "NN") for w in words]
        order = np.argsort(np.array([get_order(t) for _, t in pos_tags]))
        sampled = sorted(order[: context_length - 2])
        new_texts.append(" ".join(str(words[j]) for j in sampled).strip())

    result = np.zeros((len(new_texts), context_length), dtype=np.int32)
    for i, text in enumerate(new_texts):
        tokens = [sot_token_id] + encode_fn(text) + [eot_token_id]
        if len(tokens) > context_length:
            tokens = tokens[:context_length]
            tokens[-1] = eot_token_id
        result[i, : len(tokens)] = tokens
    return result


def get_reduction_mask_fn(type_: str) -> Callable:
    from functools import partial

    return {
        "simple": simple_mask_tokenize,
        "random": random_mask_tokenize,
        "shuffle": partial(random_mask_tokenize, shuffle=True),
        "syntax": syntax_mask_tokenize,
    }[type_]


class HFTokenizer:
    """HuggingFace AutoTokenizer wrapper (tokenizer.py HFTokenizer)."""

    def __init__(
        self,
        tokenizer_name: str,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "whitespace",
        strip_sep_token: bool = False,
        **kwargs,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, **kwargs)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    def __call__(self, texts, context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        texts = [self.clean_fn(t) for t in texts]
        ids = self.tokenizer.batch_encode_plus(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        ).input_ids
        if self.strip_sep_token:
            ids = np.where(ids == self.tokenizer.sep_token_id, 0, ids)
        return ids.astype(np.int32)
