"""Native C++ WordPiece parity + speed sanity vs the Python tokenizer."""

import time

import numpy as np
import pytest

from visualbert_tpu.data.fast_tokenizer import FastBertTokenizer
from visualbert_tpu.data.tokenization import BertTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed over a "
    "lazy dog ! , . un ##want run ##ning 1 2 3 ##0 hello world cafe ' s"
).split()
assert len(set(VOCAB)) == len(VOCAB)


@pytest.fixture(scope="module")
def pair():
    vocab = {w: i for i, w in enumerate(VOCAB)}
    fast = FastBertTokenizer(vocab)
    if not fast.native_available:
        pytest.skip("native tokenizer unavailable (no g++?)")
    return fast, BertTokenizer(vocab)


TEXTS = [
    "The quick brown fox jumps over the lazy dog!",
    "unwanted running",
    "  weird   whitespace\tand\nnewlines ",
    "UNWANTED, RUNNING.",
    "120 30",
    "dog's",
    "zzz unknownword",
    "",
    "!!!",
    "a" * 150,  # 100-char cutoff → [UNK]
]


def test_native_parity(pair):
    fast, ref = pair
    for text in TEXTS:
        assert fast.encode(text) == ref.encode(text), text


def test_non_ascii_falls_back(pair):
    fast, ref = pair
    for text in ["café naïve", "中国 hello"]:
        assert fast.encode(text) == ref.encode(text)


def test_encode_batch(pair):
    fast, ref = pair
    out, lens = fast.encode_batch(TEXTS[:6], max_len=16)
    for i, t in enumerate(TEXTS[:6]):
        ids = ref.encode(t)[:16]
        assert list(out[i, : lens[i]]) == ids


def test_native_is_faster(pair):
    fast, ref = pair
    texts = ["the quick brown fox jumps over the lazy dog"] * 2000

    t0 = time.perf_counter()
    for t in texts:
        ref.encode(t)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    fast.encode_batch(texts, max_len=16)
    t_cc = time.perf_counter() - t0

    assert t_cc < t_py, (t_cc, t_py)
