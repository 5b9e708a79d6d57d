"""Tokenizer parity vs HuggingFace's slow BertTokenizer (same algorithm as the
reference's vendored tokenizer) over a locally-built vocab, plus property
tests for the masking library."""

import numpy as np
import pytest

from visualbert_tpu.data.masking import (
    assemble_pair,
    compute_answer_scores,
    random_mask_features,
    random_word,
    truncate_seq_pair,
)
from visualbert_tpu.data.tokenization import BertTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed over a "
    "lazy dog ! , . un ##want ##ed run ##ning 1 2 3 ##0 hello world 中 国 "
    "cafe naive ' s"
).split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tok(vocab_file):
    return BertTokenizer.from_file(vocab_file)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    transformers = pytest.importorskip("transformers")
    return transformers.BertTokenizer(vocab_file, do_lower_case=True, use_fast=False)


@pytest.mark.parametrize(
    "text",
    [
        "The quick brown fox jumps over the lazy dog!",
        "unwanted running",
        "  weird   whitespace\tand\nnewlines ",
        "UNWANTED, RUNNING.",
        "café naïve",               # accent stripping
        "中国 hello",               # CJK split
        "120 30",
        "dog's",
        "completely-unknownword xyz",
        "",
    ],
)
def test_tokenize_matches_hf(tok, hf_tok, text):
    assert tok.tokenize(text) == hf_tok.tokenize(text)


def test_encode_roundtrip(tok):
    ids = tok.encode("the quick fox")
    assert tok.convert_ids_to_tokens(ids) == ["the", "quick", "fox"]


def test_random_word_distribution(tok):
    rng = np.random.default_rng(0)
    tokens = ["the", "quick", "brown", "fox"] * 2500
    out, labels = random_word(tokens, tok, rng)
    n = len(tokens)
    masked = sum(1 for l in labels if l != -1)
    assert 0.13 < masked / n < 0.17
    n_mask_tok = sum(1 for t in out if t == "[MASK]")
    assert 0.75 < n_mask_tok / masked < 0.85
    # labels hold the ORIGINAL ids
    for i, l in enumerate(labels):
        if l != -1:
            assert tok.ids_to_tokens[l] == tokens[i]
    # deterministic given same seed
    out2, labels2 = random_word(tokens, tok, np.random.default_rng(0))
    assert out2 == out and labels2 == labels


def test_truncate_seq_pair():
    a = list("abcdefgh")
    b = list("xyz")
    truncate_seq_pair(a, b, 6)
    assert len(a) + len(b) == 6
    assert a == list("abc") and b == list("xyz")


def test_assemble_pair(tok):
    enc = assemble_pair(["the", "fox"], ["lazy", "dog"], tok, max_seq_length=10)
    ids = list(enc.input_ids)
    assert ids[:7] == tok.convert_tokens_to_ids(
        ["[CLS]", "the", "fox", "[SEP]", "lazy", "dog", "[SEP]"]
    )
    assert ids[7:] == [0, 0, 0]
    assert list(enc.segment_ids[:7]) == [0, 0, 0, 0, 1, 1, 1]
    assert list(enc.input_mask) == [1] * 7 + [0] * 3
    assert all(l == -1 for l in enc.lm_labels)


def test_random_mask_features():
    rng = np.random.default_rng(1)
    feats = np.ones((2000, 4), np.float32)
    out, mask = random_mask_features(feats, rng)
    assert 0.12 < mask.mean() < 0.18
    zeroed = (out.sum(axis=1) == 0).mean()
    assert 0.09 < zeroed < 0.15  # ~ 0.15*0.8
    assert feats.sum() == 2000 * 4  # input not mutated


def test_compute_answer_scores():
    np.testing.assert_allclose(
        compute_answer_scores(np.array([0, 1, 2, 3, 4, 10])),
        [0.0, 0.3, 0.6, 0.9, 1.0, 1.0],
        atol=1e-6,
    )
