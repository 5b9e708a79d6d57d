"""Masking / sequence-assembly transforms for pretraining and fine-tuning.

Deterministic, seedable numpy implementations of the reference's host-side
random transforms:

  * ``random_word`` — 15% MLM masking with the 80/10/10 mask/random/keep split
    and -1 labels elsewhere (``fine_tuning.py:272-308``).
  * ``random_word_wwm`` — whole-word masking over basic tokens
    (``unsupervised_visualbert/src/pretrain/text_data.py:415-451``).
  * ``truncate_seq_pair`` — longest-first pair truncation
    (``fine_tuning.py:624-637``).
  * ``random_mask_features`` — 15% region-feature masking, 80% zero / 10%
    in-batch random / 10% keep (``lxmert_data.py:558-583``).
  * ``compute_answer_scores`` — VQA soft targets min(0.3·count, 1)
    (``bert_data_utils.py:421-429``).
  * sequence assembly ``[CLS] a [SEP] (b [SEP])`` with masks and segments
    (``bert_data_utils.py:85-140``).

Unlike the reference (module-level ``random`` shared across DataLoader
workers), every function takes an explicit ``numpy.random.Generator`` so a
(seed, epoch, index) key reproduces any example — the grain-style recipe.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from visualbert_tpu.data.tokenization import BertTokenizer

MLM_IGNORE = -1


def _vocab_items(tokenizer) -> List[str]:
    """Vocab keys as a list, cached on the tokenizer — rebuilding the
    30522-entry list per sample was the masking hot spot."""
    vi = getattr(tokenizer, "_vocab_items_cache", None)
    if vi is None:
        vi = list(tokenizer.vocab.keys())
        try:
            tokenizer._vocab_items_cache = vi
        except AttributeError:
            pass
    return vi


def random_word(
    tokens: List[str],
    tokenizer: BertTokenizer,
    rng: np.random.Generator,
    mask_prob: float = 0.15,
) -> Tuple[List[str], List[int]]:
    """Per-token MLM corruption. Returns (corrupted tokens, labels).

    Vectorized host path: the select/action/replacement draws happen as
    three array RNG calls and Python only touches the ~15% selected
    positions (same 80/10/10 distribution as the reference
    fine_tuning.py:272; the RNG *stream* differs from a per-token loop —
    masking is distributional)."""
    n = len(tokens)
    out = list(tokens)
    labels = [MLM_IGNORE] * n
    if n == 0:
        return out, labels
    sel = np.flatnonzero(rng.random(n) < mask_prob)
    if len(sel) == 0:
        return out, labels
    p = rng.random(len(sel))
    vi = _vocab_items(tokenizer)
    repl = rng.integers(len(vi), size=len(sel))
    vocab_get = tokenizer.vocab.get
    unk = tokenizer.vocab["[UNK]"]
    for j, i in enumerate(sel.tolist()):
        pj = p[j]
        if pj < 0.8:
            out[i] = "[MASK]"
        elif pj < 0.9:
            out[i] = vi[int(repl[j])]
        # else: keep
        labels[i] = vocab_get(tokens[i], unk)
    return out, labels


def random_word_wwm(
    words: Sequence[str],
    tokenizer: BertTokenizer,
    rng: np.random.Generator,
    mask_prob: float = 0.15,
) -> Tuple[List[str], List[int]]:
    """Whole-word masking: decide per *word*, apply to all its wordpieces."""
    out_tokens: List[str] = []
    labels: List[int] = []
    vocab_items = _vocab_items(tokenizer)
    for word in words:
        pieces = tokenizer.wordpiece.tokenize(word)
        if rng.random() < mask_prob:
            p = rng.random()
            for piece in pieces:
                if p < 0.8:
                    out_tokens.append("[MASK]")
                elif p < 0.9:
                    out_tokens.append(vocab_items[int(rng.integers(len(vocab_items)))])
                else:
                    out_tokens.append(piece)
                labels.append(tokenizer.vocab.get(piece, tokenizer.vocab["[UNK]"]))
        else:
            out_tokens.extend(pieces)
            labels.extend([MLM_IGNORE] * len(pieces))
    return out_tokens, labels


def random_word_wwm_pieces(
    pieces: Sequence[str],
    tokenizer: BertTokenizer,
    rng: np.random.Generator,
    mask_prob: float = 0.15,
    group_continuations: bool = True,
) -> Tuple[List[str], List[int]]:
    """Whole-word masking over an ALREADY-wordpieced stream (the packed
    corpus path, reference text_data.py:157 → random_word_wwm :415-451).

    ``group_continuations=True``: ``##`` continuation pieces share their
    word's masking decision — true whole-word masking. ``False`` reproduces
    the reference's packed-text behavior bit-for-bit: the reference feeds
    each piece back through ``wordpiece_tokenizer.tokenize`` which maps
    ``'##x' → ['##x']`` (a vocab entry), so every piece decides
    independently — its "wwm" degenerates to per-subword masking there.
    """
    vocab_items = _vocab_items(tokenizer)
    groups: List[List[str]] = []
    for p in pieces:
        if group_continuations and p.startswith("##") and groups:
            groups[-1].append(p)
        else:
            groups.append([p])

    out_tokens: List[str] = []
    labels: List[int] = []
    for g in groups:
        if rng.random() < mask_prob:
            p = rng.random()
            for piece in g:
                if p < 0.8:
                    out_tokens.append("[MASK]")
                elif p < 0.9:
                    out_tokens.append(vocab_items[int(rng.integers(len(vocab_items)))])
                else:
                    out_tokens.append(piece)
                labels.append(tokenizer.vocab.get(piece, tokenizer.vocab["[UNK]"]))
        else:
            out_tokens.extend(g)
            labels.extend([MLM_IGNORE] * len(g))
    return out_tokens, labels


def truncate_seq_pair(tokens_a: List[str], tokens_b: List[str], max_length: int) -> None:
    """In-place longest-first truncation (from the tail)."""
    while len(tokens_a) + len(tokens_b) > max_length:
        if len(tokens_a) > len(tokens_b):
            tokens_a.pop()
        else:
            tokens_b.pop()


def truncate_front(tokens: List[str], max_length: int) -> List[str]:
    """Front truncation — the reference keeps the *end* of over-long single
    sequences (``bert_data_utils.py:52-64`` cut_first='text')."""
    if len(tokens) > max_length:
        return tokens[len(tokens) - max_length:]
    return tokens


@dataclasses.dataclass
class EncodedText:
    input_ids: np.ndarray       # [T] int32, zero-padded
    segment_ids: np.ndarray     # [T] int32
    input_mask: np.ndarray      # [T] int32
    lm_labels: Optional[np.ndarray] = None  # [T] int32, -1 where unused


def assemble_pair(
    tokens_a: List[str],
    tokens_b: Optional[List[str]],
    tokenizer: BertTokenizer,
    max_seq_length: int,
    lm_labels_a: Optional[List[int]] = None,
    lm_labels_b: Optional[List[int]] = None,
) -> EncodedText:
    """``[CLS] a [SEP] (b [SEP])`` with zero-padding to max_seq_length."""
    tokens = ["[CLS]"] + list(tokens_a) + ["[SEP]"]
    segments = [0] * len(tokens)
    labels = [MLM_IGNORE]
    labels += list(lm_labels_a) if lm_labels_a is not None else [MLM_IGNORE] * len(tokens_a)
    labels += [MLM_IGNORE]
    if tokens_b:
        tokens += list(tokens_b) + ["[SEP]"]
        segments += [1] * (len(tokens_b) + 1)
        labels += list(lm_labels_b) if lm_labels_b is not None else [MLM_IGNORE] * len(tokens_b)
        labels += [MLM_IGNORE]

    ids = tokenizer.convert_tokens_to_ids(tokens)
    assert len(ids) <= max_seq_length, (len(ids), max_seq_length)

    T = max_seq_length
    input_ids = np.zeros(T, np.int32)
    segment_ids = np.zeros(T, np.int32)
    input_mask = np.zeros(T, np.int32)
    lm = np.full(T, MLM_IGNORE, np.int32)
    n = len(ids)
    input_ids[:n] = ids
    segment_ids[:n] = segments
    input_mask[:n] = 1
    lm[:n] = labels
    return EncodedText(input_ids, segment_ids, input_mask, lm)


def random_mask_features(
    feats: np.ndarray,
    rng: np.random.Generator,
    mask_prob: float = 0.15,
    pool: Optional[np.ndarray] = None,
    in_batch_mark: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Region-feature masking for the unsupervised stack
    (reference ``lxmert_data.py:558-583``).

    Returns (corrupted feats, mask) where mask[i]=1 marks a masked region
    (loss is computed there). 80% zero, 10% random-replace, 10% keep.

    The 10% random branch has two modes:
      * ``in_batch_mark=True`` (the reference's ``inbatch_random`` headline
        config): leave the feature untouched here and set mask[i]=2.0 — a
        transient mark that ``in_batch_random_replace`` consumes at collate
        time, swapping in an ORIGINAL feature from another example of the
        batch and resetting the mark to 1.0 (lxmert_data.py:576-579,756-771).
      * otherwise: replace from ``pool`` (defaults to the same image's
        regions — the reference's non-inbatch mode draws from the whole
        dataset via ``random_feat``; pass a cross-example pool for that).
    """
    feats = feats.copy()
    n = feats.shape[0]
    mask = np.zeros(n, np.float32)
    if pool is None:
        pool = feats
    for i in range(n):
        if rng.random() < mask_prob:
            mask[i] = 1.0
            p = rng.random()
            if p < 0.8:
                feats[i] = 0.0
            elif p < 0.9:
                if in_batch_mark:
                    mask[i] = 2.0  # special mark; resolved at collate time
                else:
                    feats[i] = pool[int(rng.integers(pool.shape[0]))]
    return feats, mask


def in_batch_random_replace(batch: dict, rng: np.random.Generator) -> dict:
    """Resolve the 2.0 marks left by ``random_mask_features(in_batch_mark=
    True)``: each marked region is overwritten with the ORIGINAL (uncorrupted
    ``feat_target``) feature of a random region j≠i of a random OTHER example
    in the batch, and its conf weight drops back to 1.0 — the reference's
    ``create_in_batch_random_feat`` collate hook (lxmert_data.py:756-771).

    Mutates and returns ``batch`` (arrays are the collated copies)."""
    fm = batch.get("feat_mask")
    if fm is None or not (fm == 2.0).any():
        return batch
    feats = batch["visual_feats"]
    target = batch["feat_target"]
    B, N = fm.shape
    if B < 2 or N < 2:  # degenerate batch: keep the feature (mark → keep)
        fm[fm == 2.0] = 1.0
        return batch
    for b, i in np.argwhere(fm == 2.0):
        ob = int(rng.integers(B - 1))
        if ob >= b:
            ob += 1  # uniform over the OTHER examples
        oj = int(rng.integers(N - 1))
        if oj >= i:
            oj += 1  # reference also rejects j == i
        feats[b, i] = target[ob, oj]
        fm[b, i] = 1.0
    return batch


def compute_answer_scores(counts: np.ndarray) -> np.ndarray:
    """VQA soft score: min(0.3 * #annotators, 1.0)."""
    return np.minimum(0.3 * counts.astype(np.float32), 1.0)
