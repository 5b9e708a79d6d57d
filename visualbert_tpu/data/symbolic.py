"""Symbolic (detector-tag) vocabulary: 1600 object classes + 400 attribute
classes + CLS/SEP/MASK (reference:
``unsupervised_visualbert/src/lxrt/symbolic_vocabulary.py:3-60``).

Symbolic id layout: [0..n_obj) objects, [n_obj..n_obj+n_attr) attributes,
then CLS, SEP, MASK.
"""

from __future__ import annotations

from typing import List, Sequence

from visualbert_tpu.data.tokenization import BertTokenizer


class SymbolicVocab:
    def __init__(self, objects: Sequence[str], attributes: Sequence[str]):
        self.objects = list(objects)
        self.attributes = list(attributes)
        self.n_obj = len(self.objects)
        self.n_attr = len(self.attributes)
        self.cls_id = self.n_obj + self.n_attr
        self.sep_id = self.cls_id + 1
        self.mask_id = self.cls_id + 2
        self.size = self.n_obj + self.n_attr + 3

    @classmethod
    def from_files(cls, objects_path: str, attributes_path: str) -> "SymbolicVocab":
        def read(p):
            with open(p) as f:
                # BUTD vocab lines may hold comma-separated synonyms; the
                # reference keeps the first (symbolic_vocabulary.py:14-20)
                return [line.strip().split(",")[0] for line in f if line.strip()]

        return cls(read(objects_path), read(attributes_path))

    def obj_to_symbolic(self, obj_id: int) -> int:
        return obj_id

    def attr_to_symbolic(self, attr_id: int) -> int:
        return self.n_obj + attr_id

    def symbolic_to_word(self, sym_id: int) -> str:
        if sym_id < self.n_obj:
            return self.objects[sym_id]
        if sym_id < self.n_obj + self.n_attr:
            return self.attributes[sym_id - self.n_obj]
        return ["[CLS]", "[SEP]", "[MASK]"][sym_id - self.n_obj - self.n_attr]

    def subword_lists(self, tokenizer: BertTokenizer) -> List[List[int]]:
        """Per-symbol wordpiece-id lists — used to initialize the symbolic
        embedding as the MEAN of each word's subword embeddings
        (modeling.py:550-559)."""
        out = []
        for i in range(self.size):
            word = self.symbolic_to_word(i)
            if word in ("[CLS]", "[SEP]", "[MASK]"):
                out.append([tokenizer.vocab[word]])
            else:
                pieces = tokenizer.tokenize(word) or ["[UNK]"]
                out.append([tokenizer.vocab.get(p, tokenizer.vocab["[UNK]"]) for p in pieces])
        return out


def initialize_symbolic_embedding(word_embedding, subword_lists) -> "object":
    """Mean-of-subwords init for the symbolic table (numpy in, numpy out)."""
    import numpy as np

    word_embedding = np.asarray(word_embedding)
    rows = [word_embedding[ids].mean(axis=0) for ids in subword_lists]
    return np.stack(rows, axis=0)
