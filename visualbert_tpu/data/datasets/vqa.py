"""VQA2 dataset (reference: ``visualbert/dataloaders/vqa_dataset.py``).

Text contract (vqa_dataset.py:220-230): ``[CLS] question ? [MASK] [SEP]`` —
the classifier head reads the hidden state at the ``[MASK]`` slot (position
``sum(input_mask) - 2``). Targets are 3129-way soft scores
``min(0.3·count, 1)`` over the answer vocabulary (bert_data_utils.py:421-429).

Annotations are a list of dicts (the Pythia imdb contract,
vqa_dataset.py:55-64):
  {"question_tokens": [...], "image_id": str, "answers": [str, ...] (train)}
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from visualbert_tpu.data.features import FeatureStore
from visualbert_tpu.data.masking import MLM_IGNORE, assemble_pair, compute_answer_scores
from visualbert_tpu.data.pipeline import pad_regions
from visualbert_tpu.data.tokenization import BertTokenizer

NUM_VQA_ANSWERS = 3129


class AnswerVocab:
    """Answer-string → index table (``vqa_dataset.py:323-344`` VocabDict)."""

    def __init__(self, words: Sequence[str]):
        self.word_list = list(words)
        self.word2idx = {w: i for i, w in enumerate(self.word_list)}

    @classmethod
    def from_file(cls, path: str) -> "AnswerVocab":
        with open(path) as f:
            if path.endswith(".json"):
                return cls(json.load(f))
            return cls([line.strip() for line in f if line.strip()])

    def __len__(self):
        return len(self.word_list)

    def get(self, word: str) -> Optional[int]:
        return self.word2idx.get(word)


class VQADataset:
    def __init__(
        self,
        annotations: List[Dict],
        features: FeatureStore,
        tokenizer: BertTokenizer,
        answer_vocab: AnswerVocab,
        *,
        max_seq_length: int = 128,
        max_regions: int = 100,
        with_labels: bool = True,
        advanced: bool = False,
        max_answer_tokens: int = 4,
    ):
        self.annotations = annotations
        self.features = features
        self.tokenizer = tokenizer
        self.answer_vocab = answer_vocab
        self.max_seq_length = max_seq_length
        self.max_regions = max_regions
        self.with_labels = with_labels
        # ``vqa_advanced`` (reference vqa_dataset.py:158-184): the answer is
        # appended as [MASK] slots and predicted as masked tokens (MLM head)
        # instead of a 3129-way classifier.
        self.advanced = advanced
        self.max_answer_tokens = max_answer_tokens

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, args) -> Dict[str, np.ndarray]:
        i, rng = args if isinstance(args, tuple) else (args, np.random.default_rng(0))
        item = self.annotations[i]

        tokens = self.tokenizer.tokenize(" ".join(item["question_tokens"]))
        if self.advanced:
            answer = item.get("answer_str") or (item.get("answers") or [""])[0]
            ans_tokens = self.tokenizer.tokenize(answer)[: self.max_answer_tokens]
            budget = self.max_seq_length - 2 - len(ans_tokens)
            tokens = tokens[: budget - 1] + ["?"]
            lm_labels = [-1] * len(tokens) + [
                self.tokenizer.vocab.get(t, self.tokenizer.vocab["[UNK]"])
                for t in ans_tokens
            ]
            tokens = tokens + ["[MASK]"] * len(ans_tokens)
            enc = assemble_pair(
                tokens, None, self.tokenizer, self.max_seq_length, lm_labels
            )
        else:
            tokens = tokens + ["?", "[MASK]"]
            tokens = tokens[: self.max_seq_length - 2]
            enc = assemble_pair(tokens, None, self.tokenizer, self.max_seq_length)

        feat = self.features.get(str(item["image_id"]))["features"]
        visual, image_mask, _ = pad_regions(feat, self.max_regions)

        sample = {
            "input_ids": enc.input_ids,
            "token_type_ids": enc.segment_ids,
            "input_mask": enc.input_mask,
            "visual_embeddings": visual,
            "image_mask": image_mask,
            "question_id": np.int64(item.get("question_id", i)),
        }
        if self.advanced:
            sample["masked_lm_labels"] = enc.lm_labels
            # fixed-budget masked-slot index (the answer's [MASK] positions):
            # lets the model gather the ≤max_answer_tokens slots BEFORE the
            # 30522-wide decoder matmul ([B, P, H] instead of [B, T, H] —
            # ~T/P less FLOPs/HBM, identical loss). Pad slots point at
            # position 0 ([CLS]), whose label is -1 → dropped from the loss.
            pos = np.flatnonzero(enc.lm_labels != MLM_IGNORE)[: self.max_answer_tokens]
            positions = np.zeros(self.max_answer_tokens, np.int32)
            positions[: len(pos)] = pos
            sample["mlm_positions"] = positions
        if self.with_labels and "answers" in item and not self.advanced:
            counts = np.zeros(len(self.answer_vocab), np.float32)
            for ans in item["answers"]:
                idx = self.answer_vocab.get(ans)
                if idx is not None:
                    counts[idx] += 1
            sample["label"] = compute_answer_scores(counts)
        return sample


def make_synthetic(
    n: int,
    tokenizer: BertTokenizer,
    n_answers: int = 16,
    n_regions: int = 10,
    feat_dim: int = 32,
    seed: int = 0,
):
    """Small in-memory VQA task for tests/benchmarks: answers correlate with
    a token in the question so accuracy is learnable."""
    from visualbert_tpu.data.features import ChunkFeatures

    rng = np.random.default_rng(seed)
    words = [w for w in tokenizer.vocab if not w.startswith("[") and not w.startswith("##")]
    # answers are REAL vocab words so the vqa_advanced answer-as-MLM mode
    # (labels = wordpiece ids of the answer) is learnable on the same data
    answers = [words[-(i + 1)] for i in range(n_answers)]
    annotations, chunk = [], {}
    for i in range(n):
        a = int(rng.integers(n_answers))
        q = [words[a % len(words)]] + list(rng.choice(words, size=3))
        chunk[str(i)] = {"features": rng.normal(size=(n_regions, feat_dim)).astype(np.float32)}
        annotations.append(
            {"question_tokens": q, "image_id": str(i), "answers": [answers[a]] * 4,
             "answer_str": answers[a], "question_id": i}
        )
    return annotations, ChunkFeatures(chunk), AnswerVocab(answers)


class VQAEvaluator:
    """Soft-score accuracy + leaderboard dump (reference
    ``vqa_data.py:255-288``; result json: [{"question_id", "answer"}])."""

    def __init__(self, answer_vocab: AnswerVocab):
        self.vocab = answer_vocab

    def accuracy(self, logits: np.ndarray, labels: np.ndarray) -> float:
        pred = logits.argmax(axis=-1)
        return float(np.take_along_axis(labels, pred[:, None], axis=1).mean())

    def dump(self, question_ids: Sequence[int], logits: np.ndarray, path: str):
        pred = logits.argmax(axis=-1)
        result = [
            {"question_id": int(q), "answer": self.vocab.word_list[int(p)]}
            for q, p in zip(question_ids, pred)
        ]
        with open(path, "w") as f:
            json.dump(result, f)
