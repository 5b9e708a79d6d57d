"""Detector-tag sequence construction + joint masking (reference:
``unsupervised_visualbert/src/pretrain/tag_data_utilis.py``).

A tag sequence is one symbolic token per region — the detector's object
class, with attributes mixed in at ``insert_attr_ratio`` (tag_data_utilis.py:
44-79) — carrying its region's box. During pretraining, tags are masked 15%
(80/10/10), optionally coupled to the feature mask with
``tag_joint_mask_ratio`` (tag_data_utilis.py:92-144): a masked region's tag
is masked with that probability so the model can't trivially copy.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from visualbert_tpu.data.symbolic import SymbolicVocab

TAG_IGNORE = -1


def build_tags(
    obj_ids: np.ndarray,           # [N] detector object class ids
    attr_ids: Optional[np.ndarray],
    boxes: np.ndarray,             # [N, 4] normalized
    vocab: SymbolicVocab,
    rng: np.random.Generator,
    insert_attr_ratio: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (tags [N], tag_boxes [N, 4]) in symbolic-id space."""
    tags = np.array([vocab.obj_to_symbolic(int(o)) for o in obj_ids], np.int32)
    if attr_ids is not None and insert_attr_ratio > 0:
        swap = rng.random(len(tags)) < insert_attr_ratio
        for i in np.flatnonzero(swap):
            tags[i] = vocab.attr_to_symbolic(int(attr_ids[i]))
    return tags, boxes.astype(np.float32)


def mask_tags(
    tags: np.ndarray,
    vocab: SymbolicVocab,
    rng: np.random.Generator,
    mask_prob: float = 0.15,
    feature_mask: Optional[np.ndarray] = None,
    tag_joint_mask_ratio: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (corrupted tags, objective labels [-1 = not predicted])."""
    out = tags.copy()
    labels = np.full(len(tags), TAG_IGNORE, np.int32)
    for i in range(len(tags)):
        coupled = (
            feature_mask is not None
            and feature_mask[i] > 0
            and rng.random() < tag_joint_mask_ratio
        )
        if coupled or rng.random() < mask_prob:
            labels[i] = tags[i]
            p = rng.random()
            if p < 0.8:
                out[i] = vocab.mask_id
            elif p < 0.9:
                out[i] = int(rng.integers(vocab.n_obj + vocab.n_attr))
    return out, labels
