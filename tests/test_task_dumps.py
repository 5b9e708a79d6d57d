"""Flickr R@k and VCR logits dumps through the eval_only path."""

import os

import numpy as np

from visualbert_tpu.tasks import registry
from visualbert_tpu.utils.config_io import parse_task_config

TINY_MODEL = {
    "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
    "num_attention_heads": 2, "intermediate_size": 64,
    "max_position_embeddings": 32, "visual_embedding_dim": 32,
    "dtype": "float32",
}


def test_flickr_eval_dump(tmp_path):
    cfg = parse_task_config({
        "task": "flickr",
        "folder": str(tmp_path / "run"),
        "eval_only": True,
        "data": {"synthetic": 64, "max_seq_length": 12, "max_regions": 8,
                 "max_entities": 4},
        "model": TINY_MODEL,
        "train": {"train_batch_size": 8, "eval_batch_size": 8, "log_every": 0},
    })
    state, result = registry.run(cfg)
    m = result.history[0]
    for k in (1, 5):
        assert f"recall_at_{k}" in m
        assert 0.0 <= m[f"recall_at_{k}"] <= 1.0
    # recall is monotone in k
    assert m["recall_at_5"] >= m["recall_at_1"]
    assert m["recall_at_10"] >= m["recall_at_5"]


def test_vcr_eval_dump(tmp_path):
    cfg = parse_task_config({
        "task": "vcr",
        "folder": str(tmp_path / "run"),
        "eval_only": True,
        "data": {"synthetic": 32, "max_seq_length": 16, "max_boxes": 4,
                 "final_dim": 32},
        "model": TINY_MODEL,
        "train": {"train_batch_size": 8, "eval_batch_size": 8, "log_every": 0},
    })
    state, result = registry.run(cfg)
    path = tmp_path / "run" / "vcr_logits.npy"
    assert path.exists()
    logits = np.load(path)
    assert logits.shape[1] == 4
    assert np.isfinite(logits).all()
