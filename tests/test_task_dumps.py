"""Flickr R@k and VCR logits dumps through the eval_only path."""

import os

import numpy as np
import pytest

from visualbert_tpu.tasks import registry
from visualbert_tpu.utils.config_io import parse_task_config

TINY_MODEL = {
    "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
    "num_attention_heads": 2, "intermediate_size": 64,
    "max_position_embeddings": 32, "visual_embedding_dim": 32,
    "dtype": "float32",
}


@pytest.mark.slow
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


@pytest.mark.slow
def test_vcr_eval_dump(tmp_path):
    cfg = parse_task_config({
        "task": "vcr",
        "folder": str(tmp_path / "run"),
        "eval_only": True,
        "data": {"synthetic": 32, "max_seq_length": 16, "max_boxes": 4,
                 "final_dim": 32, "trunk_blocks": [1, 1, 1],
                 "layer4_blocks": 1, "width_div": 4},
        "model": TINY_MODEL,
        "train": {"train_batch_size": 8, "eval_batch_size": 8, "log_every": 0},
    })
    state, result = registry.run(cfg)
    path = tmp_path / "run" / "vcr_logits.npy"
    assert path.exists()
    logits = np.load(path)
    assert logits.shape[1] == 4
    assert np.isfinite(logits).all()


@pytest.mark.slow
def test_nlvr2_dump_order_independent(tmp_path, monkeypatch):
    """VERDICT r2 item 7: identifiers ride inside batches (example_index),
    so the NLVR2 report is correct even when eval batches arrive in a
    shuffled order."""
    import visualbert_tpu.tasks.registry as reg
    from visualbert_tpu.data.pipeline import Batcher

    cfg_dict = {
        "task": "nlvr2",
        "folder": str(tmp_path / "run"),
        "eval_only": True,
        "data": {"synthetic": 64, "max_seq_length": 12,
                 "max_regions_per_image": 6},
        "model": TINY_MODEL,
        "train": {"train_batch_size": 8, "eval_batch_size": 8, "log_every": 0},
    }

    def read_report(folder):
        path = os.path.join(folder, "nlvr2_report.csv")
        with open(path) as f:
            return sorted(line.strip() for line in f if line.strip())

    state, res1 = registry.run(parse_task_config(cfg_dict))
    rep1 = read_report(cfg_dict["folder"])
    acc1 = res1.history[0]["official_accuracy"]

    # shuffle the eval iteration order
    orig_epoch = Batcher.epoch

    def shuffled_epoch(self, epoch=0):
        batches = list(orig_epoch(self, epoch))
        if not getattr(self, "shuffle", True):  # only perturb eval batchers
            rng = np.random.RandomState(0)
            rng.shuffle(batches)
        return iter(batches)

    monkeypatch.setattr(Batcher, "epoch", shuffled_epoch)
    cfg_dict["folder"] = str(tmp_path / "run2")
    state, res2 = registry.run(parse_task_config(cfg_dict))
    rep2 = read_report(cfg_dict["folder"])
    assert rep1 == rep2
    assert res2.history[0]["official_accuracy"] == acc1
