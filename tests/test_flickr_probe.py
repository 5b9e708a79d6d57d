"""flickr_probe registry task: the ACL-2020 attention-probing pipeline as a
config-reachable eval path (reference output_attention_weights,
modeling.py:1316-1324,1430-1444)."""

import json
import os

import numpy as np
import pytest

from visualbert_tpu.tasks import registry
from visualbert_tpu.utils.config_io import parse_task_config

MODEL = {
    "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 3,
    "num_attention_heads": 2, "intermediate_size": 64,
    "max_position_embeddings": 64, "visual_embedding_dim": 16,
    "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
    "dtype": "float32",
}


def _cfg(tmp_path, n=20, batch=8, **model_extra):
    return parse_task_config({
        "task": "flickr_probe",
        "folder": str(tmp_path / "probe"),
        "data": {"synthetic": n, "max_seq_length": 12, "max_regions": 8,
                 "max_entities": 4},
        "model": {**MODEL, **model_extra},
        "optimizer": {"learning_rate": 1e-3, "schedule": None, "t_total": -1},
        "train": {"eval_batch_size": batch, "log_every": 0,
                  "mesh_shape": [8, 1]},
    })


def test_flickr_probe_task(tmp_path):
    """Runs over a non-dividing synthetic split (20 examples, batch 8 →
    pad_final duplicates excluded), writes per-layer accuracies that match a
    direct whole-split computation."""
    cfg = _cfg(tmp_path)
    state, result = registry.run(cfg)

    path = os.path.join(cfg.folder, "flickr_probe.json")
    assert os.path.exists(path)
    with open(path) as f:
        dumped = json.load(f)
    assert dumped["entities"] > 0
    layer_keys = [k for k in dumped if k.startswith("layer_")]
    assert len(layer_keys) == MODEL["num_hidden_layers"]
    assert all(0.0 <= dumped[k] <= 1.0 for k in layer_keys)
    assert result.best_metric == pytest.approx(
        max(dumped[k] for k in layer_keys)
    )

    # exactness: recompute over the whole split in ONE batch
    import jax

    from visualbert_tpu.data.datasets import flickr as flickr_ds
    from visualbert_tpu.data.pipeline import default_collate
    from visualbert_tpu.data.tokenization import BertTokenizer
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.tasks.probing import grounding_accuracy_by_layer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "?"] + [
        f"w{i}" for i in range(100)
    ]
    tok = BertTokenizer({w: i for i, w in enumerate(words)})
    ann, feats = flickr_ds.make_synthetic(20, tok, feat_dim=16)
    ds = flickr_ds.Flickr30kDataset(ann, feats, tok, max_seq_length=12,
                                    max_regions=8, max_entities=4)
    full = default_collate([ds[(i, None)] for i in range(20)])
    model = VisualBertForTask(cfg.model, head_type="flickr")
    out = jax.device_get(model.apply(
        {"params": state.params}, jax.tree.map(np.asarray, full),
        deterministic=True, output_attention_probs=True,
    ))
    expected = grounding_accuracy_by_layer(
        np.asarray(out["attention_weights"], np.float32),
        full["flickr_position"], full["label"], text_len=12,
    )
    for l, acc in expected.items():
        assert dumped[f"layer_{l}"] == pytest.approx(acc, abs=1e-6)


def test_flickr_probe_scan_layers(tmp_path):
    """The scanned-encoder layout exports stacked per-layer probs too."""
    cfg = _cfg(tmp_path, n=8, batch=8, scan_layers=True)
    _, result = registry.run(cfg)
    with open(os.path.join(cfg.folder, "flickr_probe.json")) as f:
        dumped = json.load(f)
    assert len([k for k in dumped if k.startswith("layer_")]) == 3
    assert np.isfinite(result.best_metric)
