"""Config loading + CLI smoke run on the synthetic VQA config."""

import json

import numpy as np

from visualbert_tpu.utils.config_io import (
    load_task_config,
    loads_commented_json,
    parse_task_config,
)


def test_commented_json():
    d = loads_commented_json("""
    // a comment
    {
      "a": 1,  // trailing
      # hash comment
      "b": [1, 2,],
    }
    """)
    assert d == {"a": 1, "b": [1, 2]}


def test_load_real_configs():
    for name in ("vqa_finetune", "coco_pretrain", "nlvr2_finetune", "unsup_pretrain", "vqa_synth"):
        cfg = load_task_config(f"configs/{name}.json")
        assert cfg.task
        assert cfg.optimizer.learning_rate > 0


def test_unknown_key_rejected():
    import pytest

    with pytest.raises(KeyError):
        parse_task_config({"task": "vqa", "bogus_key": 1})


def test_cli_synthetic_vqa(tmp_path, capsys):
    from visualbert_tpu.train_cli import main

    state, result = main([
        "--config", "configs/vqa_synth.json",
        "--folder", str(tmp_path / "run"),
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["task"] == "vqa"
    assert np.isfinite(summary["best_metric"])
    assert summary["best_metric"] > 0.25  # chance = 1/8
    assert (tmp_path / "run" / "ckpt").exists()
