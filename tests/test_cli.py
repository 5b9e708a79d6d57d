"""Config loading + CLI smoke run on the synthetic VQA config."""

import json

import pytest

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


@pytest.mark.slow
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
    # leaderboard dump written after fit (reference vqa_dataset.py:290-302)
    pred_file = tmp_path / "run" / "vqa_predictions.json"
    assert pred_file.exists()
    preds = json.loads(pred_file.read_text())
    assert preds and {"question_id", "answer"} <= set(preds[0])


def test_cli_eval_only_nlvr(tmp_path):
    import dataclasses

    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.config_io import parse_task_config

    cfg = parse_task_config({
        "task": "nlvr2",
        "folder": str(tmp_path / "run"),
        "eval_only": True,
        "data": {"synthetic": 64, "max_seq_length": 12, "max_regions_per_image": 6},
        "model": {
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32, "visual_embedding_dim": 32,
            "dtype": "float32",
        },
        "train": {"train_batch_size": 8, "eval_batch_size": 8, "log_every": 0},
    })
    state, result = registry.run(cfg)
    assert result.epochs_run == 0
    report = tmp_path / "run" / "nlvr2_report.csv"
    assert report.exists()
    assert "official_accuracy" in result.history[0]
    assert "consistency" in result.history[0]


@pytest.mark.slow
def test_cli_restore_orbax_eval_only(tmp_path):
    """Train → checkpoint → fresh eval_only run restoring the checkpoint
    reproduces the trained accuracy (exercises registry._restore orbax)."""
    import dataclasses

    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.config_io import load_task_config

    cfg = load_task_config(
        "configs/vqa_synth.json", overrides={"folder": str(tmp_path / "run")}
    )
    state, result = registry.run(cfg)
    assert result.best_metric > 0.25

    cfg2 = dataclasses.replace(
        cfg,
        folder=str(tmp_path / "eval"),
        eval_only=True,
        restore_checkpoint=str(tmp_path / "run" / "ckpt"),
    )
    state2, result2 = registry.run(cfg2)
    # restored model evaluates at (or above) the stored epoch's quality
    assert result2.best_metric > 0.25, result2.history


@pytest.mark.slow
def test_cli_restore_torch_checkpoint(tmp_path):
    """registry._restore torch branch: a .th file (reference layout) loads
    through load_torch_file → convert → merge and changes the params."""
    import dataclasses

    import jax
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")

    from visualbert_tpu.tasks import registry
    from visualbert_tpu.tools.export_torch import export_state_dict
    from visualbert_tpu.train.trainer import unbox
    from visualbert_tpu.utils.config_io import load_task_config
    from visualbert_tpu.models.encoder import VisualBertModel

    cfg = load_task_config(
        "configs/vqa_synth.json", overrides={"folder": str(tmp_path / "run")}
    )
    # fabricate a reference-layout .th for the same geometry
    model = VisualBertModel(cfg.model)
    import jax.numpy as jnp

    ids = jnp.zeros((1, 4), jnp.int32)
    vis = jnp.zeros((1, 2, cfg.model.visual_embedding_dim), jnp.float32)
    params = unbox(model.init(jax.random.PRNGKey(42), ids, None, None, vis, None, None)["params"])
    sd = export_state_dict({"bert": params}, cfg.model, prefix="bert.")
    th_path = str(tmp_path / "warm.th")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, th_path)

    cfg2 = dataclasses.replace(
        cfg,
        folder=str(tmp_path / "warm_run"),
        eval_only=True,
        restore_checkpoint=th_path,
    )
    state, result = registry.run(cfg2)
    # trunk params equal the fabricated checkpoint exactly
    we = np.asarray(
        jax.device_get(state.params["bert"]["embeddings"]["word_embeddings"]["embedding"])
    )
    np.testing.assert_array_equal(we, sd["bert.embeddings.word_embeddings.weight"])
