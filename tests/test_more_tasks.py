"""unsup_vqa task e2e, distributed helpers, file cache."""

import numpy as np
import pytest

from visualbert_tpu.tasks import registry
from visualbert_tpu.utils.config_io import parse_task_config


@pytest.mark.slow
def test_unsup_vqa_task(tmp_path):
    cfg = parse_task_config({
        "task": "unsup_vqa",
        "folder": str(tmp_path / "run"),
        "data": {"synthetic": 160, "n_answers": 8, "max_seq_length": 10, "n_regions": 6},
        "model": {
            "vocab_size": 512, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
            "max_position_embeddings": 64, "visual_embedding_dim": 16,
            "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            "dtype": "float32",
        },
        "optimizer": {"learning_rate": 5e-4, "schedule": "warmup_linear",
                      "warmup": 0.1, "t_total": 120},
        "train": {"train_batch_size": 16, "eval_batch_size": 16,
                  "num_train_epochs": 15, "log_every": 0},
    })
    state, result = registry.run(cfg)
    assert np.isfinite(result.best_metric)
    assert result.best_metric > 0.3, result.history  # chance 1/8


def test_local_batch_slice_single_host():
    from visualbert_tpu.parallel.distributed import initialize_distributed, local_batch_slice

    assert initialize_distributed() is False  # no coordinator env set
    start, size = local_batch_slice(32)
    assert (start, size) == (0, 32)


def test_file_cache_local(tmp_path):
    from visualbert_tpu.utils.file_cache import cached_path

    p = tmp_path / "x.txt"
    p.write_text("hi")
    assert cached_path(str(p)) == str(p)
    assert cached_path(f"file://{p}") == str(p)
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.txt"))
    with pytest.raises(ValueError):
        cached_path("ftp://nope/x")


@pytest.mark.slow
def test_coco_pretrain_task_smoke(tmp_path):
    cfg = parse_task_config({
        "task": "coco_pretrain",
        "folder": str(tmp_path / "run"),
        "data": {"synthetic": 32, "max_seq_length": 16, "max_regions": 6},
        "model": {
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32, "visual_embedding_dim": 32,
            "dtype": "float32",
        },
        "optimizer": {"learning_rate": 1e-3, "schedule": "none", "t_total": -1},
        "train": {"train_batch_size": 8, "num_train_epochs": 1, "log_every": 0},
    })
    state, result = registry.run(cfg)
    assert result.epochs_run == 1
    assert np.isfinite(result.history[0]["train_loss"])


def test_text_pretrain_task(tmp_path):
    cfg = parse_task_config({
        "task": "text_pretrain",
        "folder": str(tmp_path / "run"),
        "data": {"synthetic": 64, "max_seq_length": 20},
        "model": {
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32, "visual_embedding_dim": 32,
            "dtype": "float32",
        },
        "optimizer": {"learning_rate": 1e-3, "schedule": "none", "t_total": -1},
        "train": {"train_batch_size": 8, "num_train_epochs": 2, "log_every": 0,
                  "steps_per_dispatch": 2},
    })
    state, result = registry.run(cfg)
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])


@pytest.mark.slow
def test_unsup_pretrain_hybrid_task(tmp_path):
    """unsup_pretrain through the registry with a packed text corpus mixed in
    (hybrid single-source batches, two compiled shapes). steps_per_dispatch=2
    exercises the K-step dispatcher's structure-change flush: text-only and
    V&L batches cannot stack, so groups flush at every source switch."""
    from visualbert_tpu.data.text_corpus import PackedCorpus
    from visualbert_tpu.data.tokenization import BertTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "?"] + [
        f"w{i}" for i in range(100)
    ]
    tok = BertTokenizer({w: i for i, w in enumerate(words)})
    passages = [[f"w{i} w{i+1} w{i+2} w{i+3}"] for i in range(40)]
    corpus_path = str(tmp_path / "corpus.npz")
    PackedCorpus.build(passages, tok).save(corpus_path)

    cfg = parse_task_config({
        "task": "unsup_pretrain",
        "folder": str(tmp_path / "run"),
        "data": {
            "synthetic": 48, "max_seq_length": 12, "n_regions": 6,
            "text_corpus": corpus_path, "text_ratio": 1.0,
            "text_seq_length": 12,
        },
        "model": {
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32, "visual_embedding_dim": 16,
            "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            "dtype": "float32",
        },
        "optimizer": {"learning_rate": 5e-4, "schedule": "none", "t_total": -1},
        "train": {"train_batch_size": 8, "num_train_epochs": 2, "log_every": 0,
                  "steps_per_dispatch": 2},
    })
    state, result = registry.run(cfg)
    assert result.epochs_run == 2
    assert np.isfinite(result.history[-1]["train_loss"])
    # both V&L and text-only losses were seen
    keys = set()
    for h in result.history:
        keys.update(h)
    assert "train_masked_lm_loss" in keys
    assert "train_obj_loss" in keys  # V&L batches contributed


@pytest.mark.slow
def test_vqa_advanced_task(tmp_path):
    """Answer-as-MLM task (reference modeling.py:1527-1554): learns above
    chance on the synthetic set and dumps decoded answers."""
    import json as _json

    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.config_io import parse_task_config

    folder = str(tmp_path / "run")
    cfg = parse_task_config({
        "task": "vqa_advanced",
        "folder": folder,
        "data": {"synthetic": 256, "max_seq_length": 12, "max_regions": 6,
                 "n_answers": 4},
        "model": {"vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
                  "num_attention_heads": 2, "intermediate_size": 64,
                  "max_position_embeddings": 32, "visual_embedding_dim": 32,
                  "dtype": "float32"},
        "optimizer": {"learning_rate": 3e-3, "schedule": "warmup_linear",
                      "warmup": 0.1, "t_total": 400},
        "train": {"train_batch_size": 32, "eval_batch_size": 32,
                  "num_train_epochs": 10, "log_every": 0},
    })
    state, result = registry.run(cfg)
    assert result.best_metric > 0.3  # chance = 1/4
    preds = _json.load(open(f"{folder}/vqa_advanced_predictions.json"))
    assert preds and {"question_id", "answer"} <= set(preds[0])


@pytest.mark.slow
def test_vcr_coco_pretrain_task(tmp_path):
    """COCO r2c detector-path pretraining stage (reference
    coco_dataset.py:235-340): raw images + masks through SimpleDetector into
    the MLM+alignment objective."""
    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.config_io import parse_task_config

    cfg = parse_task_config({
        "task": "vcr_coco_pretrain",
        "folder": str(tmp_path / "run"),
        "data": {"synthetic": 32, "max_seq_length": 16, "max_boxes": 4,
                 "trunk_blocks": [1, 1, 1], "layer4_blocks": 1,
                 "width_div": 4},
        "model": {"vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
                  "num_attention_heads": 2, "intermediate_size": 64,
                  "max_position_embeddings": 32, "visual_embedding_dim": 512,
                  "dtype": "float32"},
        "optimizer": {"learning_rate": 3e-4, "schedule": "warmup_linear",
                      "warmup": 0.1, "t_total": 100},
        "train": {"train_batch_size": 8, "eval_batch_size": 8,
                  "num_train_epochs": 1, "log_every": 0},
    })
    state, result = registry.run(cfg)
    assert result.epochs_run == 1
    assert np.isfinite(result.best_metric)
    h = result.history[0]
    # all three objective parts present
    assert {"val_masked_lm_loss", "val_next_sentence_loss",
            "val_cnn_regularization_loss"} <= set(h)


def test_expand_coco():
    from visualbert_tpu.data.datasets.coco import expand_coco

    train = [{"image_id": f"t{i}"} for i in range(5)]
    val = [{"image_id": f"v{i}"} for i in range(6)]
    mini = ["v1", "v4"]
    new_train, new_val = expand_coco(train, val, mini)
    assert len(new_train) == 5 + 4          # val minus minival appended
    assert {a["image_id"] for a in new_val} == {"v1", "v4"}
    new_train2, _ = expand_coco(train, val, mini, exclude_minival=False)
    assert len(new_train2) == 11


def test_detector_window_box_uses_content_extent(tmp_path):
    """A non-square image padded to the square canvas must get a full-image
    window box covering the CONTENT rectangle, not the padded canvas
    (reference coco_dataset.py:276-279)."""
    import json as _json

    import numpy as np
    from PIL import Image

    from visualbert_tpu.data.datasets.coco import CocoDetectorDataset
    from visualbert_tpu.data.tokenization import BertTokenizer
    from visualbert_tpu.utils.images import ImageFolderStore

    folder = tmp_path / "imgs"
    folder.mkdir()
    # 200x100 landscape image → resized to 64x32 at target 64 → 32 rows pad
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (100, 200, 3), np.uint8)
    ).save(folder / "img0.jpg")
    (folder / "img0.json").write_text(_json.dumps({
        "boxes": [[10, 10, 60, 40]], "names": ["person"],
    }))

    store = ImageFolderStore(str(folder), target=64)
    got = store.get("img0")
    assert got["image"].shape == (64, 64, 3)
    assert int(got["height"]) == 32 and int(got["width"]) == 64

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b"]
    tok = BertTokenizer({w: i for i, w in enumerate(vocab)})
    ds = CocoDetectorDataset(
        [{"image_id": "img0", "captions": ["a b a"]}], store, tok,
        max_seq_length=12, max_boxes=4, two_sentence=False,
        false_caption_ratio=0.0,
    )
    s = ds[(0, np.random.default_rng(0))]
    window = s["boxes"][0]
    np.testing.assert_allclose(window, [0.0, 0.0, 63.0, 31.0])


@pytest.mark.slow
def test_unsup_pretrain_qa_cotraining(tmp_path):
    """VERDICT r2 item 6: task_qa with an AnswerTable wired through the
    registry — string answers relabeled to ids, qa_loss trained, and
    qa_accuracy reported (reference LXMERTEvaluator, lxmert_data.py:892-946)."""
    import json as _json

    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.config_io import parse_task_config

    table_path = str(tmp_path / "answers.json")
    with open(table_path, "w") as f:
        _json.dump([f"a{i}" for i in range(4)], f)

    cfg = parse_task_config({
        "task": "unsup_pretrain",
        "folder": str(tmp_path / "run"),
        "data": {
            "synthetic": 64, "synthetic_answers": 4, "max_seq_length": 12,
            "n_regions": 6, "task_qa": True, "answer_table": table_path,
            "matched_prob": 0.0,  # always matched: every row carries its answer
        },
        "model": {
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32, "visual_embedding_dim": 16,
            "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            "dtype": "float32",
        },
        "optimizer": {"learning_rate": 1e-3, "schedule": "none", "t_total": -1},
        "train": {"train_batch_size": 8, "num_train_epochs": 3, "log_every": 0},
    })
    state, result = registry.run(cfg)
    hist = result.history[-1]
    assert "train_qa_loss" in hist and np.isfinite(hist["train_qa_loss"])
    assert "train_qa_accuracy" in hist
    # learnable mapping (first object's channel signature → answer id):
    # accuracy must beat 1/4 chance by the last epoch
    assert hist["train_qa_accuracy"] > 0.3, result.history


def test_unsup_pretrain_qa_without_table_errors(tmp_path):
    """task_qa + string answers without data.answer_table must error loudly:
    silent coercion to ignore_index trained QA as a no-op."""
    from visualbert_tpu.tasks import registry
    from visualbert_tpu.utils.config_io import parse_task_config

    cfg = parse_task_config({
        "task": "unsup_pretrain",
        "folder": str(tmp_path / "run"),
        "data": {
            "synthetic": 16, "synthetic_answers": 4, "max_seq_length": 12,
            "n_regions": 6, "task_qa": True,  # no answer_table
        },
        "model": {
            "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32, "visual_embedding_dim": 16,
            "dtype": "float32",
        },
        "optimizer": {"learning_rate": 1e-3, "schedule": "none", "t_total": -1},
        "train": {"train_batch_size": 8, "num_train_epochs": 1, "log_every": 0},
    })
    with pytest.raises(ValueError, match="answer_table"):
        registry.run(cfg)
