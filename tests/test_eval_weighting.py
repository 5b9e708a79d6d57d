"""Eval-metric integrity on non-dividing splits: Batcher(pad_final=True)
emits example_weight (0.0 on tail-pad duplicate rows), model heads compute
weighted metrics, and evaluate()/the fit-loop eval weight by real counts —
so the reported split metric equals the exact hand-computed value.

The reference never pads eval batches (batch-max AllenNLP padding,
train.py:292-325) so it has no duplicate bias to fix; this guards the
TPU-native static-shape design against one."""

import os

import jax
import numpy as np
import pytest

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.data.datasets import nlvr2 as nlvr_ds
from visualbert_tpu.data.pipeline import Batcher
from visualbert_tpu.data.tokenization import BertTokenizer
from visualbert_tpu.models.visualbert import VisualBertForTask
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.trainer import Trainer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "?"] + [
    f"w{i}" for i in range(60)
]
FEAT_DIM = 16


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer({w: i for i, w in enumerate(VOCAB)})


def test_batcher_pad_final_emits_example_weight():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, args):
            i, _ = args
            return {"x": np.int64(i)}

    b = Batcher(DS(), 4, shuffle=False, drop_last=False, pad_final=True)
    batches = list(b.epoch(0))
    assert len(batches) == 3
    assert all("example_weight" in batch for batch in batches)
    np.testing.assert_array_equal(batches[0]["example_weight"], [1, 1, 1, 1])
    np.testing.assert_array_equal(batches[2]["example_weight"], [1, 1, 0, 0])
    # duplicated rows repeat the real tail indices
    np.testing.assert_array_equal(batches[2]["x"], [8, 9, 8, 9])


def test_batcher_pad_final_weight_threaded():
    """The fill-into-buffer collate path (num_workers>0) emits the same
    weights as the sequential path."""

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, args):
            i, _ = args
            return {"x": np.int64(i)}

    b = Batcher(DS(), 4, shuffle=False, drop_last=False, pad_final=True,
                num_workers=2)
    batches = list(b.epoch(0))
    np.testing.assert_array_equal(batches[1]["example_weight"], [1, 1, 1, 0])
    np.testing.assert_array_equal(batches[1]["x"], [4, 5, 6, 4])


def _nlvr_setup(tok, n=6, batch=4):
    ann, feats = nlvr_ds.make_synthetic(n, tok, feat_dim=FEAT_DIM)
    ds = nlvr_ds.NLVR2Dataset(
        ann, feats, tok, max_seq_length=12, max_regions_per_image=6
    )
    cfg = VisualBertConfig.tiny(
        vocab_size=len(VOCAB), visual_embedding_dim=FEAT_DIM,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = VisualBertForTask(cfg, head_type="nlvr")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=1e-3, schedule=None, t_total=-1),
        train_config=TrainConfig(num_train_epochs=1, log_every=0),
        mesh=create_mesh((1, 1), devices=jax.devices()[:1]),
    )
    train_b = Batcher(ds, batch, shuffle=False, seed=0, drop_last=True)
    example = next(iter(train_b.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    return ds, trainer, state


def _exact_split_metrics(trainer, state, ds, n):
    """Hand-computed split accuracy/loss: one whole-split batch, per-example
    correctness averaged on the host."""
    from visualbert_tpu.data.pipeline import default_collate

    full = default_collate([ds[(i, None)] for i in range(n)])
    out = jax.device_get(
        trainer.eval_step_fn()(state.params, trainer.shard_batch(full))
    )
    correct = (np.argmax(out["logits"], -1) == full["label"]).astype(np.float64)
    return float(correct.mean())


def test_evaluate_exact_on_nondividing_split(tok, tmp_path):
    """6 examples, eval batch 4 → final batch carries 2 duplicates; the
    reported accuracy must equal the exact 6-example value (pre-fix the
    duplicates were double-counted: weight 8 instead of 6)."""
    from visualbert_tpu.tasks.registry import evaluate

    n, batch = 6, 4
    ds, trainer, state = _nlvr_setup(tok, n=n, batch=batch)
    eval_b = Batcher(ds, batch, shuffle=False, seed=0, drop_last=False,
                     pad_final=True)
    metrics = evaluate(trainer, state, eval_b, None, str(tmp_path))
    expected = _exact_split_metrics(trainer, state, ds, n)
    assert metrics["accuracy"] == pytest.approx(expected, abs=1e-6)


def test_fit_loop_eval_exact_on_nondividing_split(tok, tmp_path):
    """The in-loop per-epoch eval (train/loop.py) applies the same
    weighting: with one epoch, val_accuracy of epoch 0 must equal the exact
    value computed from the returned (post-epoch) state."""
    from visualbert_tpu.train.loop import fit

    n, batch = 6, 4
    ds, trainer, state = _nlvr_setup(tok, n=n, batch=batch)
    train_b = Batcher(ds, batch, shuffle=False, seed=0, drop_last=True)
    eval_b = Batcher(ds, batch, shuffle=False, seed=0, drop_last=False,
                     pad_final=True)
    state, result = fit(
        trainer, state,
        train_data=lambda e: train_b.epoch(e),
        eval_data=lambda: eval_b.epoch(0),
    )
    expected = _exact_split_metrics(trainer, state, ds, n)
    assert result.history[0]["val_accuracy"] == pytest.approx(expected, abs=1e-6)
