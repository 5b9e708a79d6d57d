"""VCR path: detection-tag rendering, box↔token alignment, and the
end-to-end detector+BERT multichoice model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.data.datasets import vcr as vcr_ds
from visualbert_tpu.data.pipeline import Batcher
from visualbert_tpu.data.tokenization import BertTokenizer
from visualbert_tpu.models.vcr import VisualBertDetectorModel
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.trainer import Trainer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "person", "car", "and"] + [
    f"w{i}" for i in range(40)
]


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer({w: i for i, w in enumerate(VOCAB)})


def test_render_tokens(tok):
    objects = ["person", "car", "person"]
    sub, align = vcr_ds.render_tokens(
        ["w1", [0, 2], "w2", [1]], objects, tok
    )
    # [0,2] renders "name and name"; person names are outside the tiny vocab
    # so they wordpiece to [UNK] — alignment must still track object indices
    assert align[0] == []                    # w1
    assert [0] in align and [2] in align and [1] in align
    and_positions = [i for i, s in enumerate(sub) if s == "and"]
    assert len(and_positions) == 1
    # non-person object renders its class name
    assert "car" in sub
    assert align[sub.index("car")] == [1]


def test_render_tokens_randomized_names(tok):
    """With a seeded rng, person names are drawn uniformly at first mention
    (reference r2c diversity; deterministic per (seed, epoch, index)), stay
    consistent within an example via name_map, and differ across examples."""
    names = vcr_ds.GENDER_NEUTRAL_NAMES
    big_tok = BertTokenizer(
        {w: i for i, w in enumerate(VOCAB + names)}
    )
    objects = ["person", "person"]

    seen_first = []
    for trial in range(300):
        rng = np.random.default_rng(trial)
        name_map = {}
        sub, _ = vcr_ds.render_tokens(
            ["w1", [0], [1], [0]], objects, big_tok, rng=rng, name_map=name_map
        )
        rendered = [s for s in sub if s in names]
        assert len(rendered) == 3
        # re-mention of person 0 reuses its first name
        assert rendered[0] == rendered[2] == name_map[0]
        assert rendered[1] == name_map[1]
        seen_first.append(rendered[0])
    # every name appears; roughly uniform (300 draws over 13 names)
    counts = {n: seen_first.count(n) for n in names}
    assert all(c > 0 for c in counts.values())
    assert max(counts.values()) < 3 * 300 / len(names)

    # reproducibility: same rng seed → same names
    a, _ = vcr_ds.render_tokens(
        [[0], [1]], objects, big_tok, rng=np.random.default_rng(7)
    )
    b, _ = vcr_ds.render_tokens(
        [[0], [1]], objects, big_tok, rng=np.random.default_rng(7)
    )
    assert a == b

    # rng=None keeps the deterministic object-index cycle
    c, _ = vcr_ds.render_tokens([[0]], objects, big_tok)
    assert c == [names[0]]


def test_vcr_dataset_names_consistent_across_choices(tok):
    """VCRDataset threads ONE name_map through question + all 4 choices."""
    names = vcr_ds.GENDER_NEUTRAL_NAMES
    big_tok = BertTokenizer({w: i for i, w in enumerate(VOCAB + names)})
    ann, images = vcr_ds.make_synthetic(2, big_tok)
    # force a person mention in question and every choice
    ann[0]["objects"] = ["person"]
    ann[0]["question"] = ["w1", [0]]
    ann[0]["choices"] = [[[0], "w2"] for _ in range(4)]
    ds = vcr_ds.VCRDataset(ann, images, big_tok, max_seq_length=16, max_boxes=5)
    s = ds[(0, np.random.default_rng(5))]
    ids = s["input_ids"]
    name_ids = {big_tok.vocab[n] for n in names}
    per_choice = [
        {int(t) for t in ids[c] if int(t) in name_ids} for c in range(4)
    ]
    assert all(pc == per_choice[0] and len(pc) == 1 for pc in per_choice)


def test_vcr_dataset_shapes(tok):
    ann, images = vcr_ds.make_synthetic(4, tok)
    ds = vcr_ds.VCRDataset(ann, images, tok, max_seq_length=24, max_boxes=5)
    sample = ds[(0, np.random.default_rng(0))]
    assert sample["input_ids"].shape == (4, 24)
    assert sample["image_text_alignment"].shape == (4, 5, 3)
    assert sample["boxes"].shape == (5, 4)
    assert sample["images"].shape == (32, 32, 3)
    # alignment points at real token positions
    a = sample["image_text_alignment"]
    assert (a >= -1).all() and (a < 24).all()
    assert (a >= 0).any()


@pytest.mark.slow
def test_vcr_end_to_end_train(tok):
    cfg = VisualBertConfig.tiny(
        visual_embedding_dim=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ann, images = vcr_ds.make_synthetic(32, tok)
    ds = vcr_ds.VCRDataset(ann, images, tok, max_seq_length=20, max_boxes=4)
    model = VisualBertDetectorModel(cfg, final_dim=64, num_choices=4,
                                    trunk_blocks=(1, 1, 1), layer4_blocks=1,
                                    width_div=4)
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=5e-4, schedule=None, t_total=-1),
        train_config=TrainConfig(num_train_epochs=2, log_every=0),
        mesh=create_mesh((8, 1)),
    )
    batcher = Batcher(ds, 8, seed=1)
    example = next(iter(batcher.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    step = trainer.train_step_fn()
    key = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(6):
        for batch in batcher.epoch(epoch):
            state, m = step(state, trainer.shard_batch(batch), key)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert float(m["cnn_regularization_loss"]) > 0


@pytest.mark.slow
def test_vcr_pretrain_dataset(tok):
    from visualbert_tpu.models.vcr import VisualBertDetectorModel

    ann, images = vcr_ds.make_synthetic(4, tok)
    ds = vcr_ds.VCRPretrainDataset(ann, images, tok, max_seq_length=20, max_boxes=4)
    assert len(ds) == 16  # 4 items × 4 choices (complete_shuffle ×4)
    s = ds[(5, np.random.default_rng(0))]
    assert s["input_ids"].shape == (1, 20)
    assert s["masked_lm_labels"].shape == (1, 20)
    assert s["mlm_positions"].shape == (1, 16)

    cfg = VisualBertConfig.tiny(
        visual_embedding_dim=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = VisualBertDetectorModel(cfg, head_type="pretraining",
                                    final_dim=64, num_choices=1,
                                    trunk_blocks=(1, 1, 1), layer4_blocks=1,
                                    width_div=4)
    from visualbert_tpu.data.pipeline import Batcher

    batch = next(iter(Batcher(ds, 8, seed=0).epoch(0)))
    import jax
    import jax.numpy as jnp

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    # jit: eager init/apply dispatch this graph op-by-op (seconds); the
    # jitted compiles persist in the suite's compilation cache
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, jb)
    out = jax.jit(model.apply)(v, jb)
    assert np.isfinite(float(out["loss"]))
    assert "masked_lm_loss" in out
