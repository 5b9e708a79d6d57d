"""Unsupervised stack: three-stream model, hybrid text/V&L batching, packed
corpus, tags, answer-table surgery — trained e2e on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.data.answer_table import AnswerTable, remap_answer_head
from visualbert_tpu.data.datasets import unsup_pretrain as up
from visualbert_tpu.data.hybrid import HybridBatcher
from visualbert_tpu.data.pipeline import Batcher
from visualbert_tpu.data.symbolic import SymbolicVocab, initialize_symbolic_embedding
from visualbert_tpu.data.tags import build_tags, mask_tags
from visualbert_tpu.data.text_corpus import PackedCorpus, TextOnlyDataset
from visualbert_tpu.data.tokenization import BertTokenizer
from visualbert_tpu.models.unsupervised import (
    UnsupervisedConfig,
    UnsupervisedVisualBert,
    UnsupervisedVQAModel,
)
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.trainer import Trainer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(40)]
FEAT_DIM = 16


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer({w: i for i, w in enumerate(VOCAB)})


@pytest.fixture(scope="module")
def sym():
    return SymbolicVocab([f"obj{i}" for i in range(20)], [f"attr{i}" for i in range(8)])


def make_ucfg(sym, **kw):
    bert = VisualBertConfig.tiny(
        vocab_size=len(VOCAB), hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    defaults = dict(
        bert=bert, visual_feat_dim=FEAT_DIM, obj_id_num=sym.n_obj,
        attr_id_num=sym.n_attr, symbolic_vocab_size=sym.size, num_answers=8,
    )
    defaults.update(kw)
    return UnsupervisedConfig(**defaults)


def test_symbolic_vocab_layout(sym, tok):
    assert sym.size == 20 + 8 + 3
    assert sym.obj_to_symbolic(3) == 3
    assert sym.attr_to_symbolic(2) == 22
    assert sym.symbolic_to_word(sym.mask_id) == "[MASK]"
    subs = sym.subword_lists(tok)
    assert len(subs) == sym.size
    emb = initialize_symbolic_embedding(np.random.randn(len(VOCAB), 8), subs)
    assert emb.shape == (sym.size, 8)


def test_tags_masking(sym):
    rng = np.random.default_rng(0)
    obj = np.arange(10) % sym.n_obj
    boxes = np.random.rand(10, 4).astype(np.float32)
    tags, tb = build_tags(obj, np.zeros(10, np.int64), boxes, sym, rng, insert_attr_ratio=0.0)
    assert (tags == obj).all()
    fm = np.ones(10, np.float32)
    corrupted, objective = mask_tags(tags, sym, rng, 0.15, feature_mask=fm,
                                     tag_joint_mask_ratio=1.0)
    # full coupling: every region's tag is predicted
    assert (objective == tags).all()


def test_packed_corpus_roundtrip(tok, tmp_path):
    passages = [["w1 w2 w3", "w4 w5"], ["w6 w7 w8 w9"]]
    corpus = PackedCorpus.build(passages, tok)
    assert corpus.n_passages == 2 and corpus.n_sentences == 3
    p = corpus.piece(0, 0, 10)
    assert len(p) == 5
    corpus.save(str(tmp_path / "c.npz"))
    loaded = PackedCorpus.load(str(tmp_path / "c.npz"))
    np.testing.assert_array_equal(loaded.tokens, corpus.tokens)

    ds = TextOnlyDataset(corpus, tok, max_seq_length=12)
    sample = ds[(0, np.random.default_rng(0))]
    assert sample["input_ids"].shape == (12,)
    assert sample["input_ids"][0] == tok.cls_id


def test_hybrid_batcher_single_source_batches(tok, sym):
    ann, feats = up.make_synthetic(40, tok, sym, feat_dim=FEAT_DIM)
    vl = Batcher(up.UnsupervisedPretrainDataset(
        ann, feats, tok, sym, max_seq_length=12, n_regions=6), 8, seed=0)
    corpus = PackedCorpus.build([[f"w{i} w{i+1} w{i+2}"] for i in range(20)], tok)
    txt = Batcher(TextOnlyDataset(corpus, tok, max_seq_length=12), 8, seed=0)
    hybrid = HybridBatcher([vl, txt], upsample_ratios=[1.0, 2.0], seed=0)
    kinds = []
    for batch in hybrid.epoch(0):
        kinds.append("vl" if "visual_feats" in batch else "txt")
        for v in batch.values():
            assert len(v) == 8
    assert "vl" in kinds and "txt" in kinds
    assert len(kinds) == hybrid.num_batches()


@pytest.mark.slow
def test_pretrain_end_to_end(tok, sym):
    ann, feats = up.make_synthetic(96, tok, sym, feat_dim=FEAT_DIM)
    ds = up.UnsupervisedPretrainDataset(ann, feats, tok, sym,
                                        max_seq_length=12, n_regions=6)
    model = UnsupervisedVisualBert(make_ucfg(sym))
    epochs, spe = 12, 12
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=5e-4, schedule="warmup_linear",
                                   warmup=0.1, t_total=epochs * spe),
        train_config=TrainConfig(num_train_epochs=epochs, log_every=0),
        mesh=create_mesh((8, 1)),
    )
    b = Batcher(ds, 8, seed=1)
    example = next(iter(b.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    step = trainer.train_step_fn()
    key = jax.random.PRNGKey(1)
    epoch_means = []
    for epoch in range(epochs):
        ls = []
        for batch in b.epoch(epoch):
            state, m = step(state, trainer.shard_batch(batch), key)
            ls.append(float(m["loss"]))
        epoch_means.append(np.mean(ls))
    assert np.isfinite(epoch_means).all()
    assert epoch_means[-1] < epoch_means[0] * 0.97, epoch_means
    for k in ("masked_lm_loss", "matched_loss", "obj_loss", "attr_loss",
              "feat_loss", "masked_tag_loss"):
        assert k in m, sorted(m)


@pytest.mark.slow
def test_vqa_finetune_model(tok, sym):
    model = UnsupervisedVQAModel(make_ucfg(sym))
    rng = np.random.default_rng(0)
    B, T, N = 4, 10, 6
    target = np.zeros((B, 8), np.float32)
    target[np.arange(B), rng.integers(0, 8, B)] = 1.0
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, len(VOCAB), (B, T)), jnp.int32),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "visual_feats": jnp.asarray(rng.normal(size=(B, N, FEAT_DIM)), jnp.float32),
        "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        "visual_feats_mask": jnp.ones((B, N), jnp.int32),
        "visual_tags": jnp.asarray(rng.integers(0, sym.size, (B, N)), jnp.int32),
        "visual_tags_box": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        "visual_tags_mask": jnp.ones((B, N), jnp.int32),
        "target": jnp.asarray(target),
    }
    v = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(v, batch)
    assert out["logits"].shape == (B, 8)
    assert np.isfinite(float(out["loss"]))


def test_answer_table_surgery():
    src = AnswerTable(["yes", "no", "cat", "dog"])
    dst = AnswerTable(["dog", "bird", "yes"])
    k = np.arange(8, dtype=np.float32).reshape(2, 4)
    b = np.arange(4, dtype=np.float32)
    fresh_k = np.zeros((2, 3), np.float32)
    fresh_b = np.zeros(3, np.float32)
    out = remap_answer_head(k, b, src, dst, fresh_k, fresh_b)
    assert out["n_copied"] == 2
    np.testing.assert_array_equal(out["kernel"][:, 0], k[:, 3])  # dog
    np.testing.assert_array_equal(out["kernel"][:, 2], k[:, 0])  # yes
    assert (out["kernel"][:, 1] == 0).all()                      # bird fresh


@pytest.mark.slow
def test_image_only_batch(tok, sym):
    """Image-only hybrid batches (no text stream) — reference
    lxmert_pretrain.py:86-173 image_only_splits."""
    model = UnsupervisedVisualBert(make_ucfg(sym))
    rng = np.random.default_rng(0)
    B, N = 4, 6
    feat_mask = (rng.random((B, N)) < 0.5).astype(np.float32)
    batch = {
        "visual_feats": jnp.asarray(rng.normal(size=(B, N, FEAT_DIM)), jnp.float32),
        "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        "visual_feats_mask": jnp.ones((B, N), jnp.int32),
        "visual_tags": jnp.asarray(rng.integers(0, sym.size, (B, N)), jnp.int32),
        "visual_tags_box": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        "visual_tags_mask": jnp.ones((B, N), jnp.int32),
        "visual_tags_objective": jnp.asarray(rng.integers(-1, sym.size, (B, N)), jnp.int32),
        "obj_labels": jnp.asarray(rng.integers(0, sym.n_obj, (B, N)), jnp.int32),
        "obj_conf": jnp.asarray(feat_mask),
        "attr_labels": jnp.asarray(rng.integers(0, sym.n_attr, (B, N)), jnp.int32),
        "attr_conf": jnp.asarray(feat_mask * 0.5),
        "feat_target": jnp.asarray(rng.normal(size=(B, N, FEAT_DIM)), jnp.float32),
        "feat_mask": jnp.asarray(feat_mask),
    }
    v = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(v, batch)
    assert np.isfinite(float(out["loss"]))
    assert "masked_lm_loss" not in out and "matched_loss" not in out
    assert "obj_loss" in out and "masked_tag_loss" in out


@pytest.mark.slow
def test_text_only_batch(tok, sym):
    """Text-only hybrid batches (no visual streams) — reference
    text_only_splits with GeneralCorpusNP."""
    model = UnsupervisedVisualBert(make_ucfg(sym))
    rng = np.random.default_rng(0)
    B, T = 4, 10
    lm = np.full((B, T), -1, np.int32)
    lm[:, 3] = rng.integers(0, len(VOCAB), B)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, len(VOCAB), (B, T)), jnp.int32),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "masked_lm_labels": jnp.asarray(lm),
    }
    v = model.init({"params": jax.random.PRNGKey(0)}, batch)
    out = model.apply(v, batch)
    assert np.isfinite(float(out["loss"]))
    assert "masked_lm_loss" in out
    assert "obj_loss" not in out


def test_wwm_groups_continuations(tok):
    """True WWM: '##' continuation pieces share their word's mask decision;
    labels cover every piece of a masked word."""
    from visualbert_tpu.data.masking import MLM_IGNORE, random_word_wwm_pieces

    # craft a piece stream with a 3-piece word in the middle
    pieces = ["w1", "w2", "##2", "##3", "w4"]
    # patch: ensure the pieces exist in the test vocab
    for p in pieces:
        assert p in tok.vocab or p.startswith("##"), p
    n_groups = 3  # w1 | w2 ##2 ##3 | w4
    seen_group_mask = False
    for seed in range(40):
        rng = np.random.default_rng(seed)
        out, labels = random_word_wwm_pieces(pieces, tok, rng, mask_prob=0.5)
        assert len(out) == len(labels) == len(pieces)
        # group members always share fate: labels for positions 1..3 are all
        # set or all ignore
        grp = labels[1:4]
        assert all(l == MLM_IGNORE for l in grp) or all(l != MLM_IGNORE for l in grp)
        if all(l != MLM_IGNORE for l in grp):
            seen_group_mask = True
    assert seen_group_mask

    # degenerate reference mode: pieces decide independently — find a seed
    # where group members diverge
    diverged = False
    for seed in range(60):
        rng = np.random.default_rng(seed)
        _, labels = random_word_wwm_pieces(
            pieces, tok, rng, mask_prob=0.5, group_continuations=False
        )
        grp = labels[1:4]
        if any(l == MLM_IGNORE for l in grp) and any(l != MLM_IGNORE for l in grp):
            diverged = True
            break
    assert diverged


def test_text_matched_objective(tok):
    """Passage-pair matched objective (reference text_data.py:249-297):
    [CLS] a [SEP] b [SEP] layout, segment ids, matched_label balance."""
    passages = [[f"w{i} w{i+1} w{i+2}", f"w{i+3} w{i+4}"] for i in range(1, 9)]
    corpus = PackedCorpus.build(passages, tok)
    ds = TextOnlyDataset(corpus, tok, max_seq_length=16, matched_objective=True)
    labels = []
    for seed in range(30):
        s = ds[(seed % len(ds), np.random.default_rng(seed))]
        assert s["input_ids"].shape == (16,)
        assert s["input_ids"][0] == tok.cls_id
        n = int(s["input_mask"].sum())
        # two SEPs present, segment ids 0 then 1
        sep_positions = np.where(s["input_ids"][:n] == tok.sep_id)[0]
        assert len(sep_positions) == 2
        assert s["token_type_ids"][sep_positions[0]] == 0
        assert s["token_type_ids"][sep_positions[1]] == 1
        labels.append(int(s["matched_label"]))
    assert 0 in labels and 1 in labels


@pytest.mark.slow
def test_fused_mlm_xent_matches_unfused_unsup(tok, sym):
    """The streaming softmax-xent path of the unsupervised model must match
    the materialized-logits loss to fp32 tolerance."""
    ann, feats = up.make_synthetic(16, tok, sym, feat_dim=FEAT_DIM)
    ds = up.UnsupervisedPretrainDataset(ann, feats, tok, sym,
                                        max_seq_length=12, n_regions=6)
    batch = next(iter(Batcher(ds, 8, seed=0).epoch(0)))
    batch = jax.tree.map(jnp.asarray, batch)

    ucfg_ref = make_ucfg(sym)
    ucfg_fx = make_ucfg(
        sym, bert=ucfg_ref.bert.replace(fused_mlm_xent=True)
    )
    m_ref = UnsupervisedVisualBert(ucfg_ref)
    m_fx = UnsupervisedVisualBert(ucfg_fx)
    params = m_ref.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    o_ref = m_ref.apply({"params": params}, batch, deterministic=True)
    o_fx = m_fx.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(
        float(o_fx["masked_lm_loss"]), float(o_ref["masked_lm_loss"]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        float(o_fx["loss"]), float(o_ref["loss"]), rtol=2e-5, atol=2e-5
    )
    assert "mlm_logits" not in o_fx and "mlm_logits" in o_ref


def test_matched_positive_pairs_disjoint(tok):
    """Positive (matched) pairs must be built from DISJOINT passage spans —
    b starts after the sentences a consumed (reference uses the next
    pre-segmented chunk, text_data.py:258-261), not one sentence in."""
    # one long passage of distinct single-token sentences: any a/b overlap
    # would show up as shared token ids (mask_prob=0 keeps tokens intact)
    passages = [[f"w{i}" for i in range(1, 33)]]
    corpus = PackedCorpus.build(passages, tok)
    ds = TextOnlyDataset(corpus, tok, max_seq_length=16,
                         matched_objective=True, mask_prob=0.0)
    checked = 0
    for seed in range(40):
        s = ds[(0, np.random.default_rng(seed))]
        if int(s["matched_label"]) != 1:
            continue
        n = int(s["input_mask"].sum())
        ids = s["input_ids"][:n]
        seg = s["token_type_ids"][:n]
        special = {tok.cls_id, tok.sep_id}
        a = [int(t) for t, g in zip(ids, seg) if g == 0 and int(t) not in special]
        b = [int(t) for t, g in zip(ids, seg) if g == 1 and int(t) not in special]
        if not a or not b:
            continue
        assert not (set(a) & set(b)), (a, b)
        checked += 1
    assert checked >= 5, checked


def test_matched_pairs_short_passage_wrap(tok):
    """Short passages: a wrapped continuation must stop before a's span (or
    fall back to a random passage with match=0) — never yield a positive
    pair whose halves share sentences."""
    passages = [[f"w{i}" for i in range(1, 5)], [f"w{i}" for i in range(10, 14)]]
    corpus = PackedCorpus.build(passages, tok)
    ds = TextOnlyDataset(corpus, tok, max_seq_length=16,
                         matched_objective=True, mask_prob=0.0)
    for seed in range(60):
        s = ds[(seed % 2, np.random.default_rng(seed))]
        if int(s["matched_label"]) != 1:
            continue
        n = int(s["input_mask"].sum())
        ids = s["input_ids"][:n]
        seg = s["token_type_ids"][:n]
        special = {tok.cls_id, tok.sep_id}
        a = [int(t) for t, g in zip(ids, seg) if g == 0 and int(t) not in special]
        b = [int(t) for t, g in zip(ids, seg) if g == 1 and int(t) not in special]
        assert not (set(a) & set(b)), (seed, a, b)
