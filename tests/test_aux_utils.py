"""Aux subsystems: TSV→H5 converter, polygon masks, NLVR2 metrics, probing,
vqa_advanced mode, multi-step trainer."""

import base64
import os

import jax
import numpy as np
import pytest

from visualbert_tpu.utils.boxes import clip_boxes, make_mask, resize_plan, scale_boxes
from visualbert_tpu.utils.nlvr2_eval import accuracy, consistency, write_csv_report


def test_tsv_to_h5_roundtrip(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    from visualbert_tpu.data.features import H5Features
    from visualbert_tpu.tools.convert_tsv_to_h5 import convert

    rows = []
    for i in range(3):
        nb = 4
        feats = rng.randn(nb, 8).astype(np.float32)
        boxes = rng.rand(nb, 4).astype(np.float32)
        obj = np.arange(nb, dtype=np.int64)
        conf = np.ones(nb, np.float32)
        enc = lambda a: base64.b64encode(a.tobytes()).decode()
        rows.append("\t".join([
            f"img{i}", "480", "640", enc(obj), enc(conf), enc(obj), enc(conf),
            str(nb), enc(boxes), enc(feats),
        ]))
    tsv = tmp_path / "f.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    h5 = str(tmp_path / "f.h5")
    n = convert(str(tsv), h5, feat_dim=8)
    assert n == 3
    store = H5Features(h5)
    assert "img1" in store
    row = store.get("img1")
    assert row["features"].shape == (4, 8)
    assert row["img_h"] == 480


def test_make_mask_square():
    # polygon covering left half of the box → left cells ~1, right ~0
    poly = np.array([[0, 0], [50, 0], [50, 100], [0, 100]], np.float64)
    m = make_mask([poly], box=(0, 0, 100, 100), mask_size=14)
    assert m.shape == (14, 14)
    assert m[:, :5].mean() > 0.9
    assert m[:, 9:].mean() < 0.1


def test_resize_and_clip():
    scale, (nh, nw) = resize_plan(480, 640, target=320)
    assert nw == 320 and nh == 240
    b = scale_boxes(np.array([[10.0, 10.0, 700.0, 500.0]]), scale)
    c = clip_boxes(b, nh, nw)
    assert c[0, 2] <= nw - 1 and c[0, 3] <= nh - 1


def test_nlvr2_metrics(tmp_path):
    labels = {
        "dev-1-0-0": 1, "dev-1-1-0": 1,   # group dev-1-0: two pairs
        "dev-2-0-0": 0,
    }
    preds = {"dev-1-0-0": 1, "dev-1-1-0": 0, "dev-2-0-0": 0}
    assert abs(accuracy(preds, labels) - 2 / 3) < 1e-9
    # group dev-1-0 inconsistent, dev-2-0 consistent
    assert abs(consistency(preds, labels) - 1 / 2) < 1e-9
    p = tmp_path / "report.csv"
    write_csv_report(str(p), [("dev-1-0-0", 1), ("dev-2-0-0", 0)])
    assert p.read_text() == "dev-1-0-0,True\ndev-2-0-0,False\n"


def test_probing_grounding():
    from visualbert_tpu.tasks.probing import grounding_accuracy_by_layer

    L, B, H, Tt, R = 2, 2, 3, 4, 5
    T = Tt + R
    probs = np.zeros((L, B, H, T, T), np.float32)
    position = np.array([[1, 2], [0, -1]], np.int32)
    label = np.zeros((B, 2, R), np.float32)
    # entity (0,0) at token 1 → gold region 3; make layer 0 attend there
    label[0, 0, 3] = 1.0
    probs[0, 0, :, 1, Tt + 3] = 0.9
    # entity (0,1) at token 2 → gold region 0; attends wrong region
    label[0, 1, 0] = 1.0
    probs[0, 0, :, 2, Tt + 4] = 0.9
    # entity (1,0) at token 0 → gold region 2, correct
    label[1, 0, 2] = 1.0
    probs[0, 1, :, 0, Tt + 2] = 0.9
    acc = grounding_accuracy_by_layer(probs, position, label, Tt)
    assert abs(acc[0] - 2 / 3) < 1e-9
    assert 0.0 <= acc[1] <= 1.0


def test_vqa_advanced_mode(rng):
    from visualbert_tpu.data.datasets import vqa as vqa_ds
    from visualbert_tpu.data.tokenization import BertTokenizer

    vocab = {w: i for i, w in enumerate(
        "[PAD] [UNK] [CLS] [SEP] [MASK] ? what color red blue".split())}
    tok = BertTokenizer(vocab)
    ann = [{"question_tokens": ["what", "color"], "image_id": "0",
            "answers": ["red"], "answer_str": "red", "question_id": 0}]
    from visualbert_tpu.data.features import ChunkFeatures

    feats = ChunkFeatures({"0": {"features": rng.randn(4, 8).astype(np.float32)}})
    ds = vqa_ds.VQADataset(ann, feats, tok, vqa_ds.AnswerVocab(["red", "blue"]),
                           max_seq_length=12, max_regions=4, advanced=True)
    s = ds[(0, np.random.default_rng(0))]
    ids = list(s["input_ids"])
    mask_id = vocab["[MASK]"]
    assert mask_id in ids
    pos = ids.index(mask_id)
    assert s["masked_lm_labels"][pos] == vocab["red"]
    assert (s["masked_lm_labels"][:pos] == -1).all()
    assert "label" not in s


@pytest.mark.slow
def test_multi_step_fn(rng):
    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    cfg = VisualBertConfig.tiny(visual_embedding_dim=8, hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)
    model = VisualBertForTask(cfg, head_type="nlvr")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=1e-3, schedule=None, t_total=-1),
        train_config=TrainConfig(),
        mesh=create_mesh((8, 1)),
    )
    B, T, V = 8, 6, 4
    batch = {
        "input_ids": rng.randint(0, cfg.vocab_size, size=(B, T)).astype(np.int32),
        "input_mask": np.ones((B, T), np.int32),
        "visual_embeddings": rng.randn(B, V, 8).astype(np.float32),
        "image_mask": np.ones((B, V), np.int32),
        "label": rng.randint(0, 2, size=B).astype(np.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    K = 3
    stacked = {k: np.stack([v] * K) for k, v in batch.items()}
    multi = trainer.multi_step_fn(K)
    state, metrics = multi(state, jax.tree.map(np.asarray, stacked), jax.random.PRNGKey(1))
    assert metrics["loss"].shape == (K,)
    assert int(jax.device_get(state.step)) == K


def test_flickr_unreachable_targets_keep_slot_and_cap_upperbound():
    """Entities whose gold boxes fall outside the kept regions keep their
    entity slot with reduced/zero label mass (reference
    flickr_dataset.py:240-251 + compute_score_with_logits_flickr
    upper_bound_labels, modeling.py:1652) so upperbound_accuracy < 1
    reflects the achievable-accuracy cap instead of being vacuously 1."""
    import numpy as np

    from visualbert_tpu.data.datasets import flickr as flickr_ds
    from visualbert_tpu.data.features import ChunkFeatures
    from visualbert_tpu.data.tokenization import BertTokenizer

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b", "c", "d"])}
    tok = BertTokenizer(vocab)
    ann = [{
        "image_id": "0",
        "words": ["a", "b", "c", "d"],
        "entities": [
            {"word_index": 0, "region_targets": [1, 2]},      # fully kept
            {"word_index": 1, "region_targets": [3, 9]},      # 9 beyond cap
            {"word_index": 2, "region_targets": [10, 11]},    # all beyond cap
        ],
    }]
    feats = ChunkFeatures({"0": {"features": np.zeros((12, 8), np.float32)}})
    ds = flickr_ds.Flickr30kDataset(ann, feats, tok, max_seq_length=10,
                                    max_regions=8, max_entities=4)
    item = ds[0]
    pos, label = item["flickr_position"], item["label"]
    # all three entities keep their slots
    assert (pos[:3] != -1).all() and pos[3] == -1
    # mass normalized over ALL matched regions: 1, 0.5 (one of two kept), 0
    np.testing.assert_allclose(label[0].sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(label[1].sum(), 0.5, atol=1e-6)
    np.testing.assert_allclose(label[2].sum(), 0.0, atol=1e-6)
    # the head's upperbound_accuracy = mean row mass over valid slots
    ub = label[:3].sum(-1).mean()
    assert 0.49 < ub < 0.51


@pytest.mark.slow
def test_probing_with_real_model(rng):
    """Export attention maps from the model and run the grounding probe."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.data.datasets import flickr as flickr_ds
    from visualbert_tpu.data.pipeline import Batcher
    from visualbert_tpu.data.tokenization import BertTokenizer
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.tasks.probing import grounding_accuracy_by_layer
    from visualbert_tpu.train.trainer import unbox

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(30)])}
    tok = BertTokenizer(vocab)
    ann, feats = flickr_ds.make_synthetic(16, tok, feat_dim=16)
    ds = flickr_ds.Flickr30kDataset(ann, feats, tok, max_seq_length=12,
                                    max_regions=8, max_entities=4)
    batch = next(iter(Batcher(ds, 8, shuffle=False, seed=0).epoch(0)))
    cfg = VisualBertConfig.tiny(visual_embedding_dim=16)
    model = VisualBertForTask(cfg, head_type="flickr")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = unbox(model.init({"params": jax.random.PRNGKey(0)}, jb)["params"])
    out = model.apply({"params": params}, jb, deterministic=True,
                      output_attention_probs=True)
    probs = np.asarray(out["attention_weights"])
    L = cfg.num_hidden_layers
    assert probs.shape[0] == L and probs.shape[3] == probs.shape[4] == 12 + 8
    acc = grounding_accuracy_by_layer(
        probs, batch["flickr_position"], batch["label"], text_len=12
    )
    assert set(acc) == set(range(L))
    assert all(0.0 <= v <= 1.0 for v in acc.values())


def test_bucketed_batchers(rng):
    from visualbert_tpu.data.pipeline import (
        bucket_boundaries_assign,
        make_bucketed_batchers,
    )

    lengths = [3, 10, 4, 18, 9, 2, 30, 11] * 4
    assign = bucket_boundaries_assign(lengths, [8, 16, 24])
    assert sorted(sum(assign.values(), [])) == list(range(len(lengths)))
    assert all(lengths[i] <= 8 for i in assign[8])
    assert 6 in assign[24] or 6 in assign.get(24, [])  # 30 > 24 → last bucket

    class FakeDS:
        def __init__(self, pad):
            self.pad = pad

        def __len__(self):
            return len(lengths)

        def __getitem__(self, args):
            i, _ = args
            row = np.zeros(self.pad, np.int32)
            row[: min(lengths[i], self.pad)] = 1
            return {"x": row, "idx": np.int64(i)}

    hybrid = make_bucketed_batchers(FakeDS, lengths, [8, 16, 24], batch_size=4, seed=0)
    seen_shapes = set()
    seen_idx = []
    for batch in hybrid.epoch(0):
        seen_shapes.add(batch["x"].shape[1])
        seen_idx.extend(batch["idx"].tolist())
        # every example fits its bucket
        assert (batch["x"].sum(1) <= batch["x"].shape[1]).all()
    assert seen_shapes <= {8, 16, 24} and len(seen_shapes) >= 2
    assert len(set(seen_idx)) == len(seen_idx)  # no duplicates within epoch


def test_image_folder_store(tmp_path, rng):
    import json

    pytest.importorskip("PIL")
    from PIL import Image

    from visualbert_tpu.utils.images import ImageFolderStore, prepare_image

    img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "x.jpg")
    (tmp_path / "x.json").write_text(json.dumps({
        "boxes": [[4, 4, 40, 30, 0.9], [10, 10, 70, 50, 0.8]],
        "names": ["person", "car"],
        "segms": [[[[4, 4], [40, 4], [40, 30], [4, 30]]],
                  [[[10, 10], [70, 10], [70, 50], [10, 50]]]],
    }))
    store = ImageFolderStore(str(tmp_path), target=64,
                             class_names=["person", "car"])
    assert "x" in store
    row = store.get("x")
    assert row["image"].shape == (64, 64, 3)
    assert row["boxes"].shape == (2, 4)
    # scale = 64/80 = 0.8 → first box x2 = 40*0.8 = 32
    np.testing.assert_allclose(row["boxes"][0, 2], 32.0, atol=1e-4)
    assert list(row["classes"]) == [0, 1]
    assert row["segms"].shape == (2, 14, 14)
    assert row["segms"].max() > 0.5

    prep = prepare_image(str(tmp_path / "x.jpg"), target=64, pad_square=False)
    assert prep["image"].shape[0] == 48  # 60*0.8


def test_params_summary():
    from visualbert_tpu.utils.logging import params_summary

    params = {"a": {"w": np.zeros((2, 3))}, "b": np.zeros(5)}
    s = params_summary(params)
    assert "a/w" in s and "TOTAL" in s and "11" in s


def test_fill_collate_matches_sequential():
    """The pooled fill-into-buffer collate must produce exactly the batches
    of the sequential path (same per-sample RNG keying)."""
    import numpy as np

    from visualbert_tpu.data.datasets.coco import CocoCaptionsDataset, make_synthetic
    from visualbert_tpu.data.pipeline import Batcher
    from visualbert_tpu.data.tokenization import BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(50)]
    tok = BertTokenizer({w: i for i, w in enumerate(vocab)})
    ann, feats = make_synthetic(24, tok, n_regions=5, feat_dim=8)
    ds = CocoCaptionsDataset(ann, feats, tok, max_seq_length=24, max_regions=5,
                             two_sentence=True)
    seq = list(Batcher(ds, 8, seed=3, num_workers=0).epoch(1))
    par = list(Batcher(ds, 8, seed=3, num_workers=4).epoch(1))
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_pad_regions_preserves_bf16():
    """bf16 feature caches must stay bf16 through region padding (wire bytes
    halve; the encoder casts to its bf16 compute dtype either way), while
    fp64/int inputs still normalize to fp32."""
    import ml_dtypes

    from visualbert_tpu.data.pipeline import pad_regions

    bf = np.arange(12, dtype=np.float32).reshape(3, 4).astype(ml_dtypes.bfloat16)
    out, mask, _ = pad_regions(bf, 5)
    assert out.dtype == ml_dtypes.bfloat16 and out.shape == (5, 4)
    np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(out[:3], bf)
    assert not out[3:].any()

    f64 = np.ones((2, 4), np.float64)
    out64, _, _ = pad_regions(f64, 3)
    assert out64.dtype == np.float32


@pytest.mark.slow
def test_time_scan_steps_harness():
    """bench.time_scan_steps: the shared hardware-bench harness runs a fused
    K-step scan and returns a positive rate + an advanced state."""
    import jax
    import numpy as np

    from bench import synth_batch, time_scan_steps
    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    cfg = VisualBertConfig.tiny(visual_embedding_dim=16)
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=1e-4, schedule=None, t_total=-1),
        train_config=TrainConfig(),
        mesh=create_mesh((8, 1)),
    )
    batch = synth_batch(8, tt=16, tv=4, dv=16, vocab=cfg.vocab_size, n_pred=3)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    rate, state2 = time_scan_steps(trainer, state, batch, K=2, repeats=1)
    assert rate > 0
    assert int(np.asarray(state2.step)) == 4  # warmup K + repeats·K


def test_flickr_head_upperbound_reflects_unreachable(rng):
    """Through the model head (models/visualbert.py flickr branch): an
    entity whose label row is all-zero is a guaranteed miss, so
    upperbound_accuracy = mean reachable mass < 1 and accuracy <= ub."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.train.trainer import unbox

    cfg = VisualBertConfig.tiny(visual_embedding_dim=16)
    model = VisualBertForTask(cfg, head_type="flickr")
    B, TT, TV, E = 2, 8, 6, 3
    label = np.zeros((B, E, TV), np.float32)
    label[:, 0, 1] = 1.0          # entity 0: fully reachable
    label[:, 1, :2] = 0.25        # entity 1: half the mass kept (0.5 total)
    # entity 2: zero row — gold boxes outside the kept regions
    positions = np.tile(np.array([1, 2, 3], np.int32), (B, 1))
    batch = {
        "input_ids": rng.randint(0, cfg.vocab_size, size=(B, TT)).astype(np.int32),
        "input_mask": np.ones((B, TT), np.int32),
        "visual_embeddings": rng.randn(B, TV, 16).astype(np.float32),
        "image_mask": np.ones((B, TV), np.int32),
        "flickr_position": positions,
        "label": label,
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = unbox(model.init({"params": jax.random.PRNGKey(0)}, jb)["params"])
    out = model.apply({"params": params}, jb, deterministic=True)
    ub = float(out["upperbound_accuracy"])
    np.testing.assert_allclose(ub, 0.5, atol=1e-6)  # mean(1, 0.5, 0)
    assert float(out["accuracy"]) <= ub + 1e-6
    assert int(out["entity_num"]) == B * E


def test_uint8_wire_matches_host_normalized_detector():
    """The raw-image wire optimization: shipping uint8 + (h, w) and letting
    SimpleDetector normalize in-graph and re-zero the pad must match the
    host-normalized fp32 path through the whole detector (same math, same
    zero padding — box_utils.py:56-63 semantics)."""
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.models.detector import SimpleDetector
    from visualbert_tpu.utils.images import normalize_image

    r = np.random.RandomState(0)
    h, w, T = 48, 64, 64  # content 48x64 inside a 64x64 canvas
    content = r.randint(0, 256, (h, w, 3), np.uint8)

    u8 = np.zeros((T, T, 3), np.uint8)
    u8[:h, :w] = content
    f32 = np.zeros((T, T, 3), np.float32)
    f32[:h, :w] = normalize_image(content)

    boxes = np.asarray([[[2.0, 2.0, 60.0, 40.0], [5.0, 8.0, 30.0, 30.0]]],
                       np.float32)
    mask = np.ones((1, 2), np.int32)
    hw = np.asarray([[h, w]], np.int32)

    det = SimpleDetector(dtype=jnp.float32, trunk_blocks=(1, 1, 1),
                         layer4_blocks=1, width_div=8)
    v = det.init(jax.random.PRNGKey(0), jnp.asarray(f32)[None], boxes, mask)
    out_f = det.apply(v, jnp.asarray(f32)[None], boxes, mask)
    out_u = det.apply(v, jnp.asarray(u8)[None], boxes, mask,
                      image_hw=jnp.asarray(hw))
    np.testing.assert_allclose(
        np.asarray(out_u["obj_reps"]), np.asarray(out_f["obj_reps"]),
        rtol=1e-4, atol=1e-5,
    )


def test_prepare_image_uint8_and_draft(tmp_path, rng):
    """normalize=False keeps uint8 (the wire dtype); draft decode of a >=2x
    downscale stays close to the full-resolution decode+resize."""
    pytest.importorskip("PIL")
    from PIL import Image

    from visualbert_tpu.utils.images import prepare_image

    big = (rng.rand(600, 800, 3) * 255).astype(np.uint8)
    Image.fromarray(big).save(tmp_path / "big.jpg", quality=95)

    u8 = prepare_image(str(tmp_path / "big.jpg"), target=64, normalize=False)
    assert u8["image"].dtype == np.uint8 and u8["image"].shape == (64, 64, 3)
    assert int(u8["height"]) == 48 and int(u8["width"]) == 64
    # square padding is zero and content is not
    assert u8["image"][48:].sum() == 0 and u8["image"][:48].mean() > 10
    # scale maps ORIGINAL pixel coords (64/800), regardless of draft decode
    np.testing.assert_allclose(float(u8["scale"]), 64 / 800)

    full = prepare_image(str(tmp_path / "big.jpg"), target=64,
                         normalize=False, draft=False)
    assert full["image"].shape == u8["image"].shape
    diff = np.abs(u8["image"].astype(np.float32) -
                  full["image"].astype(np.float32))
    assert diff.mean() < 6.0, diff.mean()  # DCT-scaled vs full decode
