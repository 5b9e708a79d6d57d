"""In-batch random feature replacement (reference inbatch_random mode,
lxmert_data.py:558-583,756-771): the 10% random-replacement slots of the
masked-feature objective draw from OTHER examples in the batch (original,
uncorrupted features), with the transient conf-2.0 mark resolved to 1.0 at
collate time."""

import numpy as np
import pytest

from visualbert_tpu.data.datasets import unsup_pretrain as up
from visualbert_tpu.data.features import ChunkFeatures
from visualbert_tpu.data.masking import in_batch_random_replace, random_mask_features
from visualbert_tpu.data.pipeline import Batcher
from visualbert_tpu.data.symbolic import SymbolicVocab
from visualbert_tpu.data.tokenization import BertTokenizer

N_REGIONS, FEAT_DIM = 8, 4


@pytest.fixture(scope="module")
def tok():
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(20)]
    return BertTokenizer({w: i for i, w in enumerate(words)})


@pytest.fixture(scope="module")
def sym():
    return SymbolicVocab([f"o{i}" for i in range(16)], [f"a{i}" for i in range(8)])


def _signature_dataset(tok, sym, n=32):
    """Every region feature of image i is the constant i+1, so any replaced
    slot's source image is identifiable from its value."""
    chunk, ann = {}, []
    for i in range(n):
        chunk[str(i)] = {
            "features": np.full((N_REGIONS, FEAT_DIM), i + 1, np.float32),
            "boxes": np.tile(np.array([1.0, 1.0, 2.0, 2.0], np.float32), (N_REGIONS, 1)),
            "objects_id": np.arange(N_REGIONS) % 16,
            "objects_conf": np.ones(N_REGIONS, np.float32),
            "attrs_id": np.arange(N_REGIONS) % 8,
            "attrs_conf": np.ones(N_REGIONS, np.float32),
            "img_h": 4.0, "img_w": 4.0,
        }
        ann.append({"image_id": str(i), "sentence": "w1 w2 w3"})
    return ann, ChunkFeatures(chunk)


def test_mark_distribution():
    """random_mask_features(in_batch_mark=True): ~15% masked, of which 80%
    zeroed / 10% marked 2.0 (feature untouched) / 10% kept."""
    rng = np.random.default_rng(0)
    n_total = n_masked = n_marked = n_zeroed = 0
    for _ in range(400):
        feats = np.ones((N_REGIONS, FEAT_DIM), np.float32)
        out, mask = random_mask_features(feats, rng, 0.15, in_batch_mark=True)
        n_total += N_REGIONS
        n_masked += int((mask > 0).sum())
        n_marked += int((mask == 2.0).sum())
        n_zeroed += int(((mask > 0) & (out == 0).all(-1)).sum())
        # marked slots keep the original feature until collate
        assert (out[mask == 2.0] == 1.0).all()
    assert n_masked / n_total == pytest.approx(0.15, abs=0.02)
    assert n_marked / max(n_masked, 1) == pytest.approx(0.10, abs=0.03)
    assert n_zeroed / max(n_masked, 1) == pytest.approx(0.80, abs=0.05)


def test_replacement_source_is_other_example(tok, sym):
    """Through the full Batcher path: every replaced slot's value is another
    image's ORIGINAL feature (never the same image), no 2.0 marks survive,
    and the feat target stays the original feature."""
    ann, feats = _signature_dataset(tok, sym)
    ds = up.UnsupervisedPretrainDataset(
        ann, feats, tok, sym, max_seq_length=8, n_regions=N_REGIONS
    )
    assert ds.batch_transform is not None
    n_replaced = 0
    for batch in Batcher(ds, 16, shuffle=False, seed=0).epoch(0):
        fm = batch["feat_mask"]
        assert not (fm == 2.0).any()
        vf = batch["visual_feats"]
        tgt = batch["feat_target"]
        B = fm.shape[0]
        for b in range(B):
            own = tgt[b, 0, 0]  # image signature value
            assert (tgt[b] == own).all()  # target = original features
            for i in range(N_REGIONS):
                v = vf[b, i]
                if fm[b, i] == 1.0 and not (v == 0).all() and not (v == own).all():
                    # replaced slot: must be exactly one OTHER image's value
                    assert (v == v[0]).all()
                    assert v[0] != own and 1 <= v[0] <= len(ann)
                    n_replaced += 1
                elif fm[b, i] == 0.0:
                    assert (v == own).all()  # unmasked slots untouched
    assert n_replaced > 0  # ~32*8*0.15*0.10 ≈ 4 expected


def test_replacement_deterministic(tok, sym):
    ann, feats = _signature_dataset(tok, sym, n=16)
    ds = up.UnsupervisedPretrainDataset(
        ann, feats, tok, sym, max_seq_length=8, n_regions=N_REGIONS
    )
    a = next(iter(Batcher(ds, 16, shuffle=False, seed=3).epoch(0)))
    b = next(iter(Batcher(ds, 16, shuffle=False, seed=3).epoch(0)))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_degenerate_batch_keeps_feature():
    batch = {
        "feat_mask": np.array([[2.0, 0.0]], np.float32),
        "visual_feats": np.ones((1, 2, 3), np.float32),
        "feat_target": np.ones((1, 2, 3), np.float32),
    }
    out = in_batch_random_replace(batch, np.random.default_rng(0))
    assert (out["feat_mask"] == [[1.0, 0.0]]).all()
    assert (out["visual_feats"] == 1.0).all()


def test_conf_masks_never_carry_marks(tok, sym):
    """obj/attr conf weights derive from the CLIPPED mask — a 2.0 mark must
    not double an obj/attr loss weight."""
    ann, feats = _signature_dataset(tok, sym, n=8)
    ds = up.UnsupervisedPretrainDataset(
        ann, feats, tok, sym, max_seq_length=8, n_regions=N_REGIONS
    )
    for i in range(8):
        s = ds[(i, np.random.default_rng(i))]
        assert s["obj_conf"].max() <= 1.0
        assert s["attr_conf"].max() <= 1.0
