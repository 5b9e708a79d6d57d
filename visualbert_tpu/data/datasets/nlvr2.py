"""NLVR2 dataset (reference: ``visualbert/dataloaders/nlvr_dataset.py``).

One example = a statement about a PAIR of images. The two images' region
features are concatenated along the region axis and distinguished by
``visual_embeddings_type`` 0/1 (nlvr_dataset.py:98-114); the head is a 2-way
classifier over the pooled output.

Annotations: [{"identifier": str, "sentence": str, "label": 0/1,
               "img0": str, "img1": str}]  (jsonl rows of the official data
with the two image ids resolved).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from visualbert_tpu.data.features import FeatureStore
from visualbert_tpu.data.masking import assemble_pair
from visualbert_tpu.data.pipeline import pad_regions
from visualbert_tpu.data.tokenization import BertTokenizer


class NLVR2Dataset:
    def __init__(
        self,
        annotations: List[Dict],
        features: FeatureStore,
        tokenizer: BertTokenizer,
        *,
        max_seq_length: int = 128,
        max_regions_per_image: int = 72,  # reference image_feature_cap 144 total
        screen_threshold: float = 0.2,
    ):
        self.annotations = annotations
        self.features = features
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.max_regions_per_image = max_regions_per_image
        # confidence screening when the store carries detector confidences
        # (reference screens NLVR chunks, bert_data_utils.py:494-525)
        self.screen_threshold = screen_threshold

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, args) -> Dict[str, np.ndarray]:
        i, rng = args if isinstance(args, tuple) else (args, None)
        item = self.annotations[i]

        tokens = self.tokenizer.tokenize(item["sentence"])[: self.max_seq_length - 2]
        enc = assemble_pair(tokens, None, self.tokenizer, self.max_seq_length)

        cap = self.max_regions_per_image
        r0 = self.features.get(str(item["img0"]))
        r1 = self.features.get(str(item["img1"]))
        from visualbert_tpu.data.features import screen_features

        f0, _ = screen_features(
            np.asarray(r0["features"]), r0.get("objects_conf"),
            threshold=self.screen_threshold, max_cap=cap,
        )
        f1, _ = screen_features(
            np.asarray(r1["features"]), r1.get("objects_conf"),
            threshold=self.screen_threshold, max_cap=cap,
        )
        v0, m0, _ = pad_regions(f0, cap)
        v1, m1, _ = pad_regions(f1, cap)
        visual = np.concatenate([v0, v1], axis=0)
        image_mask = np.concatenate([m0, m1], axis=0)
        vis_type = np.concatenate(
            [np.zeros(cap, np.int32), np.ones(cap, np.int32)], axis=0
        )

        sample = {
            "input_ids": enc.input_ids,
            "token_type_ids": enc.segment_ids,
            "input_mask": enc.input_mask,
            "visual_embeddings": visual,
            "image_mask": image_mask,
            "visual_embeddings_type": vis_type,
            # annotation-list position, shipped INSIDE the batch so eval
            # dumps recover identifiers without coupling to batch order
            "example_index": np.int32(i),
        }
        if "label" in item and item["label"] is not None:
            sample["label"] = np.int32(item["label"])
        return sample


def make_synthetic(n: int, tokenizer: BertTokenizer, n_regions: int = 6,
                   feat_dim: int = 32, seed: int = 0):
    from visualbert_tpu.data.features import ChunkFeatures

    rng = np.random.default_rng(seed)
    words = [w for w in tokenizer.vocab if not w.startswith("[") and not w.startswith("##")]
    annotations, chunk = [], {}
    for i in range(n):
        label = int(rng.integers(2))
        # make label recoverable: img1 features shifted when label=1
        chunk[f"{i}_0"] = {"features": rng.normal(size=(n_regions, feat_dim)).astype(np.float32)}
        chunk[f"{i}_1"] = {
            "features": (rng.normal(size=(n_regions, feat_dim)) + 3.0 * label).astype(np.float32)
        }
        annotations.append({
            "identifier": str(i),
            "sentence": " ".join(rng.choice(words, size=5)),
            "label": label,
            "img0": f"{i}_0",
            "img1": f"{i}_1",
        })
    return annotations, ChunkFeatures(chunk)
