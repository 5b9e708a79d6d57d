"""End-to-end unsupervised pretraining: TPU-resident detector feeding the
three-stream encoder (BASELINE.json config 5 — "end-to-end ResNet+RoIAlign
feature extraction on TPU").

The reference never runs its detector inside unsupervised training (features
come from the offline BUTD Caffe pipeline, SURVEY §3.5); this model closes
that loop on TPU: images+proposal boxes → ResNet50+RoIAlign object features
→ [text ; tags ; visual] encoder, with the masked-feature / masked-tag
objectives built IN-GRAPH from the detector's own outputs:

  * visual_feats = detector ``obj_reps_raw`` (2048-d), 15%-masked to zero at
    host-sampled positions (``feat_mask``); regression target is the
    stop-gradded unmasked features;
  * tags = detector class predictions mapped into the symbolic vocabulary
    (``class_to_symbolic``), masked jointly with features; the masked-tag
    objective predicts the detector's (stop-gradded) tag.

Host supplies only images/boxes/text and the mask draws — everything
learned stays on device.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from visualbert_tpu.models.detector import SimpleDetector
from visualbert_tpu.models.unsupervised import UnsupervisedConfig, UnsupervisedVisualBert

Array = jax.Array


class UnsupervisedEndToEnd(nn.Module):
    """Batch keys:
      images [B, H, W, 3], boxes [B, N, 4] (pixels), box_mask [B, N]
      boxes_norm [B, N, 4] (normalized 0-1, for the box embeddings)
      input_ids / token_type_ids / input_mask / masked_lm_labels (optional)
      matched_label [B] (optional)
      feat_mask [B, N] {0,1} host-sampled feature-mask draws
      tag_mask [B, N] {0,1} host-sampled tag-mask draws
    """

    config: UnsupervisedConfig
    class_to_symbolic: Tuple[int, ...] = ()  # detector class id → symbolic id
    train_detector: bool = True
    # backbone shrink knobs (tests; defaults = exact resnet50). With
    # width_div > 1 obj_reps_raw is 2048/div-d — set visual_feat_dim to match
    trunk_blocks: Tuple[int, int, int] = (3, 4, 6)
    layer4_blocks: int = 3
    width_div: int = 1

    def setup(self):
        self.detector = SimpleDetector(
            final_dim=512,  # unused head; we read obj_reps_raw
            semantic=False,
            dtype=self.config.bert.dtype,
            trunk_blocks=self.trunk_blocks,
            layer4_blocks=self.layer4_blocks,
            width_div=self.width_div,
            name="detector",
        )
        self.trunk = UnsupervisedVisualBert(self.config, name="trunk")

    def __call__(self, batch: Dict[str, Array], deterministic: bool = True) -> Dict[str, Any]:
        cfg = self.config
        det = self.detector(
            batch["images"], batch["boxes"], batch["box_mask"],
            deterministic=deterministic,
        )
        feats = det["obj_reps_raw"].astype(jnp.float32)  # [B, N, 2048]
        if not self.train_detector:
            feats = jax.lax.stop_gradient(feats)
        obj_logits = det["obj_logits"]                   # [B, N, 81]
        pred_classes = jnp.argmax(obj_logits, axis=-1)   # [B, N]

        if self.class_to_symbolic:
            table = jnp.asarray(np.asarray(self.class_to_symbolic, np.int32))
            tags_clean = table[pred_classes]
        else:
            tags_clean = jnp.minimum(pred_classes, cfg.symbolic_vocab_size - 1)

        feat_mask = batch["feat_mask"].astype(jnp.float32)
        tag_mask = batch["tag_mask"]
        mask_sym = cfg.obj_id_num + cfg.attr_id_num + 2  # [MASK] symbolic id

        corrupted = feats * (1.0 - feat_mask)[..., None]
        tags = jnp.where(tag_mask > 0, mask_sym, tags_clean)

        sub = {
            "visual_feats": corrupted,
            "boxes": batch["boxes_norm"],
            "visual_feats_mask": batch["box_mask"],
            "visual_tags": tags.astype(jnp.int32),
            "visual_tags_box": batch["boxes_norm"],
            "visual_tags_mask": batch["box_mask"],
            # targets come from the detector itself, gradient-stopped
            "feat_target": jax.lax.stop_gradient(feats),
            "feat_mask": feat_mask * batch["box_mask"],
            "obj_labels": jnp.where(
                (feat_mask > 0) & (batch["box_mask"] > 0),
                jax.lax.stop_gradient(pred_classes), -1
            ).astype(jnp.int32),
            "obj_conf": feat_mask * batch["box_mask"],
            "attr_labels": -jnp.ones_like(pred_classes, jnp.int32),  # no attrs
            "attr_conf": jnp.zeros_like(feat_mask),
            "visual_tags_objective": jnp.where(
                (tag_mask > 0) & (batch["box_mask"] > 0),
                jax.lax.stop_gradient(tags_clean), -1
            ).astype(jnp.int32),
        }
        for k in ("input_ids", "token_type_ids", "input_mask",
                  "masked_lm_labels", "matched_label", "ans"):
            if batch.get(k) is not None:
                sub[k] = batch[k]

        out = self.trunk(sub, deterministic=deterministic)
        out["cnn_aux_loss"] = det.get("cnn_regularization_loss")
        return out
