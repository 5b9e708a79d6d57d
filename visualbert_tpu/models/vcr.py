"""VCR end-to-end model: TPU-resident detector + VisualBERT multichoice.

Rebuild of the reference ``VisualBERTDetector`` (``visualbert/models/
model.py:23-189``): run ``SimpleDetector`` once per image, broadcast the
object representations across the 4 answer choices (model.py:142-147), run
the joint encoder with the multichoice head, and add the detector's
auxiliary 81-way loss scaled by ``cnn_loss_ratio`` (model.py:170-174,
applied in ``model_wrapper.py:70-73``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models.detector import SimpleDetector
from visualbert_tpu.models.visualbert import VisualBertForTask

Array = jax.Array


class VisualBertDetectorModel(nn.Module):
    """Batch dict:
      images        [B, H, W, 3]
      boxes         [B, N, 4], box_mask [B, N]
      classes       [B, N] int, segms [B, N, 14, 14] (optional)
      input_ids / token_type_ids / input_mask / masked_lm_labels:
                    [B, C, T] per-choice text fields
      image_text_alignment (optional) [B, C, N, A]
      label         [B] int (choice index)
    """

    config: VisualBertConfig
    head_type: str = "multichoice"
    num_choices: int = 4
    final_dim: int = 512
    cnn_loss_ratio: float = 0.1
    train_detector: bool = True
    # backbone depth (resnet50 default; tests use shallow trunks)
    trunk_blocks: tuple = (3, 4, 6)
    layer4_blocks: int = 3
    width_div: int = 1

    def setup(self):
        self.detector = SimpleDetector(
            final_dim=self.final_dim,
            dtype=self.config.dtype,
            trunk_blocks=self.trunk_blocks,
            layer4_blocks=self.layer4_blocks,
            width_div=self.width_div,
            name="detector",
        )
        self.bert_objective = VisualBertForTask(
            self.config.replace(visual_embedding_dim=self.final_dim),
            head_type=self.head_type,
            num_choices=self.num_choices,
            name="bert",
        )

    def __call__(
        self,
        batch: Dict[str, Array],
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        det = self.detector(
            batch["images"],
            batch["boxes"],
            batch["box_mask"],
            batch.get("classes"),
            batch.get("segms"),
            deterministic=deterministic,
            image_hw=batch.get("image_hw"),
        )
        obj_reps = det["obj_reps"]  # [B, N, final_dim]
        if not self.train_detector:
            obj_reps = jax.lax.stop_gradient(obj_reps)

        B, N, D = obj_reps.shape
        if batch["input_ids"].ndim == 2:
            # choice-less batch (COCO r2c pretraining): one text per image
            visual = obj_reps
            image_mask = batch["box_mask"]
        else:
            C = batch["input_ids"].shape[1]
            # broadcast image stream across the C answer choices (model.py:142-147)
            visual = jnp.broadcast_to(obj_reps[:, None], (B, C, N, D))
            image_mask = jnp.broadcast_to(batch["box_mask"][:, None], (B, C, N))

        sub_batch = dict(batch)
        sub_batch.pop("images"), sub_batch.pop("boxes"), sub_batch.pop("box_mask")
        sub_batch.pop("classes", None), sub_batch.pop("segms", None)
        sub_batch.pop("image_hw", None)
        sub_batch["visual_embeddings"] = visual
        sub_batch["image_mask"] = image_mask

        out = self.bert_objective(sub_batch, deterministic=deterministic)
        out["cnn_regularization_loss"] = det.get("cnn_regularization_loss")
        if out.get("loss") is not None and det.get("cnn_regularization_loss") is not None:
            out["loss"] = out["loss"] + self.cnn_loss_ratio * det["cnn_regularization_loss"]
        return out
