"""Task-multiplexed VisualBERT objective.

TPU-native re-design of the reference ``TrainVisualBERTObjective``
(``visualbert/pytorch_pretrained_bert/modeling.py:1335-1598``): one Flax
module whose *static* ``head_type`` picks the head and loss. All inputs are
statically-shaped, padded, masked tensors — the reference's
ragged/batch-max-padded AllenNLP batches become bucketed fixed shapes so a
single jit program serves the whole run.

Batch dict keys (all optional except input_ids/input_mask):
  input_ids            [B, Tt] or [B, C, Tt] int32
  token_type_ids       same shape as input_ids
  input_mask           same shape as input_ids, {0,1}
  visual_embeddings    [B, Tv, Dv] or [B, C, Tv, Dv]
  image_mask           [B, Tv] or [B, C, Tv]
  visual_embeddings_type  like image_mask
  image_text_alignment [B, Tv, A] or [B, C, Tv, A]
  masked_lm_labels     like input_ids, -1 = unmasked
  is_random_next       [B] int32 (sentence-image alignment label)
  label                task label: [B] int (multichoice/nlvr), [B, 3129] soft
                       scores (vqa), [B, E, Tv] soft dist (flickr)
  flickr_position      [B, E] int32, -1 = pad
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models import losses
from visualbert_tpu.models.encoder import VisualBertModel
from visualbert_tpu.models.heads import Classifier, FlickrAttention, PreTrainingHeads

Array = jax.Array


def _flatten_choices(x: Optional[Array], extra_dims: int = 1) -> Optional[Array]:
    """[B, C, ...] → [B*C, ...] (reference modeling.py:1678-1696)."""
    if x is None:
        return None
    if x.ndim == 1 + extra_dims:
        return x
    assert x.ndim == 2 + extra_dims, x.shape
    return x.reshape((-1,) + x.shape[2:])


def _drop_zero_weight_labels(labels: Optional[Array], weights: Optional[Array],
                             ignore_index: int = -1) -> Optional[Array]:
    """Set token labels of zero-weight (tail-pad duplicate) examples to the
    ignore index so CE/accuracy reductions skip them. ``labels`` rows may be
    the choice-flattened [B*C, ...] of a [B] weight vector."""
    if labels is None or weights is None:
        return labels
    w = weights
    if labels.shape[0] != w.shape[0]:
        w = jnp.repeat(w, labels.shape[0] // w.shape[0])
    keep = (w > 0).reshape((-1,) + (1,) * (labels.ndim - 1))
    return jnp.where(keep, labels, ignore_index)


class VisualBertForTask(nn.Module):
    config: VisualBertConfig
    head_type: str  # one of config.HEAD_TYPES
    num_answers: int = 3129  # vqa classifier width (reference modeling.py:1362)
    num_choices: int = 4     # VCR (reference modeling.py:1358)

    def setup(self):
        cfg = self.config
        self.bert = VisualBertModel(cfg, name="bert")
        if self.head_type in ("pretraining", "vqa_advanced", "flickr"):
            self.cls = PreTrainingHeads(cfg, name="cls")
        if self.head_type == "multichoice":
            self.classifier = Classifier(cfg, 1, name="classifier")
        elif self.head_type == "vqa":
            self.classifier = Classifier(cfg, self.num_answers, name="classifier")
        elif self.head_type == "nlvr":
            self.classifier = Classifier(cfg, 2, name="classifier")
        if self.head_type == "flickr":
            self.flickr_attention = FlickrAttention(cfg, name="flickr_attention")

    def __call__(
        self,
        batch: Dict[str, Array],
        deterministic: bool = True,
        output_attention_probs: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        input_ids = _flatten_choices(batch["input_ids"])
        token_type_ids = _flatten_choices(batch.get("token_type_ids"))
        input_mask = _flatten_choices(batch["input_mask"])
        image_mask = _flatten_choices(batch.get("image_mask"))
        visual_embeddings = _flatten_choices(batch.get("visual_embeddings"), extra_dims=2)
        visual_types = _flatten_choices(batch.get("visual_embeddings_type"))
        image_text_alignment = _flatten_choices(batch.get("image_text_alignment"), extra_dims=2)
        masked_lm_labels = _flatten_choices(batch.get("masked_lm_labels"))
        # 1.0 real / 0.0 tail-pad duplicate rows (Batcher pad_final); every
        # loss/metric below is weighted so padded eval batches stay exact
        example_weight = batch.get("example_weight")
        masked_lm_labels = _drop_zero_weight_labels(masked_lm_labels, example_weight)

        if image_mask is not None:
            attention_mask = jnp.concatenate([input_mask, image_mask], axis=-1)
            if masked_lm_labels is not None:
                # extend lm labels with -1 over visual positions
                # (reference modeling.py:1420-1426)
                pad = -jnp.ones_like(image_mask, dtype=masked_lm_labels.dtype)
                masked_lm_labels = jnp.concatenate([masked_lm_labels, pad], axis=-1)
        else:
            attention_mask = input_mask

        if visual_types is None and image_mask is not None:
            visual_types = jnp.zeros_like(image_mask, dtype=jnp.int32)

        sequence_output, pooled_output, attn_probs = self.bert(
            input_ids,
            token_type_ids,
            attention_mask,
            visual_embeddings,
            visual_types,
            image_text_alignment,
            deterministic=deterministic,
            output_attention_probs=output_attention_probs,
        )

        out: Dict[str, Any] = {"loss": None}
        if output_attention_probs:
            out["attention_weights"] = attn_probs

        if self.head_type in ("pretraining", "vqa_advanced"):
            word_emb = self.bert.embeddings.word_embeddings.embedding
            mlm_positions = batch.get("mlm_positions")
            if mlm_positions is not None:
                # TPU fast path: the CE ignores every position whose label is
                # -1, so gather the ≤P masked positions FIRST and run the
                # 30522-wide decoder matmul on [B, P, H] instead of
                # [B, T, H] — identical loss, ~T/P less HBM and FLOPs.
                # mlm_positions: [B, P] int32 (pad slots point anywhere);
                # labels for the slots come from masked_lm_labels gathered
                # alongside (-1 pads drop out of the loss).
                mlm_positions = _flatten_choices(mlm_positions)
                gathered = jnp.take_along_axis(
                    sequence_output, mlm_positions[..., None], axis=1
                )
                gathered_labels = (
                    None
                    if masked_lm_labels is None
                    else jnp.take_along_axis(masked_lm_labels, mlm_positions, axis=1)
                )
                # the fused-xent path emits no logits tensor, which
                # vqa_advanced EVAL needs for answer decoding — train steps
                # (deterministic=False) don't, so they take the fused path
                fuse_labels = (
                    gathered_labels
                    if (self.head_type == "pretraining" or not deterministic)
                    else None
                )
                mlm_logits, nsp_logits, mlm_nll, mlm_pred = self.cls(
                    gathered, pooled_output, word_emb, labels=fuse_labels
                )
            else:
                gathered_labels = masked_lm_labels
                fuse_labels = (
                    gathered_labels if self.head_type == "pretraining" else None
                )
                mlm_logits, nsp_logits, mlm_nll, mlm_pred = self.cls(
                    sequence_output, pooled_output, word_emb, labels=fuse_labels
                )
            if mlm_logits is not None:
                out["logits"] = mlm_logits
            out["seq_relationship_score"] = nsp_logits
            total = 0.0
            if gathered_labels is not None:
                valid = gathered_labels != -1
                if mlm_nll is not None:
                    # fused kernel path: per-token nll/argmax, same
                    # ignore_index=-1 mean as cross_entropy_ignore_index
                    count = jnp.maximum(valid.sum(), 1)
                    mlm_loss = jnp.where(valid, mlm_nll, 0.0).sum() / count
                    pred = mlm_pred
                else:
                    mlm_loss = losses.cross_entropy_ignore_index(
                        mlm_logits, gathered_labels
                    )
                    pred = jnp.argmax(mlm_logits, axis=-1)
                out["masked_lm_loss"] = mlm_loss
                total = total + mlm_loss
                # masked-token exact-match accuracy (cheap, on-device)
                correct = jnp.where(valid, pred == gathered_labels, False)
                out["mlm_accuracy"] = correct.sum() / jnp.maximum(valid.sum(), 1)
            if self.head_type == "pretraining" and batch.get("is_random_next") is not None:
                nsp_loss = losses.cross_entropy_ignore_index(
                    nsp_logits,
                    _drop_zero_weight_labels(
                        batch["is_random_next"].reshape(-1), example_weight
                    ),
                )
                out["next_sentence_loss"] = nsp_loss
                total = total + nsp_loss
            out["loss"] = total

        elif self.head_type == "multichoice":
            logits = self.classifier(pooled_output, deterministic)  # [B*C, 1]
            logits = logits.reshape(-1, self.num_choices)
            out["logits"] = logits
            if batch.get("label") is not None:
                out["loss"] = losses.cross_entropy(
                    logits, batch["label"], weights=example_weight
                )
                out["accuracy"] = losses.weighted_mean(
                    jnp.argmax(logits, -1) == batch["label"], example_weight
                )

        elif self.head_type == "vqa":
            # pool at position sum(input_mask)-2 = the [MASK] slot before the
            # final [SEP] (reference modeling.py:1502-1515)
            gather_idx = input_mask.sum(axis=1) - 2
            pooled = jnp.take_along_axis(
                sequence_output, gather_idx[:, None, None], axis=1
            )[:, 0]
            logits = self.classifier(pooled, deterministic)
            out["logits"] = logits
            if batch.get("label") is not None:
                log_probs = jax.nn.log_softmax(logits, axis=-1)
                out["loss"] = losses.kl_div_batchmean(
                    log_probs, batch["label"], weights=example_weight
                )
                scores = losses.vqa_accuracy_scores(logits, batch["label"])
                out["accuracy"] = losses.weighted_mean(scores, example_weight)

        elif self.head_type == "nlvr":
            logits = self.classifier(pooled_output, deterministic)
            out["logits"] = logits
            if batch.get("label") is not None:
                out["loss"] = losses.cross_entropy(
                    logits, batch["label"], weights=example_weight
                )
                out["accuracy"] = losses.weighted_mean(
                    jnp.argmax(logits, -1) == batch["label"], example_weight
                )

        elif self.head_type == "flickr":
            flickr_position = batch.get("flickr_position")
            if flickr_position is not None:
                pos_mask = flickr_position != -1
                if example_weight is not None:
                    # tail-pad duplicate rows contribute no entities
                    pos_mask = pos_mask & (example_weight > 0)[:, None]
                safe_pos = jnp.maximum(flickr_position, 0)
                # entity hidden states gathered from the sequence
                # (reference modeling.py:1573-1581)
                selected = jnp.take_along_axis(
                    sequence_output, safe_pos[..., None], axis=1
                )
                Tt = input_mask.shape[1]
                visual_states = sequence_output[:, Tt:]
                scores = self.flickr_attention(selected, visual_states, image_mask)
                log_probs = jax.nn.log_softmax(scores, axis=-1)
                out["logits"] = scores
                label = batch["label"].astype(jnp.float32)
                out["loss"] = losses.kl_div_batchmean(
                    log_probs, label, weights=example_weight
                )
                # accuracy: argmax region has positive label mass
                # (reference modeling.py:1648-1676, recall=1)
                pred = jnp.argmax(scores, axis=-1)
                hit = jnp.take_along_axis(label, pred[..., None], axis=2)[..., 0] > 0
                hit = jnp.where(pos_mask, hit, False)
                n_entities = jnp.maximum(pos_mask.sum(), 1)
                out["accuracy"] = hit.sum() / n_entities
                # reachable soft-label mass per entity (gold boxes outside
                # the kept regions cap the achievable accuracy) — reference
                # upper_bound_labels, modeling.py:1595-1596,1652
                out["upperbound_accuracy"] = (
                    jnp.where(pos_mask, label.sum(-1), 0.0).sum() / n_entities
                )
                out["entity_num"] = pos_mask.sum()
        else:
            raise ValueError(f"unknown head_type {self.head_type}")

        return out
