"""Unsupervised VisualBERT (NAACL-2021 stack) — single-stream encoder over
``[text ; detector-tags ; visual]`` with masked-feature/tag objectives.

Rebuild of ``unsupervised_visualbert/src/lxrt/modeling.py`` in its
``visualbert_style`` mode (modeling.py:769-886): the joint 12-layer encoder,
the three-stream embeddings (:498-647), the pretraining heads (:956-1017) and
the loss assembly (:1339-1465):

  * visual token = (LN(visn_fc(feat)) + LN(box_fc(box4))) / 2   (:616-627)
  * tag token    = (LN(symbolic_emb(tag)) + LN(box_fc(box4))) / 2  (:579-612)
  * losses: MLM (CE ignore −1), sentence-image matched (2-way CE), masked-obj
    CE×(1/0.15), masked-attr CE×(1/0.15), masked-feat SmoothL1·conf×(1/0.15),
    masked-tag CE over the 2003-way symbolic vocab, optional QA CE.

Static-shape jit: text-only / image-only / V&L batches (the hybrid training
mix, ``lxmert_pretrain.py:86-173``) are distinct programs selected by which
inputs are present — each source's batches have one fixed shape.

The symbolic embedding covers 1600 objects + 400 attributes + CLS/SEP/MASK
(``symbolic_vocabulary.py:3-40``); its decoder is weight-tied the same way
the MLM head ties to word embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models import losses
from visualbert_tpu.models.encoder import (
    Pooler,
    TransformerEncoder,
    mask_to_bias,
    truncated_normal_init,
)
from visualbert_tpu.models.heads import MLMTransform

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UnsupervisedConfig:
    """VisualConfig-equivalent (modeling.py:141-188) + task switches."""

    bert: VisualBertConfig = dataclasses.field(default_factory=VisualBertConfig.base)
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    obj_id_num: int = 1600
    attr_id_num: int = 400
    symbolic_vocab_size: int = 2003
    num_answers: int = 9500
    visual_loss_weight: float = 1.0 / 0.15
    task_mask_lm: bool = True
    task_matched: bool = True
    task_obj_predict: bool = True
    task_qa: bool = False
    joint_layer_norm: bool = False
    divide_by_2: bool = True
    # Reference ``use_bert_input_for_tags`` (modeling.py:583-586, 1440-1446;
    # set in configs/pretrain/unsupervised.json): tags are embedded with the
    # WORD table and the masked-tag objective reuses the MLM ``cls`` head over
    # the 30522-way wordpiece vocab instead of the 2003-way symbolic head.
    use_bert_input_for_tags: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class ThreeStreamEmbeddings(nn.Module):
    config: UnsupervisedConfig

    def setup(self):
        ucfg = self.config
        cfg = ucfg.bert
        init = truncated_normal_init(cfg.initializer_range)
        embed = lambda n, name, axis0: nn.Embed(
            n, cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.with_partitioning(init, (axis0, "embed")), name=name,
        )
        self.word_embeddings = embed(cfg.vocab_size, "word_embeddings", "vocab")
        self.position_embeddings = embed(cfg.max_position_embeddings, "position_embeddings", "pos")
        self.token_type_embeddings = embed(cfg.type_vocab_size, "token_type_embeddings", "types")
        self.symbolic_embedding = embed(ucfg.symbolic_vocab_size, "symbolic_embedding", "vocab")

        dense = lambda indim_name, name: nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(init, (indim_name, "embed")), name=name,
        )
        self.visn_fc = dense("visual_in", "visn_fc")
        self.box_fc = dense("visual_in", "box_fc")

        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=cfg.param_dtype, name=name,
        )
        self.text_norm = ln("text_norm")
        self.visn_norm = ln("visn_norm")
        self.box_norm = ln("box_norm")
        self.tag_norm = ln("tag_norm")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(
        self,
        input_ids: Optional[Array],
        token_type_ids: Optional[Array],
        visual_feats: Optional[Array],
        boxes: Optional[Array],
        visual_tags: Optional[Array],
        visual_tags_box: Optional[Array],
        deterministic: bool = True,
    ) -> Array:
        ucfg = self.config
        cfg = ucfg.bert
        parts = []
        if input_ids is not None:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            pos = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None, :]
            text = (
                self.word_embeddings(input_ids)
                + self.position_embeddings(pos)
                + self.token_type_embeddings(token_type_ids)
            )
            if not ucfg.joint_layer_norm:
                text = self.text_norm(text).astype(cfg.dtype)
            parts.append(text)

        if visual_tags is not None:
            if ucfg.use_bert_input_for_tags:
                tag = self.word_embeddings(visual_tags)  # modeling.py:583-584
            else:
                tag = self.symbolic_embedding(visual_tags)
            box = self.box_fc(visual_tags_box.astype(cfg.dtype))
            if not ucfg.joint_layer_norm:
                tag = self.tag_norm(tag).astype(cfg.dtype)
                box = self.box_norm(box).astype(cfg.dtype)
            tag = (tag + box) / 2 if ucfg.divide_by_2 else tag + box
            parts.append(tag)

        if visual_feats is not None:
            x = self.visn_fc(visual_feats.astype(cfg.dtype))
            y = self.box_fc(boxes.astype(cfg.dtype))
            if not ucfg.joint_layer_norm:
                x = self.visn_norm(x).astype(cfg.dtype)
                y = self.box_norm(y).astype(cfg.dtype)
            vis = (x + y) / 2 if ucfg.divide_by_2 else x + y
            parts.append(vis)

        out = jnp.concatenate(parts, axis=1)
        if ucfg.joint_layer_norm:
            out = self.text_norm(out).astype(cfg.dtype)
        return self.dropout(out, deterministic=deterministic)


class VisualObjHead(nn.Module):
    """transform + per-loss decoders (obj/attr/feat) — modeling.py:971-996."""

    config: UnsupervisedConfig

    @nn.compact
    def __call__(self, hidden: Array) -> Dict[str, Array]:
        ucfg = self.config
        cfg = ucfg.bert
        h = MLMTransform(cfg, name="transform")(hidden)
        init = truncated_normal_init(cfg.initializer_range)
        dense = lambda n, name: nn.Dense(
            n, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(init, ("embed", "classes")), name=name,
        )
        return {
            "obj": dense(ucfg.obj_id_num, "obj")(h).astype(jnp.float32),
            "attr": dense(ucfg.attr_id_num, "attr")(h).astype(jnp.float32),
            "feat": dense(ucfg.visual_feat_dim, "feat")(h).astype(jnp.float32),
        }


class AnswerHead(nn.Module):
    """hid → 2·hid → gelu → LN → answers (modeling.py:956-968)."""

    config: UnsupervisedConfig

    @nn.compact
    def __call__(self, pooled: Array) -> Array:
        ucfg = self.config
        cfg = ucfg.bert
        init = truncated_normal_init(cfg.initializer_range)
        x = nn.Dense(cfg.hidden_size * 2, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     kernel_init=nn.with_partitioning(init, ("embed", "mlp")),
                     name="fc1")(pooled)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype, name="norm")(x).astype(cfg.dtype)
        return nn.Dense(ucfg.num_answers, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        kernel_init=nn.with_partitioning(init, ("mlp", "classes")),
                        name="fc2")(x).astype(jnp.float32)


class UnsupervisedVisualBert(nn.Module):
    """Joint model + loss assembly (``LXRTPretraining``, modeling.py:1298-1465).

    Batch keys (all optional except masks for present streams):
      input_ids, token_type_ids, input_mask            [B, Tt]
      visual_feats [B, Nv, Df], boxes [B, Nv, 4], visual_feats_mask [B, Nv]
      obj_labels/attr_labels [B, Nv] int, obj_conf/attr_conf [B, Nv] fp,
      feat_target [B, Nv, Df], feat_mask [B, Nv]
      visual_tags [B, Nt], visual_tags_box [B, Nt, 4], visual_tags_mask,
      visual_tags_objective [B, Nt] (−1 ignore)
      matched_label [B] int, ans [B] int (−1 ignore)
    """

    config: UnsupervisedConfig

    def setup(self):
        ucfg = self.config
        cfg = ucfg.bert
        self.embeddings = ThreeStreamEmbeddings(ucfg, name="embeddings")
        self.encoder = TransformerEncoder(cfg, name="encoder")
        self.pooler = Pooler(cfg, name="pooler")
        self.mlm_transform = MLMTransform(cfg, name="mlm_transform")
        # output-only decoder bias of the tied MLM head (reference
        # BertLMPredictionHead.bias, modeling.py:948 — trained, so required
        # for checkpoint parity)
        self.mlm_bias = self.param(
            "mlm_bias",
            nn.with_partitioning(nn.initializers.zeros_init(), ("vocab",)),
            (cfg.vocab_size,),
            cfg.param_dtype,
        )
        self.seq_relationship = nn.Dense(
            2, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="seq_relationship"
        )
        if ucfg.task_obj_predict:
            self.obj_head = VisualObjHead(ucfg, name="obj_head")
            if not ucfg.use_bert_input_for_tags:
                # symbolic_head (deepcopy of cls, modeling.py:1333-1337):
                # its own transform + bias, decoder tied to symbolic table
                self.tag_transform = MLMTransform(cfg, name="tag_transform")
                self.tag_bias = self.param(
                    "tag_bias",
                    nn.with_partitioning(nn.initializers.zeros_init(), ("vocab",)),
                    (ucfg.symbolic_vocab_size,),
                    cfg.param_dtype,
                )
        if ucfg.task_qa:
            self.answer_head = AnswerHead(ucfg, name="answer_head")

    def __call__(self, batch: Dict[str, Array], deterministic: bool = True) -> Dict[str, Any]:
        ucfg = self.config
        cfg = ucfg.bert
        input_ids = batch.get("input_ids")
        visual_feats = batch.get("visual_feats")
        visual_tags = batch.get("visual_tags")

        masks = []
        if input_ids is not None:
            masks.append(batch["input_mask"])
        if visual_tags is not None:
            masks.append(batch["visual_tags_mask"])
        if visual_feats is not None:
            masks.append(batch["visual_feats_mask"])
        attention_mask = jnp.concatenate(masks, axis=1)

        hidden = self.embeddings(
            input_ids,
            batch.get("token_type_ids"),
            visual_feats,
            batch.get("boxes"),
            visual_tags,
            batch.get("visual_tags_box"),
            deterministic=deterministic,
        )
        bias = mask_to_bias(attention_mask)
        seq_out, _ = self.encoder(hidden, bias, deterministic)
        pooled = self.pooler(seq_out)

        # split back into streams (modeling.py:753-767 _split_with_none)
        Tt = 0 if input_ids is None else input_ids.shape[1]
        Nt = 0 if visual_tags is None else visual_tags.shape[1]
        lang_out = seq_out[:, :Tt] if Tt else None
        tags_out = seq_out[:, Tt : Tt + Nt] if Nt else None
        visn_out = seq_out[:, Tt + Nt :] if visual_feats is not None else None

        out: Dict[str, Any] = {}
        total = 0.0

        word_emb = self.embeddings.word_embeddings.embedding

        def mlm_head(hidden):
            """Tied-decoder MLM head + trained output bias
            (BertLMPredictionHead.forward, modeling.py:950-953)."""
            transformed = self.mlm_transform(hidden)
            return jnp.einsum(
                "bth,vh->btv", transformed, word_emb.astype(cfg.dtype),
                preferred_element_type=jnp.float32,
            ) + self.mlm_bias.astype(jnp.float32)

        if lang_out is not None:
            labels = batch.get("masked_lm_labels")
            matched_logits = self.seq_relationship(pooled).astype(jnp.float32)
            out["matched_logits"] = matched_logits

            # fused streaming softmax-xent over the 30522 decoder (no
            # [B·T, vocab] fp32 logits in HBM); >1-device meshes dispatch
            # through shard_map (rows over data×model) when the rows divide
            from visualbert_tpu.ops.mlm_xent import supports_mesh

            B, T, H = lang_out.shape
            use_fused = (
                cfg.fused_mlm_xent and ucfg.task_mask_lm and labels is not None
                and supports_mesh(B * T, cfg.mesh)
            )
            if use_fused:
                from visualbert_tpu.ops.mlm_xent import mlm_xent

                transformed = self.mlm_transform(lang_out)
                nll, _ = mlm_xent(
                    transformed.reshape(B * T, H),
                    word_emb,
                    self.mlm_bias.astype(jnp.float32),
                    labels.reshape(B * T),
                    mesh=cfg.mesh,
                )
                l = losses.masked_nll_mean(nll, labels)
                out["masked_lm_loss"] = l
                total = total + l
            else:
                mlm_logits = mlm_head(lang_out)
                out["mlm_logits"] = mlm_logits
                if ucfg.task_mask_lm and labels is not None:
                    l = losses.cross_entropy_ignore_index(mlm_logits, labels)
                    out["masked_lm_loss"] = l
                    total = total + l
            if ucfg.task_matched and batch.get("matched_label") is not None:
                l = losses.cross_entropy_ignore_index(matched_logits, batch["matched_label"])
                out["matched_loss"] = l
                total = total + l
            if ucfg.task_qa and batch.get("ans") is not None:
                ans_logits = self.answer_head(pooled)
                out["answer_logits"] = ans_logits
                ans = batch["ans"]
                l = losses.cross_entropy_ignore_index(ans_logits, ans)
                out["qa_loss"] = l
                total = total + l
                # QA co-training accuracy over labeled rows (reference
                # LXMERTEvaluator, lxmert_data.py:892-946)
                valid = ans >= 0
                correct = (jnp.argmax(ans_logits, -1) == ans) & valid
                out["qa_accuracy"] = (
                    correct.sum() / jnp.maximum(valid.sum(), 1)
                ).astype(jnp.float32)

        if (
            ucfg.task_obj_predict
            and visn_out is not None
            and batch.get("obj_labels") is not None
        ):
            preds = self.obj_head(visn_out)
            w = ucfg.visual_loss_weight

            def masked_ce(logits, labels, conf):
                logp = jax.nn.log_softmax(logits, axis=-1)
                safe = jnp.maximum(labels, 0)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                nll = jnp.where(labels >= 0, nll, 0.0)
                return (nll * conf).mean()

            obj_loss = masked_ce(preds["obj"], batch["obj_labels"], batch["obj_conf"]) * w
            attr_loss = masked_ce(preds["attr"], batch["attr_labels"], batch["attr_conf"]) * w
            feat_l = losses.smooth_l1(preds["feat"], batch["feat_target"]).mean(-1)
            feat_loss = (feat_l * batch["feat_mask"]).mean() * w
            out.update(obj_loss=obj_loss, attr_loss=attr_loss, feat_loss=feat_loss)
            total = total + obj_loss + attr_loss + feat_loss

        if (
            ucfg.task_obj_predict
            and tags_out is not None
            and batch.get("visual_tags_objective") is not None
        ):
            if ucfg.use_bert_input_for_tags:
                # reference routes tags through the SAME cls head over the
                # word vocab (modeling.py:1440-1446); labels are wordpiece ids
                tag_logits = mlm_head(tags_out)
            else:
                sym_emb = self.embeddings.symbolic_embedding.embedding
                tag_h = self.tag_transform(tags_out)
                tag_logits = jnp.einsum(
                    "bth,vh->btv", tag_h, sym_emb.astype(cfg.dtype),
                    preferred_element_type=jnp.float32,
                ) + self.tag_bias.astype(jnp.float32)
            l = losses.cross_entropy_ignore_index(tag_logits, batch["visual_tags_objective"])
            out["masked_tag_loss"] = l
            total = total + l

        out["loss"] = total
        out["pooled_output"] = pooled
        return out


class UnsupervisedVQAModel(nn.Module):
    """Fine-tune model: encoder + AnswerHead with BCE-with-logits × answers
    (reference ``vqa_model.py:16-71`` + loss ``tasks/vqa.py:104-107``)."""

    config: UnsupervisedConfig

    def setup(self):
        self.trunk = UnsupervisedVisualBert(
            self.config.replace(task_mask_lm=False, task_matched=False,
                                task_obj_predict=False, task_qa=False),
            name="trunk",
        )
        self.answer_head = AnswerHead(self.config, name="answer_head")

    def __call__(self, batch: Dict[str, Array], deterministic: bool = True):
        trunk_out = self.trunk(batch, deterministic=deterministic)
        logits = self.answer_head(trunk_out["pooled_output"])
        out = {"logits": logits, "loss": None}
        if batch.get("target") is not None:
            # BCEWithLogits mean × num_answers (vqa.py:106-107); weighted by
            # example_weight so pad_final eval batches stay exact
            w = batch.get("example_weight")
            l = losses.binary_cross_entropy_with_logits(
                logits, batch["target"], weights=w
            )
            out["loss"] = l * logits.shape[-1]
            scores = jnp.take_along_axis(
                batch["target"], jnp.argmax(logits, -1)[:, None], axis=1
            )[:, 0]
            out["accuracy"] = losses.weighted_mean(scores, w)
        return out
