"""Output heads (reference: ``visualbert/pytorch_pretrained_bert/modeling.py``).

* ``MLMTransform`` — dense + gelu + LN (modeling.py:389-401).
* ``PreTrainingHeads`` — tied-weight MLM decoder + NSP classifier
  (modeling.py:404-452). The decoder weight IS the word-embedding table
  (modeling.py:411-414); here the caller passes the embedding matrix in and
  only the output bias is a head parameter, so the tie can never drift.
* ``FlickrAttention`` — single-head QK attention producing entity→region
  scores (modeling.py:1602-1646).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models.encoder import NEG_INF, activation, truncated_normal_init

Array = jax.Array


class MLMTransform(nn.Module):
    config: VisualBertConfig

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        cfg = self.config
        x = nn.Dense(
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range), ("embed", "embed_out")
            ),
            name="dense",
        )(hidden)
        x = activation(cfg.hidden_act, cfg.dtype)(x)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=jnp.float32,
            param_dtype=cfg.param_dtype,
            name="norm",
        )(x)
        return x.astype(cfg.dtype)


class PreTrainingHeads(nn.Module):
    """MLM (weight-tied) + sentence-image alignment (NSP-shaped) heads.

    With ``cfg.fused_mlm_xent`` and ``labels`` given, the MLM branch returns
    per-token (nll, argmax) from the fused Pallas softmax-xent kernel and no
    logits tensor; otherwise it returns fp32 logits as the reference does.
    """

    config: VisualBertConfig

    @nn.compact
    def __call__(
        self,
        sequence_output: Array,
        pooled_output: Array,
        word_embedding: Array,
        labels: Array = None,
    ):
        cfg = self.config
        transformed = MLMTransform(cfg, name="transform")(sequence_output)
        bias = self.param(
            "decoder_bias",
            nn.with_partitioning(nn.initializers.zeros_init(), ("vocab",)),
            (cfg.vocab_size,),
            cfg.param_dtype,
        )
        bias = bias.astype(jnp.float32) if isinstance(bias, jax.Array) else bias
        nsp_logits = nn.Dense(
            2,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range), ("embed", "classes")
            ),
            name="seq_relationship",
        )(pooled_output).astype(jnp.float32)

        # >1-device meshes dispatch the xent pallas_call via shard_map (rows
        # over data×model); fall back to the unfused einsum only when the
        # rows don't divide over the mesh
        from visualbert_tpu.ops.mlm_xent import supports_mesh

        B, P, H = transformed.shape
        if cfg.fused_mlm_xent and labels is not None and supports_mesh(B * P, cfg.mesh):
            from visualbert_tpu.ops.mlm_xent import mlm_xent

            nll, am = mlm_xent(
                transformed.reshape(B * P, H),
                word_embedding,
                bias,
                labels.reshape(B * P),
                mesh=cfg.mesh,
            )
            return None, nsp_logits, nll.reshape(B, P), am.reshape(B, P)

        # big vocab matmul: bf16 inputs, fp32 accumulation
        mlm_logits = (
            jnp.einsum(
                "bth,vh->btv",
                transformed,
                word_embedding.astype(cfg.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        return mlm_logits, nsp_logits, None, None


class FlickrAttention(nn.Module):
    """Entity-grounding scorer: 1-head scaled QK attention over the visual
    tokens, padded regions masked to -10000 (reference modeling.py:1602-1646;
    note the reference keeps head_size = hidden/num_heads while using 1 head)."""

    config: VisualBertConfig

    @nn.compact
    def __call__(self, entity_states: Array, visual_states: Array, image_mask: Array):
        cfg = self.config
        head_dim = cfg.head_dim  # reference quirk: scale uses hidden/num_heads
        init = truncated_normal_init(cfg.initializer_range)
        dense = lambda name: nn.Dense(
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(init, ("embed", "embed_out")),
            name=name,
        )
        q = dense("query")(entity_states)      # [B, E, H]
        k = dense("key")(visual_states)        # [B, Tv, H]
        scores = jnp.einsum("beh,bvh->bev", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        bias = (1.0 - image_mask.astype(jnp.float32)) * NEG_INF
        return scores + bias[:, None, :]


class Classifier(nn.Module):
    """Dropout + linear classifier over pooled output (vqa/nlvr/multichoice
    heads, reference modeling.py:1355-1366)."""

    config: VisualBertConfig
    num_classes: int

    @nn.compact
    def __call__(self, pooled: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        x = nn.Dropout(rate=cfg.hidden_dropout_prob)(pooled, deterministic=deterministic)
        return nn.Dense(
            self.num_classes,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                truncated_normal_init(cfg.initializer_range), ("embed", "classes")
            ),
            name="dense",
        )(x).astype(jnp.float32)
