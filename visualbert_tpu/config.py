"""Typed configuration for the TPU-native VisualBERT framework.

The reference scatters configuration across an argparse/commentjson ``AttrDict``
read at import time (reference: ``visualbert/models/model_wrapper.py:234-244``,
``unsupervised_visualbert/src/param.py:113-121``) and even inside model
``forward`` bodies. For jit purity everything here is an explicit, hashable,
frozen dataclass resolved *before* tracing.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VisualBertConfig:
    """Model hyper-parameters.

    Mirrors the semantics of the reference ``BertConfig``
    (``visualbert/pytorch_pretrained_bert/modeling.py:71-158``) plus the
    visual-stream extensions threaded through ``TrainVisualBERTObjective``
    (``modeling.py:1335-1371``).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12

    # Visual stream (reference: modeling.py:1169-1257).
    visual_embedding_dim: int = 2048

    # `bypass_transformer`: text runs the full encoder alone, then one extra
    # joint layer over [text ; visual] (reference: modeling.py:1299-1314).
    bypass_transformer: bool = False

    # Collect per-layer attention probabilities (ACL-2020 probing pipeline,
    # reference: modeling.py:1316-1324). Forces the unrolled encoder.
    output_attention_weights: bool = False

    # --- TPU execution knobs (no analogue in the reference) ---
    dtype: Any = jnp.bfloat16          # activation/compute dtype
    param_dtype: Any = jnp.float32     # parameter dtype
    remat: bool = False                # rematerialize encoder layers
    use_flash_attention: bool = False  # Pallas fused attention kernel
    # With the flash kernel: keep the QKV projection in its matmul-natural
    # packed [B, T, 3·H·D] layout and slice heads inside the kernel (full
    # MXU-width matmuls, no [B,3,H,T,D] relayout copies).
    packed_qkv: bool = True
    # scan_layers=True: one traced layer, weights stacked on a leading axis
    # (fast compile; canonical checkpoint layout). False: unrolled layers —
    # slower compile but removes the scan's dynamic-update-slice copies of
    # every backward residual (~20% step time at BERT-base).
    scan_layers: bool = True
    # fused residual+LayerNorm Pallas kernel (apex FusedLayerNorm analogue)
    use_fused_layer_norm: bool = False
    # Save only the FFN pre-activation for backward; recompute gelu there.
    # Halves the FFN intermediate's HBM writes (numerics unchanged).
    ffn_recompute_act: bool = True
    # FFN-backward variant: save the POST-activation and the analytic
    # gelu'(x) (computed nearly free in forward — it shares the A&S erf
    # chain's exp(-x²/2)) instead of the pre-activation, so the backward's
    # dpreact is a pure multiply with no erf-chain recompute. Trades one
    # extra [N, intermediate] bf16 HBM round-trip for the recompute VPU
    # tail; only meaningful with ffn_recompute_act and the fast-erf gelu.
    # Measured on v5e (BASELINE.md round-5 lever table) — keep default off.
    ffn_save_dact: bool = False
    # Flash-attention backward strategy: save the pre-dropout probability
    # tensor in fwd (bf16, ~2·H·T² bytes/row HBM) instead of recomputing
    # QKᵀ+softmax in bwd. Trades HBM for VPU exp time; off by default.
    flash_save_probs: bool = False
    # Fused MLM softmax-xent Pallas kernel (ops/mlm_xent.py): streams the
    # 30522-wide decoder through VMEM with an online logsumexp instead of
    # materializing fp32 [N, vocab] logits (and their cotangent) in HBM.
    # Loss/grad numerics match the unfused path; per-token logits are then
    # not available in the output dict (metrics use the kernel's argmax).
    fused_mlm_xent: bool = False
    # Hidden-state dropout via a Pallas mask kernel (ops/dropout.py): writes
    # an int8 {0,1} mask straight from the on-chip PRNG instead of XLA's
    # u32-bits → relayout → pred chain (~3 HBM round trips/site).
    # Same Bernoulli distribution + gradient as nn.Dropout; different bits.
    fast_dropout: bool = False
    # The (data, model) jax.sharding.Mesh the model will run under. REQUIRED
    # when use_flash_attention=True on >1 device: pallas_call has no GSPMD
    # partitioning rule, so the kernel is dispatched via shard_map over this
    # mesh. None (default) = single-device dispatch.
    mesh: Any = None

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    def replace(self, **kw) -> "VisualBertConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def base(cls, **kw) -> "VisualBertConfig":
        """bert-base-uncased geometry — what every reference config uses."""
        return cls(**kw)

    @classmethod
    def large(cls, **kw) -> "VisualBertConfig":
        """bert-large geometry — not used by the reference configs, but the
        scale where the TP mesh axis starts paying for itself."""
        defaults = dict(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def tiny(cls, **kw) -> "VisualBertConfig":
        """A small config for CPU tests."""
        defaults = dict(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
            dtype=jnp.float32,
        )
        defaults.update(kw)
        return cls(**defaults)

    def to_json(self) -> str:
        d = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.name != "mesh"  # runtime object, not serializable config
        }
        d["dtype"] = jnp.dtype(self.dtype).name
        d["param_dtype"] = jnp.dtype(self.param_dtype).name
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "VisualBertConfig":
        d = json.loads(text)
        for k in ("dtype", "param_dtype"):
            if k in d:
                d[k] = jnp.dtype(d[k])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# Head types understood by the objective dispatcher
# (reference: modeling.py:1352-1371, 1465-1598).
HEAD_TYPES = (
    "pretraining",
    "multichoice",
    "vqa",
    "vqa_advanced",
    "nlvr",
    "flickr",
)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """BertAdam-compatible optimizer settings.

    Reference: ``visualbert/pytorch_pretrained_bert/optimization.py:185-302``
    and the parameter-grouping rules in ``model_wrapper.py:100-139``.
    """

    learning_rate: float = 5e-5
    schedule: str = "warmup_linear"  # none | warmup_constant | warmup_cosine | warmup_linear
    warmup: float = 0.1              # fraction of t_total; -1 disables
    t_total: int = -1                # total update steps; -1 → constant multiplier 1
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-6
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0       # per-parameter clip inside the step; -1 disables
    # Parameters whose *name* contains any of these strings get no weight decay
    # (reference: model_wrapper.py:106-110).
    no_decay: Tuple[str, ...] = ("bias", "layer_norm", "LayerNorm")
    # Parameters whose name contains any of these are excluded from training
    # (reference excludes the pooler for pretraining, model_wrapper.py:104).
    # None = task default (the COCO-caption pretraining tasks freeze the
    # pooler, reference model_wrapper.py:104; other tasks add nothing);
    # () = explicitly train everything.
    frozen: Optional[Tuple[str, ...]] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop settings (reference: train.py:64-115 argparse surface)."""

    train_batch_size: int = 32
    eval_batch_size: int = 32
    num_train_epochs: int = 10
    gradient_accumulation_steps: int = 1
    patience: int = 100000           # early stop patience (train.py:398-400)
    seed: int = 42
    save_every: Optional[int] = None  # mid-epoch checkpoint cadence
    log_every: int = 100
    # Host-pipeline threads fetching each batch's samples (0 = sequential).
    # Deterministic at any worker count (per-sample index-derived RNG); the
    # TPU analogue of the reference DataLoader's num_workers.
    num_workers: int = 8
    # Fuse K train steps into one device dispatch (lax.scan over K stacked
    # batches, body unrolled 3x): amortizes host->device round trips AND
    # lets XLA overlap step i's optimizer write-back with step i+1's
    # prefetches (+2.4% on v5e, BASELINE.md). 1 = per-step dispatch.
    steps_per_dispatch: int = 1
    # Mesh geometry: (data, model) axis sizes; model=1 → pure DP.
    mesh_shape: Tuple[int, int] = (1, 1)
    # skip the update when the loss is non-finite (in-graph failure guard;
    # the reference has no equivalent — a NaN batch corrupts the run)
    nan_guard: bool = False
    # XLA compiler options for the jitted step (TPU only). None → the
    # measured-best default (scoped-VMEM 32 MB: deeper Mosaic kernel
    # buffers, +1%% step throughput); {} disables.
    compiler_options: Optional[dict] = None
