"""End-to-end training-trajectory parity: our jitted train step (model +
BertAdam) vs torch (HF VisualBertForPreTraining + a faithful torch BertAdam)
from identical weights on identical batches, dropout off, fp32.

This certifies gradients AND optimizer semantics jointly — if either
diverged, the loss sequences would separate within a few steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.models.visualbert import VisualBertForTask
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.tools.import_torch import convert_state_dict, merge_into
from visualbert_tpu.train.trainer import Trainer

SMALL = dict(
    vocab_size=120,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=32,
    type_vocab_size=2,
    visual_embedding_dim=16,
)
B, TT, TV = 8, 10, 5
LR, WD, CLIP = 1e-3, 0.01, 1.0


def torch_bert_adam_step(named_params, lr=LR, wd=WD, clip=CLIP, state=None):
    """Reference BertAdam semantics (optimization.py:248-302), torch."""
    state = state or {}
    no_decay = ("bias", "LayerNorm.weight", "LayerNorm.bias")
    for name, p in named_params:
        if p.grad is None:
            continue
        g = p.grad.data
        st = state.setdefault(name, {
            "m": torch.zeros_like(p.data), "v": torch.zeros_like(p.data),
        })
        if clip > 0:
            norm = g.norm()
            coef = clip / (norm + 1e-6)
            if coef < 1:
                g = g * coef
        st["m"].mul_(0.9).add_(g, alpha=0.1)
        st["v"].mul_(0.999).addcmul_(g, g, value=0.001)
        upd = st["m"] / (st["v"].sqrt() + 1e-6)
        if wd > 0 and not any(nd in name for nd in no_decay):
            upd = upd + wd * p.data
        p.data.add_(upd, alpha=-lr)
    return state


def make_batches(rng, n_steps):
    batches = []
    for s in range(n_steps):
        lm = np.full((B, TT), -1, np.int64)
        pos = rng.randint(1, TT - 1, size=(B, 2))
        for i in range(B):
            lm[i, pos[i]] = rng.randint(0, SMALL["vocab_size"], size=2)
        batches.append({
            "input_ids": rng.randint(0, SMALL["vocab_size"], size=(B, TT)).astype(np.int64),
            "token_type_ids": np.zeros((B, TT), np.int64),
            "input_mask": np.ones((B, TT), np.int64),
            "visual": rng.randn(B, TV, SMALL["visual_embedding_dim"]).astype(np.float32),
            "image_mask": np.ones((B, TV), np.int64),
            "lm_labels": lm,
            "is_random_next": rng.randint(0, 2, size=B).astype(np.int64),
        })
    return batches


def torch_losses(hf, batches, n_steps):
    """HF VisualBertForPreTraining computes the same MLM+alignment losses.

    HF sums MLM CE (ignore -100) and the sentence-image CE exactly like the
    reference (labels padded with -100 over visual positions)."""
    state = None
    losses = []
    for b in batches:
        hf.zero_grad()
        labels_full = np.full((B, TT + TV), -100, np.int64)
        labels_full[:, :TT] = np.where(b["lm_labels"] < 0, -100, b["lm_labels"])
        out = hf(
            input_ids=torch.tensor(b["input_ids"]),
            attention_mask=torch.tensor(b["input_mask"]),
            token_type_ids=torch.tensor(b["token_type_ids"]),
            visual_embeds=torch.tensor(b["visual"]),
            visual_attention_mask=torch.tensor(b["image_mask"]),
            visual_token_type_ids=torch.zeros(B, TV, dtype=torch.long),
            labels=torch.tensor(labels_full),
            sentence_image_labels=torch.tensor(b["is_random_next"]),
        )
        out.loss.backward()
        losses.append(float(out.loss.detach()))
        state = torch_bert_adam_step(list(hf.named_parameters()), state=state)
    return losses


@pytest.mark.slow
def test_three_step_trajectory_matches_torch(rng):
    n_steps = 3
    batches = make_batches(rng, n_steps)

    hf_cfg = transformers.VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    torch.manual_seed(0)
    hf = transformers.VisualBertForPreTraining(hf_cfg)
    hf.train()

    cfg = VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.float32,
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=LR, schedule=None, t_total=-1,
            weight_decay=WD, max_grad_norm=CLIP,
        ),
        train_config=TrainConfig(log_every=0),
        mesh=create_mesh((8, 1)),
    )

    def to_batch(b):
        return {
            "input_ids": b["input_ids"].astype(np.int32),
            "token_type_ids": b["token_type_ids"].astype(np.int32),
            "input_mask": b["input_mask"].astype(np.int32),
            "visual_embeddings": b["visual"],
            "image_mask": b["image_mask"].astype(np.int32),
            "masked_lm_labels": b["lm_labels"].astype(np.int32),
            "is_random_next": b["is_random_next"].astype(np.int32),
        }

    state = trainer.init_state(jax.random.PRNGKey(0), to_batch(batches[0]))
    # import the torch weights (cls heads included; decoder tie structural)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd = {k.replace("visual_bert.", "bert."): v for k, v in sd.items()}
    loaded = convert_state_dict(sd, cfg)
    params = merge_into(state.params, loaded)
    state = state.replace(params=params)

    step = trainer.train_step_fn()
    ours = []
    key = jax.random.PRNGKey(1)
    for b in batches:
        state, metrics = step(state, trainer.shard_batch(to_batch(b)), key)
        ours.append(float(metrics["loss"]))

    theirs = torch_losses(hf, batches, n_steps)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
