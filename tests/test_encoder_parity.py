"""Golden numerical tests: our Flax encoder vs HuggingFace's torch
``VisualBertModel`` (an independent port of the same reference architecture),
with identical randomly-initialized weights moved through the checkpoint
converter. fp32 end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models.encoder import VisualBertModel
from visualbert_tpu.tools.import_torch import convert_state_dict, merge_into

SMALL = dict(
    vocab_size=99,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=2,
    visual_embedding_dim=20,
)


def build_pair(seed=0):
    hf_cfg = transformers.VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    torch.manual_seed(seed)
    hf = transformers.VisualBertModel(hf_cfg).eval()

    cfg = VisualBertConfig(
        **SMALL,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        dtype=jnp.float32,
    )
    model = VisualBertModel(cfg)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    # convert_state_dict roots everything under "bert"; this model IS the
    # bert trunk, so unwrap.
    loaded = convert_state_dict(state, cfg)["bert"]
    return hf, model, cfg, loaded


def make_inputs(rng, B=2, Tt=10, Tv=7, A=3, with_alignment=False):
    input_ids = rng.randint(0, SMALL["vocab_size"], size=(B, Tt)).astype(np.int32)
    token_type_ids = rng.randint(0, 2, size=(B, Tt)).astype(np.int32)
    attn = np.ones((B, Tt), np.int32)
    attn[0, -2:] = 0
    visual = rng.randn(B, Tv, SMALL["visual_embedding_dim"]).astype(np.float32)
    vmask = np.ones((B, Tv), np.int32)
    vmask[1, -3:] = 0
    vtypes = rng.randint(0, 2, size=(B, Tv)).astype(np.int32)
    align = None
    if with_alignment:
        align = rng.randint(-1, Tt, size=(B, Tv, A)).astype(np.int32)
    return input_ids, token_type_ids, attn, visual, vmask, vtypes, align


@pytest.mark.parametrize(
    "with_alignment", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_forward_parity(rng, with_alignment):
    hf, model, cfg, loaded = build_pair()
    input_ids, tt, attn, visual, vmask, vtypes, align = make_inputs(
        rng, with_alignment=with_alignment
    )

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(attn, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            visual_embeds=torch.tensor(visual),
            visual_attention_mask=torch.tensor(vmask, dtype=torch.long),
            visual_token_type_ids=torch.tensor(vtypes, dtype=torch.long),
            image_text_alignment=(
                torch.tensor(align, dtype=torch.long) if align is not None else None
            ),
        )
    ref_seq = ref.last_hidden_state.numpy()
    ref_pool = ref.pooler_output.numpy()

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(input_ids),
        jnp.asarray(tt),
        jnp.ones((2, input_ids.shape[1] + visual.shape[1]), jnp.int32),
        jnp.asarray(visual),
        jnp.asarray(vtypes),
        jnp.asarray(align) if align is not None else None,
    )
    params = merge_into(variables["params"], loaded)
    full_mask = jnp.concatenate([jnp.asarray(attn), jnp.asarray(vmask)], axis=1)
    seq, pool, _ = model.apply(
        {"params": params},
        jnp.asarray(input_ids),
        jnp.asarray(tt),
        full_mask,
        jnp.asarray(visual),
        jnp.asarray(vtypes),
        jnp.asarray(align) if align is not None else None,
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(seq), ref_seq, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pool), ref_pool, atol=2e-5, rtol=1e-4)


def test_text_only_parity(rng):
    hf, model, cfg, loaded = build_pair(seed=1)
    input_ids, tt, attn, *_ = make_inputs(rng)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(attn, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
        )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(input_ids),
        jnp.asarray(tt),
        jnp.ones((2, input_ids.shape[1] + 7), jnp.int32),
        jnp.ones((2, 7, SMALL["visual_embedding_dim"]), jnp.float32),
        jnp.ones((2, 7), jnp.int32),
        None,
    )
    params = merge_into(variables["params"], loaded)
    seq, pool, _ = model.apply(
        {"params": params},
        jnp.asarray(input_ids),
        jnp.asarray(tt),
        jnp.asarray(attn),
        None,
        None,
        None,
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(seq), ref.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )


def test_attention_probs_exported(rng):
    hf, model, cfg, loaded = build_pair(seed=2)
    input_ids, tt, attn, visual, vmask, vtypes, _ = make_inputs(rng)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(attn, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            visual_embeds=torch.tensor(visual),
            visual_attention_mask=torch.tensor(vmask, dtype=torch.long),
            visual_token_type_ids=torch.tensor(vtypes, dtype=torch.long),
            output_attentions=True,
        )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(input_ids),
        jnp.asarray(tt),
        None,
        jnp.asarray(visual),
        jnp.asarray(vtypes),
        None,
    )
    params = merge_into(variables["params"], loaded)
    full_mask = jnp.concatenate([jnp.asarray(attn), jnp.asarray(vmask)], axis=1)
    seq, pool, probs = model.apply(
        {"params": params},
        jnp.asarray(input_ids),
        jnp.asarray(tt),
        full_mask,
        jnp.asarray(visual),
        jnp.asarray(vtypes),
        None,
        deterministic=True,
        output_attention_probs=True,
    )
    assert probs.shape[0] == SMALL["num_hidden_layers"]
    for i, ref_probs in enumerate(ref.attentions):
        np.testing.assert_allclose(
            np.asarray(probs[i]), ref_probs.numpy(), atol=2e-5, rtol=1e-4
        )
