"""Export → HF torch roundtrip: our params exported to a torch state dict
load into HF VisualBertModel and reproduce our outputs; plus NaN-guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.models.encoder import VisualBertModel
from visualbert_tpu.tools.export_torch import export_state_dict
from visualbert_tpu.train.trainer import unbox

SMALL = dict(
    vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
    visual_embedding_dim=20,
)


@pytest.mark.slow
def test_export_roundtrip_through_hf(rng):
    cfg = VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        dtype=jnp.float32,
    )
    model = VisualBertModel(cfg)
    ids = jnp.asarray(rng.randint(0, 99, (2, 8)), jnp.int32)
    vis = jnp.asarray(rng.randn(2, 4, 20), jnp.float32)
    params = unbox(model.init(jax.random.PRNGKey(3), ids, None, None, vis, None, None)["params"])
    seq, pool, _ = model.apply({"params": params}, ids, None, None, vis, None, None)

    sd = export_state_dict({"bert": params}, cfg, prefix="")
    hf_cfg = transformers.VisualBertConfig(
        **SMALL, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    hf = transformers.VisualBertModel(hf_cfg).eval()
    # rename our reference-layout keys into HF's visual_bert naming
    renames = {
        "embeddings.projection.": "embeddings.visual_projection.",
        "embeddings.token_type_embeddings_visual.": "embeddings.visual_token_type_embeddings.",
        "embeddings.position_embeddings_visual.": "embeddings.visual_position_embeddings.",
    }
    hf_sd = {}
    for k, v in sd.items():
        for old, new in renames.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        hf_sd[k] = torch.tensor(v)
    missing, unexpected = hf.load_state_dict(hf_sd, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(np.asarray(ids), dtype=torch.long),
            visual_embeds=torch.tensor(np.asarray(vis)),
            visual_token_type_ids=torch.zeros(2, 4, dtype=torch.long),
        )
    np.testing.assert_allclose(
        np.asarray(seq), ref.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_nan_guard_skips_bad_batch(rng):
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    cfg = VisualBertConfig.tiny(visual_embedding_dim=8, hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)
    model = VisualBertForTask(cfg, head_type="nlvr")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=1e-3, schedule=None, t_total=-1),
        train_config=TrainConfig(nan_guard=True),
        mesh=create_mesh((8, 1)),
    )
    B, T, V = 8, 6, 4
    good = {
        "input_ids": rng.randint(0, cfg.vocab_size, size=(B, T)).astype(np.int32),
        "input_mask": np.ones((B, T), np.int32),
        "visual_embeddings": rng.randn(B, V, 8).astype(np.float32),
        "image_mask": np.ones((B, V), np.int32),
        "label": rng.randint(0, 2, size=B).astype(np.int32),
    }
    bad = dict(good, visual_embeddings=np.full((B, V, 8), np.nan, np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), good)
    step = trainer.train_step_fn()
    key = jax.random.PRNGKey(1)
    p0 = jax.tree.map(np.asarray, state.params)
    state, m = step(state, trainer.shard_batch(bad), key)
    assert float(m["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, m = step(state, trainer.shard_batch(good), key)
    assert float(m["skipped_nonfinite"]) == 0.0
    changed = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params))
    )
    assert changed
