"""Param layout conversions (scan ⇄ unrolled) and reference-name checkpoint
import (bert.-prefixed, gamma/beta LayerNorm names, module. wrappers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models.encoder import VisualBertModel
from visualbert_tpu.tools.import_torch import convert_state_dict, merge_into
from visualbert_tpu.tools.params import stack_layers, unstack_layers
from visualbert_tpu.train.trainer import unbox

CFG = VisualBertConfig.tiny(visual_embedding_dim=8)


def _init(cfg):
    model = VisualBertModel(cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 6)), jnp.int32)
    vis = jnp.asarray(rng.randn(2, 3, 8), jnp.float32)
    params = unbox(model.init(jax.random.PRNGKey(0), ids, None, None, vis, None, None)["params"])
    return model, params, ids, vis


@pytest.mark.slow
def test_unstack_stack_roundtrip_and_equivalence():
    model_s, p_s, ids, vis = _init(CFG)
    model_u = VisualBertModel(CFG.replace(scan_layers=False))
    p_u = unstack_layers(p_s)
    s1, _, _ = model_s.apply({"params": p_s}, ids, None, None, vis, None, None)
    s2, _, _ = model_u.apply({"params": p_u}, ids, None, None, vis, None, None)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    p_back = stack_layers(jax.tree.map(np.asarray, p_u))
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_style_names():
    """A state dict with the reference's exact naming (bert. prefix, vendored
    module names, gamma/beta, DataParallel module. wrapper) converts and
    loads."""
    torch = pytest.importorskip("torch")
    cfg = CFG
    H, nh, hd, I = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim, cfg.intermediate_size
    rng = np.random.RandomState(1)

    sd = {}
    def put(name, shape):
        sd[name] = rng.randn(*shape).astype(np.float32)

    put("module.bert.embeddings.word_embeddings.weight", (cfg.vocab_size, H))
    put("module.bert.embeddings.position_embeddings.weight", (cfg.max_position_embeddings, H))
    put("module.bert.embeddings.token_type_embeddings.weight", (2, H))
    put("module.bert.embeddings.token_type_embeddings_visual.weight", (2, H))
    put("module.bert.embeddings.position_embeddings_visual.weight", (cfg.max_position_embeddings, H))
    put("module.bert.embeddings.projection.weight", (H, 8))
    put("module.bert.embeddings.projection.bias", (H,))
    put("module.bert.embeddings.LayerNorm.gamma", (H,))
    put("module.bert.embeddings.LayerNorm.beta", (H,))
    for i in range(cfg.num_hidden_layers):
        p = f"module.bert.encoder.layer.{i}"
        for n in ("query", "key", "value"):
            put(f"{p}.attention.self.{n}.weight", (H, H))
            put(f"{p}.attention.self.{n}.bias", (H,))
        put(f"{p}.attention.output.dense.weight", (H, H))
        put(f"{p}.attention.output.dense.bias", (H,))
        put(f"{p}.attention.output.LayerNorm.gamma", (H,))
        put(f"{p}.attention.output.LayerNorm.beta", (H,))
        put(f"{p}.intermediate.dense.weight", (I, H))
        put(f"{p}.intermediate.dense.bias", (I,))
        put(f"{p}.output.dense.weight", (H, I))
        put(f"{p}.output.dense.bias", (H,))
        put(f"{p}.output.LayerNorm.gamma", (H,))
        put(f"{p}.output.LayerNorm.beta", (H,))
    put("module.bert.pooler.dense.weight", (H, H))
    put("module.bert.pooler.dense.bias", (H,))

    loaded = convert_state_dict(sd, cfg)
    model, params, ids, vis = _init(cfg)
    merged = merge_into(params, loaded["bert"])
    emb = merged["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(
        np.asarray(emb), sd["module.bert.embeddings.word_embeddings.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(merged["embeddings"]["norm"]["scale"]),
        sd["module.bert.embeddings.LayerNorm.gamma"],
    )
    # fused qkv slot 1 == key weights of layer 0, torch layout transposed
    qkv = np.asarray(merged["encoder"]["layers"]["attention"]["qkv"]["kernel"])
    ref_k = sd["module.bert.encoder.layer.0.attention.self.key.weight"].T.reshape(H, nh, hd)
    np.testing.assert_array_equal(qkv[0, :, 1], ref_k)
    # model runs with the merged tree
    out, _, _ = model.apply({"params": merged}, ids, None, None, vis, None, None)
    assert np.isfinite(np.asarray(out)).all()


def test_merge_shape_mismatch_raises():
    model, params, *_ = _init(CFG)
    bad = {"embeddings": {"word_embeddings": {"embedding": np.zeros((3, 3), np.float32)}}}
    with pytest.raises(ValueError):
        merge_into(params, bad)
