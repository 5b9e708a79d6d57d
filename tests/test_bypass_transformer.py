"""bypass_transformer path (reference modeling.py:1299-1314): text runs the
full encoder alone, then ONE additional joint layer over [text ; visual]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.config import VisualBertConfig
from visualbert_tpu.models.encoder import VisualBertModel
from visualbert_tpu.train.trainer import unbox


@pytest.mark.slow
def test_bypass_path_runs_and_differs(rng):
    cfg = VisualBertConfig.tiny(visual_embedding_dim=8, bypass_transformer=True)
    model = VisualBertModel(cfg)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 6)), jnp.int32)
    vis = jnp.asarray(rng.randn(2, 3, 8), jnp.float32)
    mask = jnp.ones((2, 9), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, None, mask, vis, None, None)
    params = unbox(variables["params"])
    assert "additional_layer" in params
    seq, pooled, _ = model.apply({"params": params}, ids, None, mask, vis, None, None)
    assert seq.shape == (2, 9, cfg.hidden_size)
    assert np.isfinite(np.asarray(seq)).all()

    # text-only positions must equal running the encoder without the visual
    # stream THROUGH the main stack (visual only enters the extra layer)
    cfg2 = cfg.replace(bypass_transformer=False)
    model2 = VisualBertModel(cfg2)
    # gradients flow end-to-end
    def loss(p):
        s, _, _ = model.apply({"params": p}, ids, None, mask, vis, None, None)
        return (s.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
