"""Fast dropout-mask kernel (ops/dropout.py): distribution, determinism,
gradient equivalence with nn.Dropout semantics, and the encoder wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.ops.dropout import dropout_mask, fast_dropout


def test_mask_distribution_and_values():
    rate = 0.1
    m = np.asarray(dropout_mask((512, 768), rate, jnp.int32(7), jnp.float32))
    inv = 1.0 / (1.0 - rate)
    vals = np.unique(m)
    assert len(vals) == 2 and vals[0] == 0.0 and abs(vals[1] - inv) < 1e-5, vals
    keep_frac = (m > 0).mean()
    assert abs(keep_frac - (1 - rate)) < 0.01, keep_frac
    # E[mask] == 1 (unbiased)
    assert abs(m.mean() - 1.0) < 0.02


def test_mask_deterministic_and_seed_dependent():
    a = np.asarray(dropout_mask((64, 128), 0.5, jnp.int32(3)))
    b = np.asarray(dropout_mask((64, 128), 0.5, jnp.int32(3)))
    c = np.asarray(dropout_mask((64, 128), 0.5, jnp.int32(4)))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_mask_3d_matches_shape():
    m = np.asarray(dropout_mask((4, 228, 64), 0.1, jnp.int32(1)))
    assert m.shape == (4, 228, 64)
    # every batch row gets its own bits (program-id salted seeds)
    assert (m[0] != m[1]).any()


def test_fast_dropout_gradient_is_masked_identity():
    x = jnp.ones((8, 32), jnp.float32) * 2.0
    rate = 0.5

    def f(x):
        return fast_dropout(x, rate, jnp.int32(11)).sum()

    g = jax.grad(f)(x)
    y = fast_dropout(x, rate, jnp.int32(11))
    # grad equals the mask itself (d(x*m)/dx = m), exactly as nn.Dropout
    np.testing.assert_allclose(np.asarray(g) * 2.0, np.asarray(y), rtol=1e-6)


@pytest.mark.slow
def test_encoder_fast_dropout_trains():
    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask

    cfg = VisualBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, visual_embedding_dim=16,
        fast_dropout=True, scan_layers=False,
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    rng = np.random.RandomState(0)
    B, Tt, Tv = 2, 8, 4
    lm = np.full((B, Tt), -1, np.int32)
    lm[:, 2] = 5
    batch = {
        "input_ids": rng.randint(0, 128, size=(B, Tt)).astype(np.int32),
        "token_type_ids": np.zeros((B, Tt), np.int32),
        "input_mask": np.ones((B, Tt), np.int32),
        "visual_embeddings": rng.randn(B, Tv, 16).astype(np.float32),
        "image_mask": np.ones((B, Tv), np.int32),
        "masked_lm_labels": lm,
        "mlm_positions": np.tile(np.array([[1, 2, 3]], np.int32), (B, 1)),
        "is_random_next": np.zeros((B,), np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=False,
    )["params"]
    out = model.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out["loss"]))
    # dropout active: two rng keys give different losses
    out2 = model.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert float(out["loss"]) != float(out2["loss"])
