"""Fused residual+LayerNorm kernel vs XLA reference (fwd + grads, interpret
mode on CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from visualbert_tpu.ops.layer_norm import (
    fused_add_layer_norm,
    reference_add_layer_norm,
)


def make(rng, N=24, H=64, dtype=jnp.float32):
    x = jnp.asarray(rng.randn(N, H), dtype)
    r = jnp.asarray(rng.randn(N, H), dtype)
    scale = jnp.asarray(rng.rand(H) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    return x, r, scale, bias


def test_forward_matches_reference(rng):
    x, r, scale, bias = make(rng)
    out = fused_add_layer_norm(x, r, scale, bias)
    ref = reference_add_layer_norm(x, r, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_3d_shape(rng):
    x = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    r = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    scale = jnp.ones(64)
    bias = jnp.zeros(64)
    out = fused_add_layer_norm(x, r, scale, bias)
    assert out.shape == (2, 8, 64)
    ref = reference_add_layer_norm(x, r, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_reference(rng):
    x, r, scale, bias = make(rng, N=16)

    def loss_fused(x, r, s, b):
        return (fused_add_layer_norm(x, r, s, b).astype(jnp.float32) ** 2).sum()

    def loss_ref(x, r, s, b):
        return (reference_add_layer_norm(x, r, s, b).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, r, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, r, scale, bias)
    for name, a, b in zip(["dx", "dres", "dscale", "dbias"], gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


@pytest.mark.slow
def test_model_parity_with_fused_ln(rng):
    """Full tiny model: fused-LN config matches default config numerics."""
    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.encoder import VisualBertModel
    from visualbert_tpu.train.trainer import unbox

    ids = jnp.asarray(rng.randint(0, 512, (2, 8)), jnp.int32)
    vis = jnp.asarray(rng.randn(2, 4, 8), jnp.float32)
    cfg = VisualBertConfig.tiny(visual_embedding_dim=8)
    m1 = VisualBertModel(cfg)
    params = unbox(m1.init(jax.random.PRNGKey(0), ids, None, None, vis, None, None)["params"])
    m2 = VisualBertModel(cfg.replace(use_fused_layer_norm=True))
    s1, p1, _ = m1.apply({"params": params}, ids, None, None, vis, None, None)
    s2, p2, _ = m2.apply({"params": params}, ids, None, None, vis, None, None)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5, rtol=1e-5)


def test_fused_dropout_add_ln_rate0_matches(rng):
    """rate=0 path of the dropout-fused epilogue == plain fused add+LN."""
    import jax.numpy as jnp

    from visualbert_tpu.ops.layer_norm import (
        fused_dropout_add_layer_norm,
        reference_add_layer_norm,
    )

    x = jnp.asarray(rng.randn(16, 64), jnp.float32)
    r = jnp.asarray(rng.randn(16, 64), jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    seed = jnp.asarray([3], jnp.int32)
    out = fused_dropout_add_layer_norm(x, r, scale, bias, seed, 0.0)
    ref = reference_add_layer_norm(x, r, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g = jax.grad(lambda x: (fused_dropout_add_layer_norm(x, r, scale, bias, seed, 0.0) ** 2).sum())(x)
    gr = jax.grad(lambda x: (reference_add_layer_norm(x, r, scale, bias) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4, rtol=1e-3)
