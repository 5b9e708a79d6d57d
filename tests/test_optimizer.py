"""BertAdam parity vs a straight numpy transcription of the reference
algorithm (optimization.py:248-302): per-tensor clip → EMA moments (no bias
correction) → decoupled weight decay → schedule multiplier at pre-increment
step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualbert_tpu.train.optimizer import bert_adam, default_decay_mask, make_schedule


def numpy_bert_adam_steps(params, grads_seq, lr, warmup, t_total, schedule,
                          b1=0.9, b2=0.999, eps=1e-6, wd=0.01, max_norm=1.0,
                          decay_mask=None):
    params = {k: v.copy() for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v = {k: np.zeros_like(p) for k, p in params.items()}
    step = 0

    def sched(s):
        if schedule is None or t_total < 0:
            return 1.0
        progress = s / t_total
        if schedule == "warmup_linear":
            if progress < warmup:
                return progress / warmup
            return max((progress - 1.0) / (warmup - 1.0), 0.0)
        if schedule == "warmup_constant":
            return progress / warmup if progress < warmup else 1.0
        raise ValueError(schedule)

    for grads in grads_seq:
        for k in params:
            g = grads[k].astype(np.float64)
            if max_norm > 0:
                norm = np.sqrt((g ** 2).sum())
                coef = max_norm / (norm + 1e-6)
                if coef < 1:
                    g = g * coef
            m[k] = b1 * m[k] + (1 - b1) * g
            v[k] = b2 * v[k] + (1 - b2) * g * g
            upd = m[k] / (np.sqrt(v[k]) + eps)
            if wd > 0 and (decay_mask is None or decay_mask[k]):
                upd = upd + wd * params[k]
            params[k] = params[k] - lr * sched(step) * upd
        step += 1
    return params


@pytest.mark.parametrize("schedule,t_total", [("warmup_linear", 100), (None, -1)])
def test_bert_adam_matches_reference(rng, schedule, t_total):
    params = {
        "kernel": rng.randn(4, 8).astype(np.float64),
        "bias": rng.randn(8).astype(np.float64),
    }
    grads_seq = [
        {"kernel": rng.randn(4, 8).astype(np.float64) * s, "bias": rng.randn(8).astype(np.float64) * s}
        for s in (0.1, 5.0, 1.0, 0.01, 2.0)  # include one that triggers clipping
    ]
    decay_mask = {"kernel": True, "bias": False}

    expected = numpy_bert_adam_steps(
        params, grads_seq, lr=1e-2, warmup=0.1, t_total=t_total,
        schedule=schedule, decay_mask=decay_mask,
    )

    tx = bert_adam(
        learning_rate=1e-2, schedule=schedule, warmup=0.1, t_total=t_total,
        decay_mask=decay_mask,
    )
    p = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    state = tx.init(p)
    for grads in grads_seq:
        g = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), grads)
        updates, state = tx.update(g, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, updates)

    for k in params:
        np.testing.assert_allclose(np.asarray(p[k]), expected[k], atol=1e-5, rtol=1e-4)


def test_first_warmup_step_is_zero_lr(rng):
    """Reference quirk: the schedule is evaluated at step=0 before increment,
    so the first update is a no-op under warmup (optimization.py:291-296)."""
    tx = bert_adam(learning_rate=1.0, schedule="warmup_linear", warmup=0.1, t_total=10)
    p = {"w": jnp.ones((3,))}
    state = tx.init(p)
    updates, state = tx.update({"w": jnp.full((3,), 0.5)}, state, p)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0, atol=1e-8)
    # second step: multiplier = (1/10)/0.1 = 1.0
    updates, state = tx.update({"w": jnp.full((3,), 0.5)}, state, p)
    assert np.abs(np.asarray(updates["w"])).max() > 0.1


def test_schedule_shapes():
    sched = make_schedule("warmup_linear", 0.1, 100)
    s = np.array([float(sched(jnp.asarray(i))) for i in [0, 5, 10, 50, 100]])
    np.testing.assert_allclose(s, [0.0, 0.5, 1.0, 5 / 9, 0.0], atol=1e-6)
    sched = make_schedule("warmup_constant", 0.2, 50)
    assert float(sched(jnp.asarray(40))) == 1.0
    sched = make_schedule("warmup_cosine", 0.0, 100)
    np.testing.assert_allclose(float(sched(jnp.asarray(50))), 0.5, atol=1e-6)


def test_default_decay_mask():
    params = {
        "bert": {
            "encoder": {"layers": {"attention": {"query": {"kernel": 1, "bias": 2}}}},
            "embeddings": {"norm": {"scale": 3, "bias": 4}, "word_embeddings": {"embedding": 5}},
        },
        "cls": {"decoder_bias": 6},
    }
    mask = default_decay_mask(params)
    assert mask["bert"]["encoder"]["layers"]["attention"]["query"]["kernel"] is True
    assert mask["bert"]["encoder"]["layers"]["attention"]["query"]["bias"] is False
    assert mask["bert"]["embeddings"]["norm"]["scale"] is False
    assert mask["bert"]["embeddings"]["word_embeddings"]["embedding"] is True
    assert mask["cls"]["decoder_bias"] is False


def test_frozen_params():
    from visualbert_tpu.config import OptimizerConfig
    from visualbert_tpu.train.optimizer import from_config

    tx = from_config(OptimizerConfig(
        learning_rate=1e-2, schedule=None, t_total=-1, frozen=("pooler",)
    ))
    params = {"pooler": {"dense": {"kernel": jnp.ones((2, 2))}},
              "cls": {"kernel": jnp.ones((2, 2))}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.abs(np.asarray(updates["pooler"]["dense"]["kernel"])).max() == 0
    assert np.abs(np.asarray(updates["cls"]["kernel"])).max() > 0
