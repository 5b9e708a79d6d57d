"""BertAdam-compatible optimizer as a custom optax transform.

The reference fine-tuning trajectories depend on three quirks of ``BertAdam``
(``visualbert/pytorch_pretrained_bert/optimization.py:185-302``) that
``optax.adamw`` does NOT reproduce:

  1. **No bias correction** — update is ``m / (sqrt(v) + eps)`` from step 0.
  2. **Per-parameter gradient clipping inside the step** — each parameter
     tensor's gradient is clipped to ``max_grad_norm`` independently
     (optimization.py:272-273), not a global norm.
  3. **Schedule multiplier evaluated at the pre-increment step count** — the
     very first update uses ``sched(0)`` (0 for warmup schedules).

Weight decay is decoupled (added to the update after the moment estimates,
optimization.py:288-289) and masked per-parameter: names containing "bias" /
LayerNorm get none (``model_wrapper.py:106-110``).

All math is fp32 regardless of compute dtype; state is fp32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

from visualbert_tpu.config import OptimizerConfig


# --- LR schedules (reference optimization.py:83-182) ---
# Each returns the multiplier for a given step, as a traced fp32 scalar.

def make_schedule(name: Optional[str], warmup: float, t_total: int) -> Callable:
    warmup = max(float(warmup), 0.0)

    if name in (None, "none") or t_total < 0:
        return lambda step: jnp.float32(1.0)

    t_total_f = float(t_total)

    if name == "warmup_constant":
        def fn(step):
            progress = step.astype(jnp.float32) / t_total_f
            return jnp.where(progress < warmup, progress / max(warmup, 1e-12), 1.0)
        return fn

    if name == "warmup_linear":
        def fn(step):
            progress = step.astype(jnp.float32) / t_total_f
            warm = progress / max(warmup, 1e-12)
            decay = jnp.maximum((progress - 1.0) / (warmup - 1.0), 0.0)
            return jnp.where(progress < warmup, warm, decay)
        return fn

    if name == "warmup_cosine":
        cycles = 0.5

        def fn(step):
            progress = step.astype(jnp.float32) / t_total_f
            warm = progress / max(warmup, 1e-12)
            after = (progress - warmup) / (1.0 - warmup)
            cos = 0.5 * (1.0 + jnp.cos(math.pi * cycles * 2.0 * after))
            return jnp.where(progress < warmup, warm, cos)
        return fn

    raise ValueError(f"unknown schedule {name}")


class BertAdamState(NamedTuple):
    step: jax.Array
    m: Any
    v: Any


def _clip_by_own_norm(g: jax.Array, max_norm: float, stacked: bool = False) -> jax.Array:
    """torch.nn.utils.clip_grad_norm_ on a single tensor.

    ``stacked`` marks scan-stacked parameters ([L, ...] with one slice per
    encoder layer): the reference optimizer sees L separate tensors and clips
    each independently, so the norm is taken per leading index.
    """
    g32 = g.astype(jnp.float32)
    if stacked:
        axes = tuple(range(1, g.ndim))
        norm = jnp.sqrt(jnp.sum(jnp.square(g32), axis=axes, keepdims=True))
    else:
        norm = jnp.sqrt(jnp.sum(jnp.square(g32)))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return g * scale


def _is_stacked_path(path) -> bool:
    return any(getattr(k, "key", None) == "layers" for k in path)


def bert_adam(
    learning_rate: float,
    schedule: Optional[str] = "warmup_linear",
    warmup: float = -1,
    t_total: int = -1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    decay_mask: Optional[Union[Any, Callable]] = None,
) -> optax.GradientTransformation:
    """decay_mask: pytree of bools matching params (True → apply weight
    decay), or a callable params→pytree. None → decay everything."""

    sched = make_schedule(schedule, warmup, t_total)

    def init(params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros, v=jax.tree.map(jnp.copy, zeros))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("bert_adam requires params")
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        if max_grad_norm > 0:
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: _clip_by_own_norm(
                    g, max_grad_norm, stacked=_is_stacked_path(path)
                ),
                grads,
            )
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
        upd = jax.tree.map(lambda m_, v_: m_ / (jnp.sqrt(v_) + eps), m, v)

        if weight_decay > 0:
            mask = decay_mask(params) if callable(decay_mask) else decay_mask
            if mask is None:
                mask = jax.tree.map(lambda _: True, params)
            upd = jax.tree.map(
                lambda u, p, use: u + weight_decay * p.astype(jnp.float32) if use else u,
                upd,
                params,
                mask,
            )

        lr_t = learning_rate * sched(state.step)
        updates = jax.tree.map(lambda u, p: (-lr_t * u).astype(p.dtype), upd, params)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


def default_decay_mask(params) -> Any:
    """True (decay) except for biases and LayerNorm scales/biases — the
    reference's no_decay list ['bias', 'gamma', 'beta']
    (model_wrapper.py:106-110) translated to our param names."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        joined = "/".join(str(p) for p in path).lower()
        is_no_decay = (
            joined.endswith("/bias")
            or joined.endswith("/scale")
            or "norm" in joined
            or "decoder_bias" in joined
        )
        return not is_no_decay

    return walk(params, ())


def frozen_mask(params, frozen_substrings) -> Any:
    """True for parameters whose '/'-joined path contains any listed
    substring — the reference excludes e.g. the pooler from pretraining
    optimization (model_wrapper.py:104)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        joined = "/".join(str(p) for p in path)
        return any(s in joined for s in frozen_substrings)

    return walk(params, ())


def from_config(opt_cfg: OptimizerConfig, decay_mask=None) -> optax.GradientTransformation:
    if decay_mask is None:
        extra = tuple(s.lower() for s in opt_cfg.no_decay)

        def decay_mask(params):
            base = default_decay_mask(params)

            def walk(tree, mask, path):
                if isinstance(tree, dict):
                    return {k: walk(v, mask[k], path + (k,)) for k, v in tree.items()}
                joined = "/".join(str(p) for p in path).lower()
                return mask and not any(s in joined for s in extra)

            return walk(params, base, ())

    tx = bert_adam(
        learning_rate=opt_cfg.learning_rate,
        schedule=opt_cfg.schedule,
        warmup=opt_cfg.warmup,
        t_total=opt_cfg.t_total,
        b1=opt_cfg.b1,
        b2=opt_cfg.b2,
        eps=opt_cfg.eps,
        weight_decay=opt_cfg.weight_decay,
        max_grad_norm=opt_cfg.max_grad_norm,
        decay_mask=decay_mask,
    )
    if opt_cfg.frozen:
        inner_update = tx.update

        def update(grads, state, params=None):
            updates, new_state = inner_update(grads, state, params)
            fm = frozen_mask(params, opt_cfg.frozen)
            updates = jax.tree.map(
                lambda u, f: jnp.zeros_like(u) if f else u, updates, fm
            )
            return updates, new_state

        tx = optax.GradientTransformation(tx.init, update)
    return tx


def reset_schedule(opt_state):
    """Warm-start surgery (reference
    ``unsupervised_visualbert/src/pretrain/lxmert_pretrain.py:455-473``):
    keep the Adam moments but zero the schedule step counter, so a model
    fine-tuned from a mid-pretrain checkpoint restarts its warmup instead
    of inheriting the pretrain schedule position. Works on a bare
    ``BertAdamState`` or any pytree containing them (optax chains)."""
    import jax.numpy as jnp

    def fix(s):
        if isinstance(s, BertAdamState):
            return s._replace(step=jnp.zeros_like(s.step))
        return s

    return jax.tree.map(fix, opt_state, is_leaf=lambda x: isinstance(x, BertAdamState))
