"""Loss functions matching the reference's torch loss semantics exactly.

All take fp32 logits and return fp32 scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_nll_mean(nll, labels, ignore_index: int = -1):
    """Mean of per-position NLLs over labels != ignore_index (the reduction
    of ``torch.nn.CrossEntropyLoss(ignore_index=-1)`` applied to
    already-computed NLLs — the fused-xent kernels return those)."""
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    count = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll.reshape(-1), 0.0).sum() / count


def cross_entropy_ignore_index(logits: Array, labels: Array, ignore_index: int = -1) -> Array:
    """``torch.nn.CrossEntropyLoss(ignore_index=-1)``: mean NLL over the
    positions whose label != ignore_index (reference modeling.py:1470-1485)."""
    logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count


def weighted_mean(values: Array, weights) -> Array:
    """Mean of per-example ``values`` under optional per-example ``weights``
    (1.0 real / 0.0 tail-pad duplicate — see data/pipeline.py Batcher
    pad_final). ``weights=None`` is the plain mean."""
    values = values.astype(jnp.float32)
    if weights is None:
        return values.mean()
    w = weights.astype(jnp.float32)
    return (values * w).sum() / jnp.maximum(w.sum(), 1e-12)


def cross_entropy(logits: Array, labels: Array, weights=None) -> Array:
    """``torch.nn.CrossEntropyLoss()`` — mean over batch (weighted when the
    batch carries example_weight)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return weighted_mean(nll, weights)


def kl_div_batchmean(log_probs: Array, target: Array, weights=None) -> Array:
    """``torch.nn.KLDivLoss(reduction='batchmean')``: sum of
    target*(log(target)-log_probs) over all elements / batch size, with the
    0*log(0)=0 convention (reference modeling.py:1517-1521). ``weights``
    generalizes the /B to a weighted per-example mean."""
    log_probs = log_probs.astype(jnp.float32)
    target = target.astype(jnp.float32)
    safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-30)), 0.0)
    elt = jnp.where(target > 0, target * (safe_log_t - log_probs), 0.0)
    per_example = elt.reshape(elt.shape[0], -1).sum(axis=-1)
    return weighted_mean(per_example, weights)


def binary_cross_entropy_with_logits(logits: Array, target: Array, weights=None) -> Array:
    """``torch.nn.BCEWithLogitsLoss()`` — mean over all elements
    (unsupervised stack VQA loss, tasks/vqa.py:106). ``weights`` drops
    zero-weight rows from the mean."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return weighted_mean(loss.reshape(loss.shape[0], -1).mean(axis=-1), weights)


def smooth_l1(pred: Array, target: Array) -> Array:
    """Elementwise ``torch.nn.SmoothL1Loss(reduction='none')`` (beta=1)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def vqa_accuracy_scores(logits: Array, soft_labels: Array) -> Array:
    """Reference ``compute_score_with_logits`` (modeling.py:1697-1703):
    softmax, zero out class 0 (<unk>), renormalize, argmax, read off the soft
    label mass at the argmax. Returns per-example scores."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.at[:, 0].set(0.0)
    probs = probs / jnp.maximum(probs.sum(axis=1, keepdims=True), 1e-12)
    pred = jnp.argmax(probs, axis=-1)
    return jnp.take_along_axis(soft_labels, pred[:, None], axis=1)[:, 0]
