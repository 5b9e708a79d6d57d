"""Epoch-based training loop with per-epoch eval, metric rollups, patience
early-stop and best-checkpoint tracking — the reference's ``train.py:232-414``
control flow, minus DataParallel bookkeeping.

Datasets are any iterable of ready-to-device numpy batch dicts (see
``data/pipeline.py``). Metrics are global sums/counts — NOT the reference's
mean-of-per-replica-means (``train.py:305-307``), which subtly reweights
uneven batches; documented difference.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from visualbert_tpu.config import TrainConfig
from visualbert_tpu.train.trainer import Trainer
from visualbert_tpu.utils.checkpoint import CheckpointManager
from visualbert_tpu.utils.logging import get_logger

log = get_logger(__name__)


class MetricAccumulator:
    """Weighted running means (weight = batch size)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.weights: Dict[str, float] = {}

    def update(self, metrics: Dict[str, Any], weight: float):
        for k, v in metrics.items():
            try:
                x = float(v)
            except (TypeError, ValueError):
                continue
            self.sums[k] = self.sums.get(k, 0.0) + x * weight
            self.weights[k] = self.weights.get(k, 0.0) + weight

    def means(self) -> Dict[str, float]:
        return {k: self.sums[k] / max(self.weights[k], 1e-12) for k in self.sums}


@dataclasses.dataclass
class FitResult:
    best_metric: float
    best_epoch: int
    epochs_run: int
    history: list


def fit(
    trainer: Trainer,
    state,
    train_data: Callable[[int], Iterable[Dict[str, np.ndarray]]],
    eval_data: Optional[Callable[[], Iterable[Dict[str, np.ndarray]]]] = None,
    *,
    config: Optional[TrainConfig] = None,
    checkpoint_dir: Optional[str] = None,
    val_metric: str = "accuracy",
    val_metric_higher_is_better: bool = True,
    eval_hook: Optional[Callable[[Dict[str, np.ndarray], Dict], Dict[str, float]]] = None,
    rng_seed: int = 0,
):
    """Run the full fit loop; returns (state, FitResult).

    train_data(epoch) / eval_data() build fresh batch iterators.
    eval_hook(batch, model_out) -> extra metric dict (e.g. task evaluators).
    """
    cfg = config or trainer.train_config
    step_fn = trainer.train_step_fn()
    eval_fn = trainer.eval_step_fn() if eval_data is not None else None
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    key = jax.random.key(rng_seed, impl="rbg")

    best = -np.inf if val_metric_higher_is_better else np.inf
    best_epoch = -1
    history = []

    try:
        state, best, best_epoch = _fit_epochs(
            trainer, state, train_data, eval_data, cfg, ckpt, key,
            val_metric, val_metric_higher_is_better, eval_hook,
            eval_fn, step_fn, history, best, best_epoch,
        )
    except (KeyboardInterrupt, Exception):
        # checkpoint-on-failure, then re-raise (reference train.py:404-414)
        if ckpt is not None:
            path = ckpt.save(int(jax.device_get(state.step)), state)
            log.warning("interrupted/failed — checkpoint saved to %s", path)
        raise

    return state, FitResult(
        best_metric=float(best), best_epoch=best_epoch,
        epochs_run=len(history), history=history,
    )


def _fit_epochs(trainer, state, train_data, eval_data, cfg, ckpt, key,
                val_metric, val_metric_higher_is_better, eval_hook,
                eval_fn, step_fn, history, best, best_epoch):
    K = max(1, cfg.steps_per_dispatch)
    multi_fn = (
        trainer.multi_step_fn(K, unroll=min(3, K), device_stack=True)
        if K > 1 else None
    )

    for epoch in range(cfg.num_train_epochs):
        acc = MetricAccumulator()
        t0 = time.time()
        n_batches = 0
        accum = cfg.gradient_accumulation_steps
        pending = []  # buffered host batches awaiting a K-step dispatch
        pending_sig = None  # structure signature of the buffered batches

        def batch_size(batch):
            return len(next(
                v for k, v in batch.items()
                if v is not None and not k.startswith("_")
            ))

        def reshape_accum(batch, bs):
            if accum <= 1:
                return batch
            # split the global batch into [accum, micro, ...] for the
            # in-step lax.scan accumulation (train/trainer.py); "_" keys are
            # host-side metadata, passed through untouched
            return {
                k: v if v is None or k.startswith("_")
                else v.reshape((accum, bs // accum) + v.shape[1:])
                for k, v in batch.items()
            }

        def after_steps(metrics, n_new, weight):
            nonlocal n_batches
            prev = n_batches
            n_batches += n_new
            acc.update(metrics, weight)
            if cfg.log_every and prev // cfg.log_every != n_batches // cfg.log_every:
                m = acc.means()
                log.info(
                    "epoch %d step %d loss=%.4f (%.2f s/batch)",
                    epoch, n_batches, m.get("loss", float("nan")),
                    (time.time() - t0) / n_batches,
                )
            if (ckpt and cfg.save_every
                    and prev // cfg.save_every != n_batches // cfg.save_every):
                ckpt.save(int(jax.device_get(state.step)), state)

        # one-dispatch metric deferral: materializing a dispatch's scalar
        # metrics (float()) blocks on its compute, so the rollup of dispatch
        # N is read only after dispatch N+1 has been issued — its input
        # transfers then overlap N's device time (double-buffered dispatch)
        deferred = None

        def flush_deferred():
            nonlocal deferred
            if deferred is not None:
                d, deferred = deferred, None
                after_steps(*d)

        def defer_steps(metrics, n_new, weight):
            nonlocal deferred
            assert deferred is None
            deferred = (metrics, n_new, weight)

        def dispatch_pending():
            nonlocal state, pending
            group, pending = pending, []
            bs = batch_size(group[0])
            if len(group) == K:
                # per-batch async device_put; the [K, ...] stack happens on
                # device inside multi_fn (no host K-batch materialization)
                device_group = [
                    trainer.shard_batch(reshape_accum(b, bs), stacked=accum > 1)
                    for b in group
                ]
                state, metrics = multi_fn(state, device_group, key)
                flush_deferred()
                # metrics arrive stacked [K]; fold to means for the rollup
                metrics = {k: v.mean(0) for k, v in metrics.items()}
                defer_steps(metrics, len(group), bs * len(group))
            else:  # epoch tail shorter than K: fall back to per-step dispatch
                for b in group:
                    b = reshape_accum(b, bs)
                    state, metrics = step_fn(
                        state, trainer.shard_batch(b, stacked=accum > 1), key
                    )
                    flush_deferred()
                    defer_steps(metrics, 1, bs)

        for batch in train_data(epoch):
            if multi_fn is None:
                bs = batch_size(batch)
                batch = reshape_accum(batch, bs)
                state, metrics = step_fn(
                    state, trainer.shard_batch(batch, stacked=accum > 1), key
                )
                flush_deferred()
                defer_steps(metrics, 1, bs)
            else:
                # hybrid sources interleave differently-shaped batches (e.g.
                # text-only vs V&L) — only structurally identical batches can
                # stack into one dispatch, so flush on a structure change
                sig = tuple(sorted(
                    (k, getattr(v, "shape", None), str(getattr(v, "dtype", "")))
                    for k, v in batch.items()
                ))
                if pending and sig != pending_sig:
                    dispatch_pending()
                pending_sig = sig
                pending.append(batch)
                if len(pending) == K:
                    dispatch_pending()
        if pending:
            dispatch_pending()
        flush_deferred()

        epoch_metrics = {"train_" + k: v for k, v in acc.means().items()}

        if eval_fn is not None:
            eacc = MetricAccumulator()
            for batch in eval_data():
                # real (non-tail-pad-duplicate) example count — model scalars
                # are example_weight-weighted means, so this weight makes the
                # epoch rollup exact (see data/pipeline.py Batcher pad_final).
                # _real_count is the GLOBAL count (multi-host launches feed
                # per-host slices whose local counts differ on the tail batch)
                if "_real_count" in batch:
                    bs = float(batch["_real_count"])
                elif "example_weight" in batch:
                    bs = float(np.sum(batch["example_weight"]))
                else:
                    bs = len(next(iter(batch.values())))
                out = eval_fn(state.params, trainer.shard_batch(batch))
                scalars = {
                    k: v for k, v in out.items()
                    if hasattr(v, "ndim") and v.ndim == 0
                }
                if eval_hook is not None:
                    scalars.update(eval_hook(batch, jax.device_get(out)))
                eacc.update(scalars, bs)
            epoch_metrics.update({"val_" + k: v for k, v in eacc.means().items()})

        history.append(epoch_metrics)
        log.info("epoch %d: %s", epoch, {k: round(v, 4) for k, v in epoch_metrics.items()})

        current = epoch_metrics.get("val_" + val_metric)
        improved = current is not None and (
            current > best if val_metric_higher_is_better else current < best
        )
        if improved:
            best = current
            best_epoch = epoch
        if ckpt:
            ckpt.save(int(jax.device_get(state.step)), state, is_best=improved)

        # patience early-stop on the best validation epoch (train.py:398-400)
        if current is not None and epoch - best_epoch >= cfg.patience:
            log.info("early stop at epoch %d (best %.4f @ %d)", epoch, best, best_epoch)
            break

    return state, best, best_epoch
