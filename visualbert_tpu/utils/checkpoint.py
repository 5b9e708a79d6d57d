"""Orbax checkpointing.

Reference behavior being reproduced (``model_wrapper.py:163-221``,
``pytorch_misc.py:110-152``): numbered per-epoch checkpoints plus mid-epoch
step checkpoints, a ``best`` copy tracking the validation metric, resume from
the latest, and prefix-tolerant partial restore for warm starts.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _primary() -> bool:
    return jax.process_index() == 0


def _barrier(name: str):
    """Sync all hosts around non-collective directory mutations (rmtree,
    best-copy, GC) — orbax's save is itself collective, the shutil ops are
    not. No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


class CheckpointManager:
    """Multi-host aware: on a ``jax.distributed`` launch every process calls
    ``save``/``restore`` on the SAME directory (orbax writes each host's
    addressable shards, host 0 the metadata); directory bookkeeping runs on
    process 0 only, fenced by barriers."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    # -- paths --

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    # -- save/restore --

    def save(self, step: int, state: Any, is_best: bool = False) -> str:
        path = self._path(step)
        if _primary() and os.path.exists(path):
            shutil.rmtree(path)
        _barrier(f"ckpt_pre_{step}")
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        _barrier(f"ckpt_post_{step}")
        if _primary():
            if is_best:
                best = os.path.join(self.directory, "best")
                if os.path.exists(best):
                    shutil.rmtree(best)
                shutil.copytree(path, best)
            self._gc()
        _barrier(f"ckpt_done_{step}")
        return path

    def restore(self, target: Any, step: Optional[int] = None, best: bool = False) -> Any:
        if best:
            path = os.path.join(self.directory, "best")
        else:
            if step is None:
                step = self.latest_step()
                if step is None:
                    raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._path(step)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape")
            else x,
            target,
        )
        return self._ckptr.restore(path, abstract)

    def restore_params(self, target_params: Any, step: Optional[int] = None,
                       best: bool = False) -> Any:
        """Params-only warm-start restore (reference ``reset_schedule`` /
        params-only load, ``lxmert_pretrain.py:455-473`` and
        ``load_lxmert_from_pretrain_noqa``, ``qa_answer_table.py:163``):
        read ONLY the checkpoint's ``params`` subtree and merge it into
        ``target_params``, leaving the caller's fresh optimizer state and
        step counter untouched. Tolerant like the reference's flexible
        loaders: leaves missing from the checkpoint or with mismatched
        shapes keep the target's (freshly initialized) value — so a
        fine-tune model with a new head warm-starts its trunk from a
        mid-pretrain checkpoint whose opt_state/heads differ."""
        if best:
            path = os.path.join(self.directory, "best")
        else:
            if step is None:
                step = self.latest_step()
                if step is None:
                    raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._path(step)
        raw = self._ckptr.restore(path)  # as-saved pytree of host arrays
        saved = raw.get("params", raw) if isinstance(raw, dict) else raw

        skipped = []

        def merge(tgt, src, prefix):
            if isinstance(tgt, dict):
                return {
                    k: merge(v, src.get(k) if isinstance(src, dict) else None,
                             prefix + (k,))
                    for k, v in tgt.items()
                }
            if src is None or getattr(src, "shape", None) != getattr(tgt, "shape", None):
                skipped.append("/".join(prefix))
                return tgt
            return jax.numpy.asarray(src, dtype=getattr(tgt, "dtype", None))

        merged = merge(target_params, saved, ())
        return merged, skipped

    def _gc(self):
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(self.directory)
            if (m := re.fullmatch(r"step_(\d+)", name))
        )
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._path(s), ignore_errors=True)
