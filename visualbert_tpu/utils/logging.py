"""Logging with an optional run-folder tee (the reference tees stdout to
``run_N.log`` — train.py:97-115; here it's a std logging FileHandler)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_CONFIGURED = False


def get_logger(name: str = "visualbert_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
        )
        root = logging.getLogger("visualbert_tpu")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name)


def add_run_folder(folder: str) -> str:
    """Create the run folder and tee logs into run_N.log (first free N)."""
    os.makedirs(folder, exist_ok=True)
    n = 0
    while os.path.exists(os.path.join(folder, f"run_{n}.log")):
        n += 1
    path = os.path.join(folder, f"run_{n}.log")
    handler = logging.FileHandler(path)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    )
    logging.getLogger("visualbert_tpu").addHandler(handler)
    return path


def params_summary(params, max_rows: int = 0) -> str:
    """Human-readable parameter table + total count (the reference's
    ``print_para``, pytorch_misc.py:346-360)."""
    import numpy as np

    rows = []
    total = 0

    def walk(tree, path):
        nonlocal total
        if isinstance(tree, dict):
            for k in sorted(tree):
                walk(tree[k], path + (k,))
            return
        arr = getattr(tree, "value", tree)
        n = int(np.prod(arr.shape)) if arr.shape else 1
        total += n
        rows.append(("/".join(path), tuple(arr.shape), n))

    walk(params, ())
    shown = rows if not max_rows else rows[:max_rows]
    lines = [f"{name:<70} {str(shape):<24} {n:>12,}" for name, shape, n in shown]
    if max_rows and len(rows) > max_rows:
        lines.append(f"... {len(rows) - max_rows} more")
    lines.append(f"{'TOTAL':<70} {'':<24} {total:>12,}")
    return "\n".join(lines)
