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
