"""TPU-resident feature extraction — the replacement for the reference's
offline Caffe2/Detectron and BUTD Caffe pipelines (``visualbert/utils/
get_image_features/extract_image_features_nlvr.py``, ``unsupervised_
visualbert/data/*/extract_*_image.py``), which were the only places control
crossed into non-Python native runtimes (SURVEY.md §3.5).

Runs the Flax ResNet50 trunk + RoIAlign per-box head (models/detector.py) on
batches of images with given proposal boxes and writes per-image ``.npy``
feature files that ``NpyFolderFeatures`` reads back. With a detector trained
elsewhere, this closes the loop for end-to-end configs; for BUTD parity the
cached-feature path stays primary.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np


def extract_to_folder(
    images_and_boxes: Iterable[Tuple[str, np.ndarray, np.ndarray]],
    out_dir: str,
    params=None,
    final_dim: int = 2048,
    batch_size: int = 8,
    image_size: int = 768,
    max_boxes: int = 36,
    seed: int = 0,
) -> int:
    """images_and_boxes yields (image_id, image [H,W,3] float, boxes [n,4]).

    Writes ``<out_dir>/<image_id>.npy`` with the per-box 2048-d
    representations (pre-downsample ``obj_reps_raw``). Returns image count.
    """
    import jax
    import jax.numpy as jnp

    from visualbert_tpu.models.detector import SimpleDetector

    os.makedirs(out_dir, exist_ok=True)
    det = SimpleDetector(final_dim=final_dim, semantic=False)

    fwd = None
    params_init = params
    count = 0
    buf = []

    def flush(buf):
        nonlocal fwd, params_init, count
        if not buf:
            return
        B = len(buf)
        images = np.zeros((B, image_size, image_size, 3), np.float32)
        boxes = np.zeros((B, max_boxes, 4), np.float32)
        mask = np.zeros((B, max_boxes), np.int32)
        ids = []
        for i, (image_id, img, bx) in enumerate(buf):
            h, w = img.shape[:2]
            s = image_size / max(h, w)
            # nearest-neighbour resize on host (feature extraction tolerates it)
            yi = np.clip((np.arange(int(h * s)) / s).astype(int), 0, h - 1)
            xi = np.clip((np.arange(int(w * s)) / s).astype(int), 0, w - 1)
            images[i, : len(yi), : len(xi)] = img[yi][:, xi]
            n = min(len(bx), max_boxes)
            boxes[i, :n] = bx[:n] * s
            mask[i, :n] = 1
            ids.append((image_id, n))
        if fwd is None:
            if params_init is None:
                params_init = det.init(
                    {"params": jax.random.PRNGKey(seed)},
                    jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(mask),
                )["params"]
            fwd = jax.jit(
                lambda p, im, bx, m: det.apply(
                    {"params": p}, im, bx, m, deterministic=True
                )["obj_reps_raw"]
            )
        reps = np.asarray(
            fwd(params_init, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(mask)),
            np.float32,
        )
        for i, (image_id, n) in enumerate(ids):
            np.save(os.path.join(out_dir, f"{image_id}.npy"), reps[i, :n])
            count += 1

    for item in images_and_boxes:
        buf.append(item)
        if len(buf) == batch_size:
            flush(buf)
            buf = []
    flush(buf)
    return count
