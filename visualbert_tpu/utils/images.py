"""Image loading for the end-to-end detector path (reference:
``visualbert/dataloaders/box_utils.py:12-74`` load/resize/normalize).

Images are resized so the long side equals ``target`` and normalized with
the torchvision ImageNet statistics the reference backbone was trained with.
Output is NHWC float32 (TPU layout).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(path: str) -> np.ndarray:
    """[H, W, 3] uint8 RGB."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_image(img: np.ndarray, target: int = 768) -> Tuple[np.ndarray, float]:
    """Resize long side to ``target`` (bilinear); returns (image, scale)."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = target / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pil = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    return np.asarray(pil), scale


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 RGB → normalized float32."""
    return (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def prepare_image(
    path: str, target: int = 768, pad_square: bool = True
) -> Dict[str, np.ndarray]:
    """Load → resize → normalize → (optionally) pad to target×target.
    Returns {"image", "scale", "height", "width"} — boxes in original pixel
    coords multiply by ``scale`` to match."""
    raw = load_image(path)
    resized, scale = resize_image(raw, target)
    norm = normalize_image(resized)
    h, w = norm.shape[:2]
    if pad_square:
        out = np.zeros((target, target, 3), np.float32)
        out[:h, :w] = norm
        norm = out
    return {
        "image": norm,
        "scale": np.float32(scale),
        "height": np.int32(h),
        "width": np.int32(w),
    }


class ImageFolderStore:
    """FeatureStore-compatible reader for the VCR raw-image path: each
    ``<image_id>.jpg`` plus a ``<image_id>.json`` metadata file holding
    {"boxes": [[x1,y1,x2,y2,...], ...], "names": [...], "segms": [...]} in
    ORIGINAL pixel coordinates (the VCR release layout)."""

    def __init__(self, folder: str, target: int = 768,
                 class_names: Optional[Sequence[str]] = None):
        self.folder = folder
        self.target = target
        self.class_to_id = (
            {n: i for i, n in enumerate(class_names)} if class_names else None
        )

    def __contains__(self, image_id: str) -> bool:
        import os

        return os.path.exists(f"{self.folder}/{image_id}.jpg")

    def get(self, image_id: str) -> Dict[str, np.ndarray]:
        import json

        prep = prepare_image(f"{self.folder}/{image_id}.jpg", self.target)
        with open(f"{self.folder}/{image_id}.json") as f:
            meta = json.load(f)
        boxes = np.asarray(meta["boxes"], np.float32)[:, :4] * float(prep["scale"])
        names = meta.get("names", ["person"] * len(boxes))
        if self.class_to_id:
            classes = np.asarray([self.class_to_id.get(n, 0) for n in names], np.int32)
        else:
            classes = np.zeros(len(boxes), np.int32)
        out = {
            "image": prep["image"],
            "boxes": boxes,
            "classes": classes,
            # true content extent inside the square padding — the full-image
            # window box must cover this, not the padded canvas
            "height": prep["height"],
            "width": prep["width"],
        }
        if "segms" in meta:
            from visualbert_tpu.utils.boxes import make_mask

            segms = []
            for polys, box in zip(meta["segms"], boxes):
                segms.append(make_mask([np.asarray(p) for p in polys], box))
            out["segms"] = np.stack(segms) if segms else np.zeros((0, 14, 14), np.float32)
        return out
