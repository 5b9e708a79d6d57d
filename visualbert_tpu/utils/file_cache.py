"""Artifact resolution — the reference's ``cached_path``
(``file_utils.py:74-239``: URL/S3 → ``~/.pytorch_pretrained_bert`` cache).

TPU training environments are commonly egress-free, so remote fetching is a
*pluggable* step here: local paths and ``file://`` resolve directly; http(s)
URLs resolve through the cache if present, and only then attempt a download.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Optional
from urllib.parse import urlparse

DEFAULT_CACHE = os.path.expanduser(
    os.environ.get("VISUALBERT_TPU_CACHE", "~/.cache/visualbert_tpu")
)


def cached_path(url_or_path: str, cache_dir: Optional[str] = None) -> str:
    cache_dir = cache_dir or DEFAULT_CACHE
    parsed = urlparse(url_or_path)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else url_or_path
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return path
    if parsed.scheme in ("http", "https", "s3", "gs"):
        os.makedirs(cache_dir, exist_ok=True)
        key = hashlib.sha256(url_or_path.encode()).hexdigest()
        filename = os.path.basename(parsed.path) or "artifact"
        target = os.path.join(cache_dir, f"{key[:16]}_{filename}")
        if os.path.exists(target):
            return target
        return _download(url_or_path, target)
    raise ValueError(f"unsupported scheme: {url_or_path}")


def _download(url: str, target: str) -> str:
    import urllib.request

    tmp = target + ".tmp"
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, target)
        return target
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise IOError(
            f"cannot fetch {url} (offline environment?) — place the file at "
            f"{target} manually or pass a local path"
        ) from e
