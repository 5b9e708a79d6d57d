"""Comment-tolerant JSON config loading → typed dataclasses.

The reference merges commentjson files over argparse into a free-form
AttrDict consumed by ``.get()`` calls everywhere (``model_wrapper.py:
234-244``, ``param.py:113-121``). Here a config file is parsed once into
explicit dataclasses; unknown keys are an error, not a silent default.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, Optional

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig

_TRAILING_COMMA = re.compile(r",\s*([}\]])")


def _strip_comments(text: str) -> str:
    """Remove //- and #-comments outside of strings."""
    out = []
    in_str = False
    escape = False
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if in_str:
            out.append(ch)
            if escape:
                escape = False
            elif ch == "\\":
                escape = True
            elif ch == '"':
                in_str = False
            i += 1
            continue
        if ch == '"':
            in_str = True
            out.append(ch)
            i += 1
            continue
        if ch == "#" or (ch == "/" and i + 1 < n and text[i + 1] == "/"):
            while i < n and text[i] != "\n":
                i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def loads_commented_json(text: str) -> Dict:
    text = _strip_comments(text)
    text = _TRAILING_COMMA.sub(r"\1", text)
    return json.loads(text)


def load_config_file(path: str) -> Dict:
    with open(path) as f:
        return loads_commented_json(f.read())


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Top-level run configuration."""

    task: str                      # vqa | coco_pretrain | nlvr2 | flickr | vcr | unsup_pretrain | unsup_vqa
    folder: str = "runs/default"   # output folder (checkpoints + logs)
    data: Dict[str, Any] = dataclasses.field(default_factory=dict)
    model: VisualBertConfig = dataclasses.field(default_factory=VisualBertConfig.base)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    restore_checkpoint: Optional[str] = None   # torch .th/.pth or orbax dir
    eval_only: bool = False


def _build(dc_cls, d: Dict):
    known = {f.name: f for f in dataclasses.fields(dc_cls)}
    unknown = set(d) - set(known)
    if unknown:
        raise KeyError(f"unknown {dc_cls.__name__} keys: {sorted(unknown)}")
    return dc_cls(**d)


def parse_task_config(raw: Dict, overrides: Optional[Dict] = None) -> TaskConfig:
    raw = dict(raw)
    if overrides:
        raw.update({k: v for k, v in overrides.items() if v is not None})
    model_d = dict(raw.pop("model", {}))
    for k in ("dtype", "param_dtype"):
        if isinstance(model_d.get(k), str):
            import jax.numpy as jnp

            model_d[k] = jnp.dtype(model_d[k])
    if "no_decay" in raw.get("optimizer", {}):
        raw["optimizer"]["no_decay"] = tuple(raw["optimizer"]["no_decay"])
    model = _build(VisualBertConfig, model_d)
    optimizer = _build(OptimizerConfig, raw.pop("optimizer", {}))
    train_d = raw.pop("train", {})
    if "mesh_shape" in train_d:
        train_d["mesh_shape"] = tuple(train_d["mesh_shape"])
    train = _build(TrainConfig, train_d)
    return _build(
        TaskConfig,
        dict(raw, model=model, optimizer=optimizer, train=train),
    )


def load_task_config(path: str, overrides: Optional[Dict] = None) -> TaskConfig:
    return parse_task_config(load_config_file(path), overrides)
