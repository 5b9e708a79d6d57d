"""Param-tree layout conversions between the scanned encoder (weights
stacked on a leading ``layers`` axis — the canonical checkpoint layout) and
the unrolled encoder (per-layer ``layer_i`` subtrees)."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def _find_encoders(tree: Dict, path=()):
    """Yield (path, encoder_subtree) for every 'encoder' node."""
    if not isinstance(tree, dict):
        return
    for k, v in tree.items():
        if k == "encoder" and isinstance(v, dict) and ("layers" in v or "layer_0" in v):
            yield path + (k,), v
        elif isinstance(v, dict):
            yield from _find_encoders(v, path + (k,))


def unstack_layers(params: Dict) -> Dict:
    """stacked {'encoder': {'layers': {...[L, ...]...}}} →
    {'encoder': {'layer_0': {...}, ...}} (copies views, no data dup)."""

    def convert(enc):
        stacked = enc["layers"]
        L = jax.tree.leaves(stacked)[0].shape[0]
        out = {k: v for k, v in enc.items() if k != "layers"}
        for i in range(L):
            out[f"layer_{i}"] = jax.tree.map(lambda x: x[i], stacked)
        return out

    return _rewrite(params, convert, stacked=True)


def stack_layers(params: Dict) -> Dict:
    """inverse of unstack_layers."""

    def convert(enc):
        idxs = sorted(
            (int(k.split("_")[1]) for k in enc if k.startswith("layer_")),
        )
        per_layer = [enc[f"layer_{i}"] for i in idxs]
        stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_layer)
        out = {k: v for k, v in enc.items() if not k.startswith("layer_")}
        out["layers"] = stacked
        return out

    return _rewrite(params, convert, stacked=False)


def _rewrite(params: Dict, convert, stacked: bool) -> Dict:
    marker = "layers" if stacked else "layer_0"

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "encoder" and isinstance(v, dict) and marker in v:
                out[k] = convert(v)
            else:
                out[k] = walk(v)
        return out

    return walk(params)
