"""Import reference PyTorch checkpoints into the Flax param tree.

Handles three name layouts:
  * the reference repo's vendored BERT (``visualbert/pytorch_pretrained_bert/
    modeling.py`` — task checkpoints ``model_state_epoch_N.th`` / ``best.th``),
  * HuggingFace ``VisualBertModel``/``BertModel`` state dicts,
  * original Google BERT dumps using ``gamma``/``beta`` LayerNorm names
    (handled by the reference at modeling.py:556-568).

The converter is pure numpy — no torch tensor reaches JAX. Weight-tied MLM
decoders are dropped (the tie is structural on our side: the head reuses the
embedding table, heads.py).

Reference ``special_intialize`` (modeling.py:1191-1196) copies the text
token-type/position tables into the visual ones when a checkpoint lacks them;
``maybe_special_initialize`` reproduces that.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from visualbert_tpu.config import VisualBertConfig


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .th/.pth/.bin torch checkpoint into {name: np.ndarray}."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    return {k: v.detach().cpu().numpy() for k, v in state.items() if hasattr(v, "detach")}


_ALIASES = [
    # gamma/beta → weight/bias (reference modeling.py:556-568)
    (r"\.gamma$", ".weight"),
    (r"\.beta$", ".bias"),
    # HF visual_bert naming → reference naming
    (r"embeddings\.visual_projection\.", "embeddings.projection."),
    (r"embeddings\.visual_token_type_embeddings\.", "embeddings.token_type_embeddings_visual."),
    (r"embeddings\.visual_position_embeddings\.", "embeddings.position_embeddings_visual."),
    # HF MLM head naming
    (r"cls\.predictions\.transform\.", "cls.transform."),
    # strip DataParallel / wrapper prefixes
    (r"^module\.", ""),
    (r"^model\.", ""),
]


def _normalize(name: str) -> str:
    for pat, rep in _ALIASES:
        name = re.sub(pat, rep, name)
    return name


def convert_state_dict(
    flat: Dict[str, np.ndarray],
    cfg: VisualBertConfig,
    dtype=np.float32,
) -> Dict:
    """Build the nested Flax param dict from a torch state dict.

    Only keys present in `flat` are emitted — callers merge over an init tree
    for partial/warm-start loads (the analogue of the reference's
    ``load_state_dict_flexible``, pytorch_misc.py:246-265).
    """
    flat = {_normalize(k): np.asarray(v, dtype=dtype) for k, v in flat.items()}
    H = cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_hidden_layers

    out: Dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def linear(prefix):
        w = flat.get(prefix + ".weight")
        b = flat.get(prefix + ".bias")
        return None if w is None else (w.T, b)

    def emb_prefix(name):
        # accept both "bert.embeddings.X" and "embeddings.X"
        for cand in (f"bert.embeddings.{name}", f"embeddings.{name}"):
            if cand + ".weight" in flat or cand + ".bias" in flat:
                return cand
        return None

    # --- embeddings ---
    for src, dst in [
        ("word_embeddings", "word_embeddings"),
        ("position_embeddings", "position_embeddings"),
        ("token_type_embeddings", "token_type_embeddings"),
        ("token_type_embeddings_visual", "token_type_embeddings_visual"),
        ("position_embeddings_visual", "position_embeddings_visual"),
    ]:
        p = emb_prefix(src)
        if p is not None:
            put(("bert", "embeddings", dst, "embedding"), flat[p + ".weight"])
    p = emb_prefix("projection")
    if p is not None:
        kb = linear(p)
        put(("bert", "embeddings", "projection", "kernel"), kb[0])
        put(("bert", "embeddings", "projection", "bias"), kb[1])
    p = emb_prefix("LayerNorm")
    if p is not None:
        put(("bert", "embeddings", "norm", "scale"), flat[p + ".weight"])
        put(("bert", "embeddings", "norm", "bias"), flat[p + ".bias"])

    # --- encoder layers (stacked for nn.scan) ---
    def layer_prefix(i):
        for cand in (f"bert.encoder.layer.{i}", f"encoder.layer.{i}"):
            if cand + ".attention.self.query.weight" in flat:
                return cand
        return None

    if layer_prefix(0) is not None:
        stacks: Dict[tuple, list] = {}

        def stack(path, value):
            stacks.setdefault(path, []).append(value)

        for i in range(L):
            pref = layer_prefix(i)
            assert pref is not None, f"missing encoder layer {i}"
            # q/k/v stacked into the fused projection: [H, 3, nh, hd]
            ws, bs = [], []
            for name in ("query", "key", "value"):
                w, b = linear(f"{pref}.attention.self.{name}")
                ws.append(w.reshape(H, nh, hd))
                bs.append(b.reshape(nh, hd))
            stack(("attention", "qkv", "kernel"), np.stack(ws, axis=1))
            stack(("attention", "qkv", "bias"), np.stack(bs, axis=0))
            w, b = linear(f"{pref}.attention.output.dense")
            stack(("attention", "out", "kernel"), w.reshape(nh, hd, H))
            stack(("attention", "out", "bias"), b)
            stack(("attention_norm", "scale"), flat[f"{pref}.attention.output.LayerNorm.weight"])
            stack(("attention_norm", "bias"), flat[f"{pref}.attention.output.LayerNorm.bias"])
            w, b = linear(f"{pref}.intermediate.dense")
            stack(("intermediate", "kernel"), w)
            stack(("intermediate", "bias"), b)
            w, b = linear(f"{pref}.output.dense")
            stack(("output", "kernel"), w)
            stack(("output", "bias"), b)
            stack(("output_norm", "scale"), flat[f"{pref}.output.LayerNorm.weight"])
            stack(("output_norm", "bias"), flat[f"{pref}.output.LayerNorm.bias"])

        for path, vals in stacks.items():
            put(("bert", "encoder", "layers") + path, np.stack(vals, axis=0))

    # --- pooler ---
    for cand in ("bert.pooler.dense", "pooler.dense"):
        if cand + ".weight" in flat:
            w, b = linear(cand)
            put(("bert", "pooler", "dense", "kernel"), w)
            put(("bert", "pooler", "dense", "bias"), b)
            break

    # --- pretraining heads ---
    if "cls.transform.dense.weight" in flat:
        w, b = linear("cls.transform.dense")
        put(("cls", "transform", "dense", "kernel"), w)
        put(("cls", "transform", "dense", "bias"), b)
        put(("cls", "transform", "norm", "scale"), flat["cls.transform.LayerNorm.weight"])
        put(("cls", "transform", "norm", "bias"), flat["cls.transform.LayerNorm.bias"])
    if "cls.predictions.bias" in flat:
        put(("cls", "decoder_bias"), flat["cls.predictions.bias"])
    if "cls.seq_relationship.weight" in flat:
        w, b = linear("cls.seq_relationship")
        put(("cls", "seq_relationship", "kernel"), w)
        put(("cls", "seq_relationship", "bias"), b)

    # --- task classifier ---
    if "classifier.weight" in flat:
        w, b = linear("classifier")
        put(("classifier", "dense", "kernel"), w)
        put(("classifier", "dense", "bias"), b)

    # --- flickr attention ---
    if "flickr_attention.query.weight" in flat:
        for name in ("query", "key"):
            w, b = linear(f"flickr_attention.{name}")
            put(("flickr_attention", name, "kernel"), w)
            put(("flickr_attention", name, "bias"), b)

    return out


def maybe_special_initialize(params: Dict) -> Dict:
    """Copy text token-type/position tables into the visual ones when absent
    (reference ``special_intialize``, modeling.py:1191-1196)."""
    emb = params.get("bert", {}).get("embeddings", {})
    if "token_type_embeddings" in emb and "token_type_embeddings_visual" not in emb:
        emb["token_type_embeddings_visual"] = {
            "embedding": np.array(emb["token_type_embeddings"]["embedding"])
        }
    if "position_embeddings" in emb and "position_embeddings_visual" not in emb:
        emb["position_embeddings_visual"] = {
            "embedding": np.array(emb["position_embeddings"]["embedding"])
        }
    return params


def merge_into(init_params: Dict, loaded: Dict, strict: bool = False) -> Dict:
    """Merge a (possibly partial) loaded tree over an init tree, checking
    shapes. Returns a new tree with init leaves replaced where loaded."""
    import jax
    from flax import linen as nn
    from flax.core import unfreeze

    init_params = unfreeze(init_params)

    def walk(init_node, loaded_node, path):
        if not isinstance(loaded_node, dict):
            target = init_node
            shape = (
                target.value.shape if isinstance(target, nn.Partitioned) else target.shape
            )
            if tuple(shape) != tuple(loaded_node.shape):
                raise ValueError(f"shape mismatch at {path}: {shape} vs {loaded_node.shape}")
            import jax.numpy as jnp

            arr = jnp.asarray(
                loaded_node,
                dtype=target.value.dtype if isinstance(target, nn.Partitioned) else target.dtype,
            )
            return target.replace_boxed(arr) if isinstance(target, nn.Partitioned) else arr
        out = dict(init_node)
        for k, v in loaded_node.items():
            if k not in init_node:
                if strict:
                    raise KeyError(f"unexpected key {path + (k,)}")
                continue
            out[k] = walk(init_node[k], v, path + (k,))
        return out

    merged = walk(init_params, loaded, ())
    if strict:
        def count(tree):
            return len(jax.tree.leaves(tree))
        if count(merged) != count(init_params):
            raise ValueError("leaf count changed during merge")
    return merged
