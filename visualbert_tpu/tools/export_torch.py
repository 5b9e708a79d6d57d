"""Export Flax params to a reference-layout torch state dict — the inverse
of ``import_torch`` — so checkpoints trained here load into the reference
PyTorch code (or HuggingFace's VisualBert) for comparison/serving.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from visualbert_tpu.config import VisualBertConfig


def _unbox(x):
    return np.asarray(getattr(x, "value", x), np.float32)


def export_state_dict(params: Dict, cfg: VisualBertConfig,
                      prefix: str = "bert.") -> Dict[str, np.ndarray]:
    """Emit {torch_name: array} for the trunk (+cls/classifier heads when
    present). The MLM decoder weight is the (tied) word-embedding table."""
    out: Dict[str, np.ndarray] = {}
    H, nh, hd = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim

    trunk = params.get("bert", params)
    emb = trunk["embeddings"]
    e = f"{prefix}embeddings."
    out[e + "word_embeddings.weight"] = _unbox(emb["word_embeddings"]["embedding"])
    out[e + "position_embeddings.weight"] = _unbox(emb["position_embeddings"]["embedding"])
    out[e + "token_type_embeddings.weight"] = _unbox(emb["token_type_embeddings"]["embedding"])
    out[e + "token_type_embeddings_visual.weight"] = _unbox(
        emb["token_type_embeddings_visual"]["embedding"])
    out[e + "position_embeddings_visual.weight"] = _unbox(
        emb["position_embeddings_visual"]["embedding"])
    out[e + "projection.weight"] = _unbox(emb["projection"]["kernel"]).T
    out[e + "projection.bias"] = _unbox(emb["projection"]["bias"])
    out[e + "LayerNorm.weight"] = _unbox(emb["norm"]["scale"])
    out[e + "LayerNorm.bias"] = _unbox(emb["norm"]["bias"])

    enc = trunk["encoder"]
    if "layers" in enc:
        layers = [
            {k: _slice_tree(v, i) for k, v in enc["layers"].items()}
            for i in range(cfg.num_hidden_layers)
        ]
    else:
        layers = [enc[f"layer_{i}"] for i in range(cfg.num_hidden_layers)]

    for i, layer in enumerate(layers):
        p = f"{prefix}encoder.layer.{i}."
        qkv_k = _unbox(layer["attention"]["qkv"]["kernel"])  # [H, 3, nh, hd]
        qkv_b = _unbox(layer["attention"]["qkv"]["bias"])    # [3, nh, hd]
        for j, name in enumerate(("query", "key", "value")):
            out[p + f"attention.self.{name}.weight"] = qkv_k[:, j].reshape(H, nh * hd).T
            out[p + f"attention.self.{name}.bias"] = qkv_b[j].reshape(nh * hd)
        out[p + "attention.output.dense.weight"] = (
            _unbox(layer["attention"]["out"]["kernel"]).reshape(nh * hd, H).T)
        out[p + "attention.output.dense.bias"] = _unbox(layer["attention"]["out"]["bias"])
        out[p + "attention.output.LayerNorm.weight"] = _unbox(layer["attention_norm"]["scale"])
        out[p + "attention.output.LayerNorm.bias"] = _unbox(layer["attention_norm"]["bias"])
        out[p + "intermediate.dense.weight"] = _unbox(layer["intermediate"]["kernel"]).T
        out[p + "intermediate.dense.bias"] = _unbox(layer["intermediate"]["bias"])
        out[p + "output.dense.weight"] = _unbox(layer["output"]["kernel"]).T
        out[p + "output.dense.bias"] = _unbox(layer["output"]["bias"])
        out[p + "output.LayerNorm.weight"] = _unbox(layer["output_norm"]["scale"])
        out[p + "output.LayerNorm.bias"] = _unbox(layer["output_norm"]["bias"])

    out[f"{prefix}pooler.dense.weight"] = _unbox(trunk["pooler"]["dense"]["kernel"]).T
    out[f"{prefix}pooler.dense.bias"] = _unbox(trunk["pooler"]["dense"]["bias"])

    if "cls" in params:
        cls = params["cls"]
        out["cls.predictions.transform.dense.weight"] = _unbox(
            cls["transform"]["dense"]["kernel"]).T
        out["cls.predictions.transform.dense.bias"] = _unbox(cls["transform"]["dense"]["bias"])
        out["cls.predictions.transform.LayerNorm.weight"] = _unbox(cls["transform"]["norm"]["scale"])
        out["cls.predictions.transform.LayerNorm.bias"] = _unbox(cls["transform"]["norm"]["bias"])
        out["cls.predictions.bias"] = _unbox(cls["decoder_bias"])
        out["cls.predictions.decoder.weight"] = out[e + "word_embeddings.weight"]
        if "seq_relationship" in cls:
            out["cls.seq_relationship.weight"] = _unbox(cls["seq_relationship"]["kernel"]).T
            out["cls.seq_relationship.bias"] = _unbox(cls["seq_relationship"]["bias"])

    if "classifier" in params:
        out["classifier.weight"] = _unbox(params["classifier"]["dense"]["kernel"]).T
        out["classifier.bias"] = _unbox(params["classifier"]["dense"]["bias"])

    return out


def _slice_tree(tree, i):
    import jax

    return jax.tree.map(lambda x: np.asarray(getattr(x, "value", x))[i], tree)


def export_resnet50_state_dict(tree: Dict) -> Dict[str, np.ndarray]:
    """Inverse of ``import_torch.convert_resnet50_state_dict``: the Flax
    ``SimpleDetector``/``ResNet50Trunk`` param tree → torchvision-format flat
    state dict. The space-to-depth stem kernel ([4, 4, 4·cin, O]) maps back
    to the 7×7 layout losslessly (``models/detector.py::stem_s2d_to_7x7``);
    flax conv [kh, kw, I, O] → torch [O, I, kh, kw]; FrozenBatchNorm
    scale/bias/mean/var → weight/bias/running_mean/running_var."""
    out: Dict[str, np.ndarray] = {}

    def conv(src, prefix):
        k = _unbox(src["kernel"])
        out[prefix + ".weight"] = np.transpose(k, (3, 2, 0, 1))
        if "bias" in src:
            out[prefix + ".bias"] = _unbox(src["bias"])

    def bn(src, prefix):
        out[prefix + ".weight"] = _unbox(src["scale"])
        out[prefix + ".bias"] = _unbox(src["bias"])
        out[prefix + ".running_mean"] = _unbox(src["mean"])
        out[prefix + ".running_var"] = _unbox(src["var"])

    bb = tree.get("backbone", tree)
    if "conv1" in bb:
        k = _unbox(bb["conv1"]["kernel"])
        if k.shape[:2] == (4, 4):  # s2d stem → exact 7×7 export
            from visualbert_tpu.models.detector import stem_s2d_to_7x7

            k = stem_s2d_to_7x7(k)
        out["conv1.weight"] = np.transpose(k, (3, 2, 0, 1))
        bn(bb["bn1"], "bn1")
    for stage in ("layer1", "layer2", "layer3", "layer4"):
        root = (tree.get("after_roi_align", {}).get("layer4", {})
                if stage == "layer4" else bb.get(stage, {}))
        for name, blk in sorted(root.items()):
            if not name.startswith("block"):
                continue
            i = int(name[5:])
            pref = f"{stage}.{i}"
            for c in ("conv1", "conv2", "conv3"):
                conv(blk[c], f"{pref}.{c}")
            for b in ("bn1", "bn2", "bn3"):
                bn(blk[b], f"{pref}.{b}")
            if "downsample_conv" in blk:
                conv(blk["downsample_conv"], f"{pref}.downsample.0")
                bn(blk["downsample_bn"], f"{pref}.downsample.1")
    if "mask_upsample" in tree:
        conv(tree["mask_upsample"], "mask_upsample")
    if "object_embed" in tree:
        out["object_embed.weight"] = _unbox(tree["object_embed"]["embedding"])
    for name in ("regularizing_predictor", "obj_downsample"):
        if name in tree:
            out[name + ".weight"] = _unbox(tree[name]["kernel"]).T
            out[name + ".bias"] = _unbox(tree[name]["bias"])
    return out


def save_torch_file(params: Dict, cfg: VisualBertConfig, path: str, prefix: str = "bert."):
    import torch

    sd = {k: torch.tensor(v) for k, v in export_state_dict(params, cfg, prefix).items()}
    torch.save(sd, path)
    return path
