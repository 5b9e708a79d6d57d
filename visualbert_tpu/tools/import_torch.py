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


def convert_lxrt_state_dict(flat: Dict[str, np.ndarray], ucfg, dtype=np.float32) -> Dict:
    """Convert a reference LXRT/unsupervised-VisualBERT checkpoint
    (``<name>_LXRT.pth``, saved by lxmert_pretrain.py:443-449) into the
    ``UnsupervisedVisualBert`` param tree.

    Name map (reference ``src/lxrt/modeling.py``):
      bert.embeddings.{word,position,token_type}_embeddings.weight  (:503-505)
      bert.embeddings.LayerNorm → embeddings.text_norm              (:509)
      bert.embeddings.symbolic_embedding                            (:513)
      bert.embeddings.{visn_fc,visn_layer_norm,box_fc,box_layer_norm,
                       tag_layer_norm}                              (:524-536)
      bert.encoder.layer.{i}.* (visualbert_style BertLayer stack)   (:784-786)
      bert.pooler.dense                                             (:493-496)
      cls.predictions.{transform,bias} + cls.seq_relationship       (:999-1017)
      obj_predict_head.{transform,decoder_dict.{obj,attr,feat}}     (:971-996)
      symbolic_head.predictions.{transform,bias}                    (:1330-1337)
      answer_head.logit_fc.{0,2,3}                                  (:956-968)

    Tied decoder weights (cls.predictions.decoder.weight,
    symbolic_head...decoder.weight) are dropped — the tie is structural on
    our side. ``ucfg`` is an ``UnsupervisedConfig``; the encoder stack is
    emitted stacked (scan layout) or per-layer to match ``bert.scan_layers``.
    """
    # Only gamma/beta + DataParallel prefixes; the HF aliases in _ALIASES
    # would mangle LXRT's cls.predictions.transform naming.
    norm = lambda k: re.sub(r"\.beta$", ".bias", re.sub(r"\.gamma$", ".weight",
                            re.sub(r"^module\.", "", k)))
    flat = {norm(k): np.asarray(v, dtype=dtype) for k, v in flat.items()}
    cfg = ucfg.bert
    H, nh, hd, L = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim, cfg.num_hidden_layers

    out: Dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def linear(prefix, dst):
        if prefix + ".weight" in flat:
            put(dst + ("kernel",), flat[prefix + ".weight"].T)
            put(dst + ("bias",), flat[prefix + ".bias"])

    def lnorm(prefix, dst):
        if prefix + ".weight" in flat:
            put(dst + ("scale",), flat[prefix + ".weight"])
            put(dst + ("bias",), flat[prefix + ".bias"])

    # --- embeddings ---
    E = "bert.embeddings."
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings", "symbolic_embedding"):
        if E + name + ".weight" in flat:
            put(("embeddings", name, "embedding"), flat[E + name + ".weight"])
    linear(E + "visn_fc", ("embeddings", "visn_fc"))
    linear(E + "box_fc", ("embeddings", "box_fc"))
    lnorm(E + "LayerNorm", ("embeddings", "text_norm"))
    lnorm(E + "visn_layer_norm", ("embeddings", "visn_norm"))
    lnorm(E + "box_layer_norm", ("embeddings", "box_norm"))
    lnorm(E + "tag_layer_norm", ("embeddings", "tag_norm"))

    # --- encoder (BertLayer naming identical to the visualbert stack) ---
    if "bert.encoder.layer.0.attention.self.query.weight" in flat:
        stacks: Dict[tuple, list] = {}
        for i in range(L):
            pref = f"bert.encoder.layer.{i}"
            ws, bs = [], []
            for name in ("query", "key", "value"):
                w = flat[f"{pref}.attention.self.{name}.weight"].T
                b = flat[f"{pref}.attention.self.{name}.bias"]
                ws.append(w.reshape(H, nh, hd))
                bs.append(b.reshape(nh, hd))
            layer = {
                ("attention", "qkv", "kernel"): np.stack(ws, axis=1),
                ("attention", "qkv", "bias"): np.stack(bs, axis=0),
                ("attention", "out", "kernel"):
                    flat[f"{pref}.attention.output.dense.weight"].T.reshape(nh, hd, H),
                ("attention", "out", "bias"): flat[f"{pref}.attention.output.dense.bias"],
                ("attention_norm", "scale"): flat[f"{pref}.attention.output.LayerNorm.weight"],
                ("attention_norm", "bias"): flat[f"{pref}.attention.output.LayerNorm.bias"],
                ("intermediate", "kernel"): flat[f"{pref}.intermediate.dense.weight"].T,
                ("intermediate", "bias"): flat[f"{pref}.intermediate.dense.bias"],
                ("output", "kernel"): flat[f"{pref}.output.dense.weight"].T,
                ("output", "bias"): flat[f"{pref}.output.dense.bias"],
                ("output_norm", "scale"): flat[f"{pref}.output.LayerNorm.weight"],
                ("output_norm", "bias"): flat[f"{pref}.output.LayerNorm.bias"],
            }
            for path, val in layer.items():
                stacks.setdefault(path, []).append(val)
        if getattr(cfg, "scan_layers", True):
            for path, vals in stacks.items():
                put(("encoder", "layers") + path, np.stack(vals, axis=0))
        else:
            for path, vals in stacks.items():
                for i, v in enumerate(vals):
                    put(("encoder", f"layer_{i}") + path, v)

    # --- pooler / pretraining heads ---
    linear("bert.pooler.dense", ("pooler", "dense"))
    linear("cls.predictions.transform.dense", ("mlm_transform", "dense"))
    lnorm("cls.predictions.transform.LayerNorm", ("mlm_transform", "norm"))
    if "cls.predictions.bias" in flat:
        put(("mlm_bias",), flat["cls.predictions.bias"])
    linear("cls.seq_relationship", ("seq_relationship",))

    linear("obj_predict_head.transform.dense", ("obj_head", "transform", "dense"))
    lnorm("obj_predict_head.transform.LayerNorm", ("obj_head", "transform", "norm"))
    for key in ("obj", "attr", "feat"):
        linear(f"obj_predict_head.decoder_dict.{key}", ("obj_head", key))

    linear("symbolic_head.predictions.transform.dense", ("tag_transform", "dense"))
    lnorm("symbolic_head.predictions.transform.LayerNorm", ("tag_transform", "norm"))
    if "symbolic_head.predictions.bias" in flat:
        put(("tag_bias",), flat["symbolic_head.predictions.bias"])

    # --- answer head (nn.Sequential indices: 0=fc1, 2=LN, 3=fc2) ---
    linear("answer_head.logit_fc.0", ("answer_head", "fc1"))
    lnorm("answer_head.logit_fc.2", ("answer_head", "norm"))
    linear("answer_head.logit_fc.3", ("answer_head", "fc2"))
    # fine-tune VQAModel saves the head as a bare ``logit_fc`` (vqa_model.py:28)
    linear("logit_fc.0", ("answer_head", "fc1"))
    lnorm("logit_fc.2", ("answer_head", "norm"))
    linear("logit_fc.3", ("answer_head", "fc2"))
    return out


def convert_lxrt_for_vqa(
    flat: Dict[str, np.ndarray],
    ucfg,
    init_params: Dict,
    src_answers=None,
    dst_answers=None,
    dtype=np.float32,
) -> Dict:
    """Pretrained LXRT checkpoint → ``UnsupervisedVQAModel`` params with the
    answer-head row surgery (reference ``load_lxmert_qa``,
    qa_answer_table.py:88-161): trunk weights load directly; the final
    answer layer's rows are re-indexed by answer STRING from the ~9500-way
    pretraining table (``src_answers``) onto the fine-tune vocabulary
    (``dst_answers``); unmatched rows are zeroed. With no tables given the
    answer head keeps its fresh init (``load_lxmert_from_pretrain_noqa``).

    ``init_params`` is the freshly-initialized UnsupervisedVQAModel tree;
    returns ``(partial_tree, n_answers_copied)`` — merge the tree with
    ``merge_into``.
    """
    from visualbert_tpu.data.answer_table import AnswerTable, remap_answer_head

    tree = convert_lxrt_state_dict(flat, ucfg, dtype=dtype)
    answer = tree.pop("answer_head", None)
    trunk = {k: v for k, v in tree.items()}
    out: Dict = {"trunk": trunk}

    if answer is None:
        return out, 0
    if src_answers is None or dst_answers is None:
        # no surgery possible — load fc1/norm, drop the final layer
        answer.pop("fc2", None)
        out["answer_head"] = answer
        return out, 0

    src = src_answers if isinstance(src_answers, AnswerTable) else AnswerTable(src_answers)
    dst = dst_answers if isinstance(dst_answers, AnswerTable) else AnswerTable(dst_answers)

    def leaf(x):
        import numpy as _np
        from flax import linen as _nn
        return _np.asarray(x.value if isinstance(x, _nn.Partitioned) else x)

    init_fc2 = init_params["answer_head"]["fc2"]
    remapped = remap_answer_head(
        kernel=answer["fc2"]["kernel"],
        bias=answer["fc2"]["bias"],
        src_table=src,
        dst_table=dst,
        dst_kernel=leaf(init_fc2["kernel"]),
        dst_bias=leaf(init_fc2["bias"]),
    )
    answer["fc2"] = {"kernel": remapped["kernel"], "bias": remapped["bias"]}
    out["answer_head"] = answer
    return out, remapped["n_copied"]


_RESNET_STAGE_BLOCKS = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}

# the reference wraps the torchvision modules in nn.Sequential containers,
# renaming them positionally (detector.py:62-70, 87-93, 95-99)
_DETECTOR_SEQ_ALIASES = [
    (r"^backbone\.0\.", "conv1."),
    (r"^backbone\.1\.", "bn1."),
    (r"^backbone\.4\.", "layer1."),
    (r"^backbone\.5\.", "layer2."),
    (r"^backbone\.6\.", "layer3."),
    (r"^after_roi_align\.0\.", "layer4."),
    (r"^obj_downsample\.1\.", "obj_downsample."),
    (r"^module\.", ""),
    (r"^detector\.", ""),
]


def convert_resnet50_state_dict(
    flat: Dict[str, np.ndarray], dtype=np.float32, s2d_stem: bool = True
) -> Dict:
    """Convert a torchvision-format ResNet50 state dict (or a reference
    ``SimpleDetector`` checkpoint wrapping one) into the Flax
    ``models/detector.py`` param tree.

    Accepts both raw torchvision names (``conv1.weight``, ``layer2.0.bn3...``,
    ``layer1.0.downsample.0/1``) and the reference detector's Sequential-
    renamed ones (``backbone.0.weight`` etc., detector.py:62-70). The stride
    surgery (detector.py:30-45) only changes strides, never weight shapes, so
    ImageNet torchvision weights import unchanged.

    Layout: torch conv [O, I, kh, kw] → flax [kh, kw, I, O]; BN
    weight/bias/running_mean/running_var → scale/bias/mean/var; linear
    weight [O, I] → kernel [I, O]. ``s2d_stem`` (default, matching
    ``ResNet50Trunk``) rearranges the 7×7 stem kernel into the exact
    space-to-depth 4×4 layout (``models/detector.py::stem_7x7_to_s2d``,
    lossless both directions).
    """
    renamed = {}
    for k, v in flat.items():
        for pat, rep in _DETECTOR_SEQ_ALIASES:
            k = re.sub(pat, rep, k)
        renamed[k] = np.asarray(v, dtype=dtype)
    flat = renamed

    out: Dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(prefix, dst):
        w = flat.get(prefix + ".weight")
        if w is None:
            return False
        put(dst + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
        if prefix + ".bias" in flat:
            put(dst + ("bias",), flat[prefix + ".bias"])
        return True

    def bn(prefix, dst):
        if prefix + ".weight" not in flat:
            return False
        put(dst + ("scale",), flat[prefix + ".weight"])
        put(dst + ("bias",), flat[prefix + ".bias"])
        put(dst + ("mean",), flat[prefix + ".running_mean"])
        put(dst + ("var",), flat[prefix + ".running_var"])
        return True

    # trunk root (lives under "backbone" in SimpleDetector, or stands alone
    # for a bare ResNet50Trunk — emit the canonical SimpleDetector layout;
    # callers peel subtrees as needed)
    conv("conv1", ("backbone", "conv1"))
    if s2d_stem and "conv1" in out.get("backbone", {}):
        from visualbert_tpu.models.detector import stem_7x7_to_s2d

        k = out["backbone"]["conv1"]["kernel"]
        if k.shape[:2] == (7, 7):
            out["backbone"]["conv1"]["kernel"] = stem_7x7_to_s2d(k)
    bn("bn1", ("backbone", "bn1"))
    for stage in ("layer1", "layer2", "layer3", "layer4"):
        root = ("after_roi_align", "layer4") if stage == "layer4" else ("backbone", stage)
        for i in range(_RESNET_STAGE_BLOCKS[stage]):
            blk = root + (f"block{i}",)
            pref = f"{stage}.{i}"
            if not conv(f"{pref}.conv1", blk + ("conv1",)):
                continue
            bn(f"{pref}.bn1", blk + ("bn1",))
            conv(f"{pref}.conv2", blk + ("conv2",))
            bn(f"{pref}.bn2", blk + ("bn2",))
            conv(f"{pref}.conv3", blk + ("conv3",))
            bn(f"{pref}.bn3", blk + ("bn3",))
            conv(f"{pref}.downsample.0", blk + ("downsample_conv",))
            bn(f"{pref}.downsample.1", blk + ("downsample_bn",))

    # detector heads (present when converting a full SimpleDetector ckpt)
    conv("mask_upsample", ("mask_upsample",))
    if "object_embed.weight" in flat:
        put(("object_embed", "embedding"), flat["object_embed.weight"])
    for name in ("regularizing_predictor", "obj_downsample"):
        if name + ".weight" in flat:
            put((name, "kernel"), flat[name + ".weight"].T)
            put((name, "bias"), flat[name + ".bias"])
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
