"""Subprocess harness: build the REFERENCE unsupervised-VisualBERT
(``/root/reference/unsupervised_visualbert/src/lxrt/modeling.py``,
``LXRTPretraining`` in visualbert_style mode) with seeded random weights, run
one forward pass on fixed inputs, and dump state_dict + inputs + per-loss
outputs to an .npz for the golden parity test (tests/test_unsup_parity.py).

Run in a SUBPROCESS: importing the reference requires sys.modules stubs for
its unavailable deps (commentjson/attrdict/boto3) and pollutes global state
(module-level ``args`` singleton, stdout tee).

Usage: python ref_lxrt_dump.py <out.npz> <mode>   mode ∈ {symbolic, bert_tags}
"""

import json
import os
import sys
import tempfile
import types

OUT = sys.argv[1]
MODE = sys.argv[2]

# ---- stubs for unavailable deps ----------------------------------------
cj = types.ModuleType("commentjson")
cj.load = json.load  # our config file is plain JSON
sys.modules["commentjson"] = cj


class AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


ad = types.ModuleType("attrdict")
ad.AttrDict = AttrDict
sys.modules["attrdict"] = ad

for name in ("boto3",):
    sys.modules[name] = types.ModuleType(name)
bc = types.ModuleType("botocore")
bce = types.ModuleType("botocore.exceptions")


class ClientError(Exception):
    pass


bce.ClientError = ClientError
bc.exceptions = bce
sys.modules["botocore"] = bc
sys.modules["botocore.exceptions"] = bce

# ---- reference args singleton -------------------------------------------
tmp = tempfile.mkdtemp()
config = {
    "llayers": 3,
    "xlayers": 0,
    "rlayers": 0,
    "visualbert_style": True,
    "hybrid_embedding": True,
    "joint_layer_norm": False,
    "use_tag_symbolic_embedding": True,
    "task_obj_predict": True,
    "visual_losses": "obj,attr,feat",
}
if MODE == "bert_tags":
    # the shipped unsupervised.json mode (configs/pretrain/unsupervised.json)
    config["use_bert_input_for_tags"] = True
    config["disable_divide_2"] = True
cfg_path = os.path.join(tmp, "config.json")
with open(cfg_path, "w") as f:
    json.dump(config, f)

sys.argv = ["ref_lxrt_dump", "--config", cfg_path, "--output", os.path.join(tmp, "out")]
sys.path.insert(0, "/root/reference/unsupervised_visualbert/src")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from lxrt import modeling  # noqa: E402

FEAT_DIM, POS_DIM = 24, 4
modeling.VISUAL_CONFIG.set_visual_dims(FEAT_DIM, POS_DIM)
# visual_loss_config hardcodes 2048 at construction — rebind for small dims
modeling.VISUAL_CONFIG.visual_loss_config["feat"] = (
    FEAT_DIM, "l2", (-1, FEAT_DIM), 1 / 0.15,
)

bert_cfg = modeling.BertConfig(
    vocab_size_or_config_json_file=99,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    max_position_embeddings=64,
    type_vocab_size=2,
)

from param import args  # noqa: E402

torch.manual_seed(7)
model = modeling.LXRTPretraining(
    bert_cfg,
    args=args,
    task_mask_lm=True,
    task_matched=True,
    task_obj_predict=True,
    visual_losses="obj,attr,feat",
    task_qa=True,
    num_answers=16,
)
if MODE == "symbolic":
    # ties symbolic decoder to the symbolic embedding (lxmert_pretrain.py:216)
    model.special_initialize_pretraining_head()
model.eval()

rng = np.random.RandomState(0)
B, Tt, Nv, Ntag = 2, 10, 7, 5
input_ids = rng.randint(0, 99, size=(B, Tt))
input_mask = np.ones((B, Tt), np.int64)
input_mask[0, -2:] = 0
feats = rng.randn(B, Nv, FEAT_DIM).astype(np.float32)
boxes = rng.rand(B, Nv, POS_DIM).astype(np.float32)
masked_lm = np.full((B, Tt), -1, np.int64)
masked_lm[:, 2:5] = rng.randint(0, 99, size=(B, 3))
matched = rng.randint(0, 2, size=(B,))
obj_labels = rng.randint(0, 1600, size=(B, Nv))
obj_conf = rng.rand(B, Nv).astype(np.float32)
attr_labels = rng.randint(0, 400, size=(B, Nv))
attr_conf = rng.rand(B, Nv).astype(np.float32)
feat_target = rng.randn(B, Nv, FEAT_DIM).astype(np.float32)
feat_mask = (rng.rand(B, Nv) > 0.5).astype(np.float32)
# keep at least one valid answer (torch CE over zero valid labels is nan)
ans = rng.randint(0, 16, size=(B,))
ans[0] = -1  # exercise the ignore_index path too
tag_vocab = 99 if MODE == "bert_tags" else 2003
visual_tags = rng.randint(0, tag_vocab, size=(B, Ntag))
visual_tags_mask = np.ones((B, Ntag), np.int64)
visual_tags_mask[1, -1:] = 0
visual_tags_box = rng.rand(B, Ntag, POS_DIM).astype(np.float32)
tag_objective = np.full((B, Ntag), -1, np.int64)
tag_objective[:, 1:3] = rng.randint(0, tag_vocab, size=(B, 2))

t = torch.from_numpy
with torch.no_grad():
    total_loss, losses, answer_score, losses_dict = model(
        input_ids=t(input_ids),
        token_type_ids=None,
        attention_mask=t(input_mask),
        masked_lm_labels=t(masked_lm),
        visual_feats=t(feats),
        pos=t(boxes),
        obj_labels={
            "obj": (t(obj_labels), t(obj_conf)),
            "attr": (t(attr_labels), t(attr_conf)),
            "feat": (t(feat_target), t(feat_mask)),
        },
        matched_label=t(matched),
        ans=t(ans),
        visual_tags=t(visual_tags),
        visual_tags_mask=t(visual_tags_mask),
        visual_tags_box=t(visual_tags_box.astype(np.float32)),
        visual_tags_objective=t(tag_objective),
    )
    # stream outputs for tensor-level comparison
    (lang_out, tags_out, visn_out), pooled = model.bert(
        t(input_ids), None, t(input_mask),
        visual_feats=(t(feats), t(boxes)),
        visual_tags=t(visual_tags),
        visual_tags_mask=t(visual_tags_mask),
        visual_tags_box=t(visual_tags_box.astype(np.float32)),
    )

out = {
    "total_loss": total_loss.numpy(),
    "lang_out": lang_out.numpy(),
    "tags_out": tags_out.numpy(),
    "visn_out": visn_out.numpy(),
    "pooled": pooled.numpy(),
}
for k, v in losses_dict.items():
    out["loss_" + k.replace(" ", "_")] = v.numpy()

inputs = dict(
    input_ids=input_ids, input_mask=input_mask, feats=feats, boxes=boxes,
    masked_lm=masked_lm, matched=matched, obj_labels=obj_labels,
    obj_conf=obj_conf, attr_labels=attr_labels, attr_conf=attr_conf,
    feat_target=feat_target, feat_mask=feat_mask, ans=ans,
    visual_tags=visual_tags, visual_tags_mask=visual_tags_mask,
    visual_tags_box=visual_tags_box, tag_objective=tag_objective,
)
state = {"sd_" + k: v.numpy() for k, v in model.state_dict().items()}
np.savez(OUT, **{("out_" + k): v for k, v in out.items()},
         **{("in_" + k): v for k, v in inputs.items()}, **state)
print("dumped", OUT)
