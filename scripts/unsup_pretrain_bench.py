"""Unsupervised-VisualBERT pretraining step throughput on one TPU chip at
the reference Conceptual-Captions shapes (configs/pretrain/
conceptual_captions.json: batch 144, max_seq_length 30, 36 regions,
obj/attr/feat + matched + MLM losses, bert-base).
Usage: python scripts/unsup_pretrain_bench.py"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.data.datasets import unsup_pretrain as up
from visualbert_tpu.data.pipeline import Batcher
from visualbert_tpu.data.symbolic import SymbolicVocab
from visualbert_tpu.data.tokenization import BertTokenizer
from visualbert_tpu.models.unsupervised import UnsupervisedConfig, UnsupervisedVisualBert
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.trainer import Trainer

B, K = 144, 30
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(30517)]
tok = BertTokenizer({w: i for i, w in enumerate(VOCAB)})
sym = SymbolicVocab([f"o{i}" for i in range(1600)], [f"a{i}" for i in range(400)])
ann, feats = up.make_synthetic(B * 2, tok, sym, n_regions=36, feat_dim=2048)
ds = up.UnsupervisedPretrainDataset(ann, feats, tok, sym, max_seq_length=30,
                                    n_regions=36)
batch = next(iter(Batcher(ds, B, seed=0).epoch(0)))

bert = VisualBertConfig.base(
    use_flash_attention=True, scan_layers=False, hidden_act="gelu",  # reference erf gelu (lxrt/modeling.py:118) via the fast-erf path
    fused_mlm_xent=True, fast_dropout=True,
)
ucfg = UnsupervisedConfig(bert=bert, visual_feat_dim=2048,
                          symbolic_vocab_size=sym.size)
model = UnsupervisedVisualBert(ucfg)
trainer = Trainer(
    model=model,
    opt_config=OptimizerConfig(learning_rate=6e-5, schedule="warmup_linear",
                               warmup=0.02, t_total=611240),
    train_config=TrainConfig(), mesh=create_mesh((1, 1)),
)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
import time as _t
t0 = _t.perf_counter()
from bench import time_scan_steps
best, state = time_scan_steps(trainer, state, batch, K=K, unroll=3)
print(f"unsup pretrain: {best:.0f} examples/s/chip "
      f"(B={B}, T=30+tags+36 regions, bert-base, all losses; "
      f"first call incl. compile {_t.perf_counter()-t0:.0f}s)")
