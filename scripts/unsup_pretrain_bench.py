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

B, K = 144, 8
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(30517)]
tok = BertTokenizer({w: i for i, w in enumerate(VOCAB)})
sym = SymbolicVocab([f"o{i}" for i in range(1600)], [f"a{i}" for i in range(400)])
ann, feats = up.make_synthetic(B * 2, tok, sym, n_regions=36, feat_dim=2048)
ds = up.UnsupervisedPretrainDataset(ann, feats, tok, sym, max_seq_length=30,
                                    n_regions=36)
batch = next(iter(Batcher(ds, B, seed=0).epoch(0)))

bert = VisualBertConfig.base(
    use_flash_attention=True, scan_layers=False, hidden_act="gelu_tanh",
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
step = trainer.train_step_fn(nested=True)

def multi(state, b, key):
    def body(st, i):
        st, m = step(st, b, jax.random.fold_in(key, i))
        return st, m["loss"]
    return jax.lax.scan(body, state, jnp.arange(K))

multi = jax.jit(multi, donate_argnums=(0,),
                compiler_options=trainer.compiler_options())
sb = trainer.shard_batch(batch)
key = jax.random.key(1, impl="rbg")
t0 = time.perf_counter()
state, losses = multi(state, sb, key)
print("compile+first:", round(time.perf_counter() - t0, 1), "s; losses:",
      np.asarray(losses))
best = 0
for _ in range(3):
    t0 = time.perf_counter()
    state, losses = multi(state, sb, key)
    np.asarray(losses)
    best = max(best, B * K / (time.perf_counter() - t0))
print(f"unsup pretrain: {best:.0f} examples/s/chip "
      f"(B={B}, T=30+tags+36 regions, bert-base, all losses)")
