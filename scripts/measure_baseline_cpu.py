"""Measured CPU head-to-head: the REFERENCE PyTorch training step vs this
framework's training step, same host, same shapes, fp32 (BASELINE.md's
measured anchor — the A100 number itself cannot be measured in this sandbox).

Reference side: the actual vendored code at
/root/reference/visualbert/pytorch_pretrained_bert/ — TrainVisualBERTObjective
(pretraining head) + BertAdam with its per-parameter clipping, exactly the
ModelWrapper.step flow (model_wrapper.py:52-98, eager, no DataParallel since
this is a single device).

Ours: the same geometry through Trainer.train_step_fn() on the JAX CPU
backend, flash kernel OFF (interpret mode would be emulation, not XLA).

Prints one JSON line with both pairs/s and the ratio.
"""

import json
import sys
import time
import types

import numpy as np

B, TT, TV, DV = 8, 128, 100, 2048
STEPS = 3


def measure_reference():
    import torch

    torch.manual_seed(0)
    # the reference hardcodes .cuda() on visual position ids
    # (modeling.py:1238,1247) — run it on the host for this measurement
    torch.Tensor.cuda = lambda self, *a, **k: self
    # stubs for the vendored file_utils deps
    for name in ("boto3",):
        sys.modules.setdefault(name, types.ModuleType(name))
    bc = types.ModuleType("botocore")
    bce = types.ModuleType("botocore.exceptions")

    class ClientError(Exception):
        pass

    bce.ClientError = ClientError
    bc.exceptions = bce
    sys.modules.setdefault("botocore", bc)
    sys.modules.setdefault("botocore.exceptions", bce)
    sys.path.insert(0, "/root/reference/visualbert")

    from pytorch_pretrained_bert.modeling import BertConfig, TrainVisualBERTObjective
    from pytorch_pretrained_bert.optimization import BertAdam

    cfg = BertConfig(vocab_size_or_config_json_file=30522)
    model = TrainVisualBERTObjective(
        cfg, training_head_type="pretraining", visual_embedding_dim=DV
    )
    model.train()
    no_decay = ["bias", "gamma", "beta"]
    groups = [
        {"params": [p for n, p in model.named_parameters() if not any(d in n for d in no_decay)],
         "weight_decay_rate": 0.01},
        {"params": [p for n, p in model.named_parameters() if any(d in n for d in no_decay)],
         "weight_decay_rate": 0.0},
    ]
    opt = BertAdam(groups, lr=1e-4, warmup=0.1, t_total=10000)

    rng = np.random.RandomState(0)
    lm = np.full((B, TT), -1, np.int64)
    lm[:, 2:26] = rng.randint(0, 30522, size=(B, 24))
    batch = dict(
        input_ids=torch.from_numpy(rng.randint(0, 30522, size=(B, TT))),
        token_type_ids=torch.zeros(B, TT, dtype=torch.long),
        input_mask=torch.ones(B, TT, dtype=torch.long),
        visual_embeddings=torch.from_numpy(rng.randn(B, TV, DV).astype(np.float32)),
        position_embeddings_visual=None,
        image_mask=torch.ones(B, TV, dtype=torch.long),
        visual_embeddings_type=torch.zeros(B, TV, dtype=torch.long),
        masked_lm_labels=torch.from_numpy(lm),
        is_random_next=torch.from_numpy(rng.randint(0, 2, size=(B, 1))),
    )

    def step():
        out = model(**batch)
        loss = out["loss"].mean()
        loss.backward()
        opt.step()
        opt.zero_grad()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = time.perf_counter() - t0
    return B * STEPS / dt


def measure_ours():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import synth_batch
    from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
    from visualbert_tpu.models.visualbert import VisualBertForTask
    from visualbert_tpu.parallel.mesh import create_mesh
    from visualbert_tpu.train.trainer import Trainer

    cfg = VisualBertConfig.base(
        use_flash_attention=False, scan_layers=True, dtype=jnp.float32
    )
    model = VisualBertForTask(cfg, head_type="pretraining")
    trainer = Trainer(
        model=model,
        opt_config=OptimizerConfig(
            learning_rate=1e-4, schedule="warmup_linear", warmup=0.1, t_total=10000
        ),
        train_config=TrainConfig(),
        mesh=create_mesh((1, 1)),
    )
    batch = synth_batch(B, tt=TT, tv=TV, dv=DV)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.train_step_fn()
    sharded = trainer.shard_batch(batch)
    key = jax.random.PRNGKey(1)
    state, m = step(state, sharded, key)
    float(m["loss"])  # sync after compile
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, sharded, jax.random.fold_in(key, i))
        float(m["loss"])
    dt = time.perf_counter() - t0
    return B * STEPS / dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    if which in ("ref", "both"):
        out["reference_cpu_pairs_per_sec"] = round(measure_reference(), 3)
        print("ref done", out, file=sys.stderr, flush=True)
    if which in ("ours", "both"):
        out["ours_cpu_pairs_per_sec"] = round(measure_ours(), 3)
    if len(out) == 2:
        out["cpu_speedup"] = round(
            out["ours_cpu_pairs_per_sec"] / out["reference_cpu_pairs_per_sec"], 3
        )
    print(json.dumps(out))
