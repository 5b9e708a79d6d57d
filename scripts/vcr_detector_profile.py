"""Per-op profile of the VCR detector-path train step (same config as
scripts/vcr_detector_bench.py): capture a jax.profiler trace of the K-step
scan and bucket device time with xplane_op_summary.

2026-08-19 finding (gather RoIAlign, 64.8 ex/s operating point): ~2/3 of
device time was RoIAlign — [8,20,1225,1024] tap-tensor fusions/reshapes
(~300 ms of 810 ms per K=4 trace) plus [8192,1024] feature-map backward
scatter fusions (~240 ms). Motivated the matmul reformulation
(ops/roi_align.py, implementation="matmul"), which took the bench to
153.0 ex/s.

Post-change profile (153 ex/s): top bucket is now 844 tuple-output dW
fusions (f32[] sumsq epilogue + bf16 dW) at ~17.5 ms/step — these are the
weight-gradient convolutions themselves, individually at/near the matmul
roofline (3x3x512x512 dW over the 160 box crops: 0.20 ms/step vs 0.21
pure-FLOPs). Only outlier: the 7x7x3 stem's dW (0.77 ms/step, ~13x floor —
3 input channels pad to 128 lanes). Round 5 SHIPPED the space-to-depth
stem fix (models/detector.py s2d_stem, exact masked 4x4 conv with a
lossless 7x7<->s2d torch import/export mapping): 153.0 -> 158.9 ex/s
(+3.9%), matching this profile's ~4% prediction.

Usage: python scripts/vcr_detector_profile.py [logdir]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.models.vcr import VisualBertDetectorModel
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.trainer import Trainer
from visualbert_tpu.utils.profiling import xplane_op_summary

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vcr_trace"
B, NC, T, NB, IMG = 8, 4, 128, 20, 512
cfg = VisualBertConfig.base(use_flash_attention=True, scan_layers=False,
                            hidden_act="gelu_tanh", fast_dropout=True,
                            visual_embedding_dim=512)
model = VisualBertDetectorModel(cfg, final_dim=512, num_choices=NC)
rng = np.random.RandomState(0)
batch = {
    "images": rng.randn(B, IMG, IMG, 3).astype(np.float32) * 0.1,
    "boxes": np.tile(np.array([10, 10, 200, 200], np.float32), (B, NB, 1)),
    "box_mask": np.ones((B, NB), np.int32),
    "classes": rng.randint(1, 81, size=(B, NB)).astype(np.int32),
    "segms": rng.rand(B, NB, 14, 14).astype(np.float32),
    "input_ids": rng.randint(0, cfg.vocab_size, size=(B, NC, T)).astype(np.int32),
    "token_type_ids": np.zeros((B, NC, T), np.int32),
    "input_mask": np.ones((B, NC, T), np.int32),
    "image_text_alignment": np.full((B, NC, NB, 3), -1, np.int32),
    "label": rng.randint(0, NC, size=(B,)).astype(np.int32),
}
trainer = Trainer(model=model,
                  opt_config=OptimizerConfig(learning_rate=2e-5, schedule=None, t_total=-1),
                  train_config=TrainConfig(), mesh=create_mesh((1, 1)))
state = trainer.init_state(jax.random.PRNGKey(0), batch)
from bench import time_scan_steps
# warm/compile outside the trace
best, state = time_scan_steps(trainer, state, batch, K=4, unroll=2, repeats=1)
print(f"warm: {best:.1f} examples/s/chip")
with jax.profiler.trace(LOGDIR):
    best, state = time_scan_steps(trainer, state, batch, K=4, unroll=2, repeats=1)
print(f"traced: {best:.1f} examples/s/chip")
rows = xplane_op_summary(LOGDIR, top_n=45)
total = sum(ms for _, ms, _ in rows)
print(f"top-45 groups total {total:.1f} ms (K=4 steps)")
for k, ms, n in rows:
    print(f"{ms:8.2f} ms {n:6d}  {k[:100]}")
