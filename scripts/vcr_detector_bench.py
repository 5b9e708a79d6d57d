"""VCR detector-path train-step throughput on one TPU chip: full ResNet50
trunk + RoIAlign + bert-base over 4 answer choices at 512x512 images (the
reference's configs/vcr/fine-tune-qa.json pipeline, detector in the graph).
Measured: 158.9 examples/s/chip on v5e (2026-08-19, space-to-depth stem +
matmul-formulation RoIAlign — was 153.0 with the 7x7 stem, 64.8 at the
gather formulation with the shape-derived tap cap, 43 at the blanket 8-tap
gather lattice; compile 90-460 s over the remote tunnel).
Usage: python scripts/vcr_detector_bench.py"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig
from visualbert_tpu.models.vcr import VisualBertDetectorModel
from visualbert_tpu.parallel.mesh import create_mesh
from visualbert_tpu.train.trainer import Trainer

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
import time as _t
t0 = _t.perf_counter()
from bench import time_scan_steps
best, state = time_scan_steps(trainer, state, batch, K=4, unroll=2)
print(f"VCR detector-path train: {best:.1f} examples/s/chip "
      f"(B={B}, img {IMG}^2, resnet50+bert-base x4 choices; "
      f"first call incl. compile {_t.perf_counter()-t0:.0f}s)")
