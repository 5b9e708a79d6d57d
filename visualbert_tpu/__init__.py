"""TPU-native VisualBERT framework (JAX / Flax / Pallas / pjit).

A ground-up rebuild of the capabilities of uclanlp/visualbert — single-stream
vision-and-language BERT over [text ; region features], its task heads (COCO
pretraining, VQA2, VCR, NLVR2, Flickr30k grounding) and the NAACL-2021
unsupervised-pretraining stack — designed for TPUs: one pjit program over a
(data, model) mesh, bf16 MXU compute, Pallas kernels for the hot ops, and
static bucketed shapes end to end.
"""

__version__ = "0.1.0"

from visualbert_tpu.config import OptimizerConfig, TrainConfig, VisualBertConfig

__all__ = ["VisualBertConfig", "OptimizerConfig", "TrainConfig"]
