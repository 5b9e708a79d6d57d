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


def __getattr__(name):
    """Lazy top-level API (keeps `import visualbert_tpu` light)."""
    lazy = {
        "VisualBertModel": ("visualbert_tpu.models.encoder", "VisualBertModel"),
        "VisualBertForTask": ("visualbert_tpu.models.visualbert", "VisualBertForTask"),
        "UnsupervisedVisualBert": ("visualbert_tpu.models.unsupervised", "UnsupervisedVisualBert"),
        "Trainer": ("visualbert_tpu.train.trainer", "Trainer"),
        "fit": ("visualbert_tpu.train.loop", "fit"),
        "BertTokenizer": ("visualbert_tpu.data.tokenization", "BertTokenizer"),
        "FastBertTokenizer": ("visualbert_tpu.data.fast_tokenizer", "FastBertTokenizer"),
        "create_mesh": ("visualbert_tpu.parallel.mesh", "create_mesh"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)


__all__ = [
    "VisualBertConfig", "OptimizerConfig", "TrainConfig",
    "VisualBertModel", "VisualBertForTask", "UnsupervisedVisualBert",
    "Trainer", "fit", "BertTokenizer", "FastBertTokenizer", "create_mesh",
]
