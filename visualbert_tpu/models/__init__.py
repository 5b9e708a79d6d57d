from visualbert_tpu.models.encoder import (
    VisualBertEmbeddings,
    TransformerLayer,
    TransformerEncoder,
    Pooler,
    VisualBertModel,
)
from visualbert_tpu.models.heads import (
    MLMTransform,
    PreTrainingHeads,
    FlickrAttention,
)
from visualbert_tpu.models.visualbert import VisualBertForTask

__all__ = [
    "VisualBertEmbeddings",
    "TransformerLayer",
    "TransformerEncoder",
    "Pooler",
    "VisualBertModel",
    "MLMTransform",
    "PreTrainingHeads",
    "FlickrAttention",
    "VisualBertForTask",
]
