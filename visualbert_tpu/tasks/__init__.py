from visualbert_tpu.tasks import registry

__all__ = ["registry"]
