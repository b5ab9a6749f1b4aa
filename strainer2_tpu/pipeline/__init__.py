from strainer2_tpu.pipeline.engine import KmerEngine

__all__ = ["KmerEngine"]
