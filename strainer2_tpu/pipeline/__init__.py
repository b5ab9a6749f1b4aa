from strainer2_tpu.pipeline.engine import KmerEngine, default_layout

__all__ = ["KmerEngine", "default_layout"]
