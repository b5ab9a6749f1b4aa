"""Pipeline stages (scrub count, filter, detect, coverage, compare, multi).

`KmerEngine` / `default_layout` are re-exported lazily: importing the
engine pulls in jax (~2s), which pure host stages (filter, coverage)
never need.
"""

__all__ = ["KmerEngine", "default_layout"]


def __getattr__(name):
    if name in __all__:
        from strainer2_tpu.pipeline import engine

        return getattr(engine, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
