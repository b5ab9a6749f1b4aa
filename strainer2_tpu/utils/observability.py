"""Stage timing and profiling hooks.

The reference's only observability is stderr prints and `#` comment lines
inside data files (SURVEY.md §5).  Here every pipeline stage can report
wall time and engine throughput, and a device profiler trace can be
captured around any run:

- ``stage(name, items=...)``: context manager accumulating per-stage wall
  time; set STRAINER2_TIMINGS=1 to print a summary (stderr) at process
  exit, including derived rates (e.g. lookups/s).
- ``maybe_profile()``: wraps a block in ``jax.profiler.trace`` when
  STRAINER2_PROFILE=<dir> is set (view with TensorBoard / xprof).
"""

from __future__ import annotations

import atexit
import contextlib
import os
import sys
import time
from collections import defaultdict

__all__ = ["stage", "maybe_profile", "timings_enabled"]

_totals: dict[str, float] = defaultdict(float)
_items: dict[str, int] = defaultdict(int)
_registered = False


def timings_enabled() -> bool:
    return bool(os.environ.get("STRAINER2_TIMINGS"))


def _report() -> None:
    if not _totals:
        return
    print("# strainer2-tpu stage timings:", file=sys.stderr)
    for name in _totals:
        extra = ""
        if _items[name]:
            extra = f"  ({_items[name]} items, {_items[name] / max(_totals[name], 1e-9):,.0f}/s)"
        print(f"#   {name:<28s} {_totals[name]:8.3f}s{extra}", file=sys.stderr)


@contextlib.contextmanager
def stage(name: str, items: int = 0):
    """Accumulate wall time (and an optional item count) for a stage."""
    global _registered
    if timings_enabled() and not _registered:
        atexit.register(_report)
        _registered = True
    t0 = time.time()
    try:
        yield
    finally:
        _totals[name] += time.time() - t0
        _items[name] += items


@contextlib.contextmanager
def maybe_profile():
    """jax.profiler trace around a block when STRAINER2_PROFILE=<dir>."""
    trace_dir = os.environ.get("STRAINER2_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
