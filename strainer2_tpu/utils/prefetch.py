"""Background-thread batch prefetching.

JAX dispatch is asynchronous, so device compute already overlaps the
*dispatching* host code — but the stream producer (gzip decode + packing,
Python or native) runs serially between dispatches.  Wrapping the stream
in a small bounded-queue thread overlaps producing batch N+1 with the
device crunching batch N (double buffering at the host/device seam).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

__all__ = ["prefetch"]

_SENTINEL = object()


def prefetch(stream: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate ``stream`` on a background thread, ``depth`` items ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    error: list[BaseException] = []

    def worker():
        try:
            for item in stream:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            error.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item
