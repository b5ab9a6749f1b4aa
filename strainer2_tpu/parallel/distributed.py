"""Multi-host launch helpers.

The reference's only scale-out is one-strain-per-Snakemake-job
(SURVEY.md §2.7).  Here a single strain's panel counting scales across a
multi-host TPU slice:

- every host runs the same program (SPMD) after :func:`initialize`;
- panel files are partitioned across hosts by :func:`host_file_partition`
  (greedy size-balanced — files differ wildly in size);
- each host streams its files through its local devices' shard_map engine
  (strainer2_tpu.parallel.sharding) into its private count shards;
- :func:`merge_across_hosts` allgathers the host-local merged count
  vectors across processes and integer-sums them (ICI within a slice,
  DCN across slices — XLA picks the transport).

Counts are integers, so the multi-host result is bit-identical to a
single-host run over the same file list regardless of the partition.
"""

from __future__ import annotations

import contextlib
import os
import threading

import numpy as np

__all__ = [
    "initialize",
    "host_file_partition",
    "partition_by_size",
    "merge_across_hosts",
    "gather_blobs",
    "COLLECTIVE_TIMEOUT_ENV",
]

COLLECTIVE_TIMEOUT_ENV = "STRAINER2_COLLECTIVE_TIMEOUT"
_DEFAULT_COLLECTIVE_TIMEOUT_S = 3600.0


def _collective_timeout() -> float | None:
    """Seconds a cross-host collective may take before the run aborts with
    a clear error; None disables (STRAINER2_COLLECTIVE_TIMEOUT=0).

    The default is deliberately generous (1 h): ranks reach the merge
    barrier skewed by however unevenly the panel partitioned, and a slow
    rank must never be mistaken for a dead one.  The point is to bound the
    failure mode, not to police stragglers — without it, a dead peer turns
    every surviving rank into an unbounded collective hang."""
    v = os.environ.get(COLLECTIVE_TIMEOUT_ENV)
    if v is None:
        return _DEFAULT_COLLECTIVE_TIMEOUT_S
    t = float(v)
    return t if t > 0 else None


@contextlib.contextmanager
def _rank_failure_watchdog(what: str):
    """Abort (exit 1) with an actionable message if the wrapped collective
    wedges — the SPMD failure contract.

    The reference's failure story is exit(1) everywhere (SURVEY.md §5);
    under SPMD the equivalent hazard is a peer rank dying BEFORE a
    collective, which leaves every surviving rank blocked forever inside
    the transport with no error.  A watchdog thread turns that into a
    timely, resumable failure: checkpointed runs (--checkpoint) restart
    and skip completed work.  os._exit is deliberate — the main thread is
    wedged in a native collective and cannot unwind."""
    timeout = _collective_timeout()
    if timeout is None:
        yield
        return
    done = threading.Event()

    def _watch():
        if not done.wait(timeout):
            import sys

            import jax

            print(
                f"[strainer2] rank {jax.process_index()}: {what} did not "
                f"complete within {timeout:.0f}s — a peer rank likely died "
                "or stalled before the collective; aborting so the run can "
                "be restarted (checkpointed runs resume; tune with "
                f"{COLLECTIVE_TIMEOUT_ENV}, 0 disables)",
                file=sys.stderr,
                flush=True,
            )
            sys.stderr.flush()
            os._exit(1)

    t = threading.Thread(target=_watch, name="s2-collective-watchdog", daemon=True)
    t.start()
    try:
        yield
    finally:
        done.set()


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed bring-up; no-ops gracefully for single-process runs.

    The CLI contract (run_detect / run_scrub_count docstrings): set
    JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID, one
    process per host.  This jax version's `distributed.initialize` only
    auto-detects managed clusters (SLURM etc.), not these env vars, so
    they are read here.  Returns (process_index, process_count).
    """
    import jax

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and os.environ.get("JAX_PROCESS_ID"):
            process_id = int(os.environ["JAX_PROCESS_ID"])
        # The CPU collective backend (Gloo) prints a connection banner to
        # raw fd 1 — lazily, at the FIRST collective, not at bring-up —
        # which would corrupt the byte-exact stdout contract of the CLIs.
        # Permanently route fd 1 to stderr and rebind Python's sys.stdout
        # to the original stream: every repo output path writes through
        # Python file objects (no direct fd-1 writes), so CLI bytes are
        # unaffected while native-level chatter lands on stderr.
        import sys

        sys.stdout.flush()
        saved_fd1 = os.dup(1)
        os.dup2(2, 1)
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            os.dup2(saved_fd1, 1)
            os.close(saved_fd1)
            # idempotent across pipeline invocations in one process (e.g. a
            # driver looping run_scrub_count over strains; an earlier call
            # owns the redirect)
            if "already" not in str(e).lower():
                raise
        else:
            if sys.stdout is sys.__stdout__:
                sys.stdout = os.fdopen(saved_fd1, "w")
            else:
                # replaced stream (test capture, explicit sink): it does not
                # sit on fd 1, so just keep the original fd alive unused
                os.set_inheritable(saved_fd1, False)
    return jax.process_index(), jax.process_count()


def partition_by_size(sizes: list[int], process_index: int,
                      process_count: int) -> list[int]:
    """Greedy size-balanced assignment of items to ranks; returns this
    rank's item indices in ascending order.

    Deterministic across ranks (every rank computes the same full
    assignment and takes its share), so no coordination is needed.
    Items are identified by POSITION: duplicate inputs are supported and
    each occurrence lands on exactly one rank.
    """
    sizes_arr = np.asarray(sizes, dtype=np.int64)
    order = np.argsort(-sizes_arr, kind="stable")
    load = [0] * process_count
    mine_idx: list[int] = []
    for i in order:
        h = int(np.argmin(load))
        load[h] += int(sizes_arr[i]) or 1
        if h == process_index:
            mine_idx.append(int(i))
    return sorted(mine_idx)


def host_file_partition(paths: list[str], process_index: int,
                        process_count: int) -> list[str]:
    """Greedy size-balanced assignment of panel files to this host
    (partition_by_size over on-disk file sizes), preserving the original
    list order within this host's share."""
    sizes = []
    for p in paths:
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            sizes.append(0)
    return [paths[i] for i in partition_by_size(sizes, process_index, process_count)]


def merge_across_hosts(local_counts: np.ndarray) -> np.ndarray:
    """Sum host-local count vectors over every process (bit-exact).

    Each process passes its *different* local numpy vector, so this must go
    through the process-local-data path (``multihost_utils.process_allgather``
    stacks one copy per process via host_local_array_to_global_array) — NOT a
    replicated-spec jit, which is only valid for values identical across
    processes.  The merged result is a plain integer sum over the stacked
    process axis: order-independent, hence bit-identical to a single-process
    run over the concatenated file list (tests/test_distributed.py runs the
    real 2-process assertion over localhost CPU).

    Single-process runs return the input unchanged.
    """
    import jax

    local_counts = np.asarray(local_counts)
    if jax.process_count() == 1:
        return local_counts

    from jax.experimental import multihost_utils

    with _rank_failure_watchdog("count merge (process_allgather)"):
        stacked = np.asarray(multihost_utils.process_allgather(local_counts))
    assert stacked.shape == (jax.process_count(),) + local_counts.shape
    return stacked.sum(axis=0, dtype=local_counts.dtype)


def gather_blobs(local: bytes) -> list[bytes]:
    """All-gather one variable-length byte blob per process.

    Returns the list of every process's blob, indexed by process rank, on
    EVERY process.  Built from two fixed-shape process_allgather rounds
    (lengths, then blobs padded to the global max) because the collective
    needs identical shapes on all ranks.  Used by SPMD detection to ship
    per-sample output payloads to rank 0 (pipeline/detect.py); payloads
    transit through host memory, so each rank's share of an output file
    must fit in RAM (they are zlib-compressed text — far smaller than the
    inputs scanned to produce them).
    """
    import jax

    if jax.process_count() == 1:
        return [local]

    from jax.experimental import multihost_utils

    arr = np.frombuffer(local, dtype=np.uint8)
    with _rank_failure_watchdog("payload gather (process_allgather)"):
        lengths = np.asarray(
            multihost_utils.process_allgather(np.int64(arr.size))
        ).reshape(-1)
        m = int(lengths.max())
        if m == 0:
            return [b""] * int(lengths.size)
        padded = np.zeros(m, dtype=np.uint8)
        padded[: arr.size] = arr
        stacked = np.asarray(multihost_utils.process_allgather(padded))
    return [stacked[i, : int(lengths[i])].tobytes() for i in range(lengths.size)]
