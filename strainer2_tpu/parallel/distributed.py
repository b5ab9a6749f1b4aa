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

import os

import numpy as np

__all__ = ["initialize", "host_file_partition", "merge_across_hosts"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed bring-up; no-ops gracefully for single-process runs.

    Returns (process_index, process_count).
    """
    import jax

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # idempotent across pipeline invocations in one process (e.g. a
            # driver looping run_scrub_count over strains)
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def host_file_partition(paths: list[str], process_index: int,
                        process_count: int) -> list[str]:
    """Greedy size-balanced assignment of panel files to this host.

    Deterministic across hosts (every host computes the same full
    assignment and takes its share), so no coordination is needed.
    """
    sizes = []
    for p in paths:
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            sizes.append(0)
    order = np.argsort(-np.asarray(sizes), kind="stable")
    load = [0] * process_count
    # assign by POSITION, not by path value: duplicate list entries are a
    # supported input (they re-count) and each occurrence must land on
    # exactly one host
    mine_idx: list[int] = []
    for i in order:
        h = int(np.argmin(load))
        load[h] += sizes[i] or 1
        if h == process_index:
            mine_idx.append(int(i))
    # preserve the original list order within this host's share
    return [paths[i] for i in sorted(mine_idx)]


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

    stacked = np.asarray(multihost_utils.process_allgather(local_counts))
    assert stacked.shape == (jax.process_count(),) + local_counts.shape
    return stacked.sum(axis=0, dtype=local_counts.dtype)
