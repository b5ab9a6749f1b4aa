"""Multi-host launch helpers.

The reference's only scale-out is one-strain-per-Snakemake-job
(SURVEY.md §2.7).  Here a single strain's panel counting scales across a
multi-host TPU slice:

- every host runs the same program (SPMD) after :func:`initialize`;
- panel files are partitioned across hosts by :func:`host_file_partition`
  (greedy size-balanced — files differ wildly in size);
- each host streams its files through its local devices' shard_map engine
  (strainer2_tpu.parallel.sharding) into its private count shards;
- :func:`merge_across_hosts` psums the host-local merged count vectors
  over all devices (ICI within a slice, DCN across slices — XLA picks).

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
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
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
    mine: list[str] = []
    for i in order:
        h = int(np.argmin(load))
        load[h] += sizes[i] or 1
        if h == process_index:
            mine.append(paths[i])
    # preserve the original list order within this host's share
    mine_set = set(mine)
    return [p for p in paths if p in mine_set]


def merge_across_hosts(local_counts: np.ndarray) -> np.ndarray:
    """Sum host-local count vectors over every process (bit-exact).

    Uses a tiny jitted psum over a 1-D device mesh of all global devices;
    single-process runs return the input unchanged.
    """
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return local_counts

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map  # type: ignore

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("all",))
    n_local = len(jax.local_devices())

    # each local device carries the host's counts; psum over every device
    # then divide by the local replication factor
    def body(c):
        return jax.lax.psum(c, "all") // n_local

    f = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P(), out_specs=P()),
    )
    arr = jnp.asarray(local_counts)
    return np.asarray(f(arr))
