#!/usr/bin/env python3
"""Scaling-efficiency benchmark: aggregate lookups/s vs device count.

Runs the sharded counting step over (data=N, index=1) meshes for growing N
using whatever devices the process sees (a real pod slice, or a virtual
CPU mesh via --xla_force_host_platform_device_count for plumbing checks),
and reports aggregate throughput + efficiency vs the 1-device rate.

Single-chip environments (like the round-1 bench host) can only validate
the harness; real multi-chip numbers require a pod slice.

Usage: python tools/bench_scaling.py [--kmers 2000000] [--steps 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 31
ROWS_PER_DEV, ROW_LEN = 64, 4096


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmers", type=int, default=2_000_000)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.ops.packing import canonical_codes_np
    from strainer2_tpu.parallel.sharding import ShardedKmerEngine, make_mesh

    devices = jax.devices()
    virtual = devices[0].platform == "cpu"
    print(
        f"# platform={devices[0].platform} n_devices={len(devices)}"
        + (
            "  (VIRTUAL mesh: devices share the host's cores, so aggregate "
            "throughput cannot grow with N; the signal is (a) flat aggregate "
            "= zero sharding/collective overhead and (b) exactly-linear hit "
            "sums = bit-exact sharded counting)"
            if virtual
            else ""
        )
    )
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=args.kmers + K - 1, dtype=np.uint8)
    codes, valid = canonical_codes_np(genome, K)
    index = StrainIndex.from_scan_codes(codes[valid], k=K, layout="bucket")
    t = index.table

    results = {}
    n = 1
    counts_list = []
    while n <= len(devices):
        rows = ROWS_PER_DEV * n
        bases = rng.integers(0, 4, size=(rows, ROW_LEN), dtype=np.uint8)
        for r in range(0, rows, 2):
            s = int(rng.integers(0, genome.size - ROW_LEN))
            bases[r] = genome[s : s + ROW_LEN]

        mesh = make_mesh(n, 1, devices=devices[:n])
        eng = ShardedKmerEngine(K, mesh, t.h_bits, t.salt, t.num_slots, layout="bucket")
        table = jax.device_put(
            jnp.asarray(t.table), NamedSharding(mesh, P("index", None))
        )
        bases_dev = jax.device_put(
            jnp.asarray(bases), NamedSharding(mesh, P("data", None))
        )
        counts = eng.init_counts()
        counts = eng.count_batch(counts, table, bases_dev)  # compile+warm
        jax.block_until_ready(counts)
        t0 = time.time()
        for _ in range(args.steps):
            counts = eng.count_batch(counts, table, bases_dev)
        total = int(eng.merge_counts(counts).sum())  # forces completion
        dt = time.time() - t0
        lookups = args.steps * rows * (ROW_LEN - K + 1)
        results[n] = lookups / dt
        base = results[1]
        eff = results[n] / (base * n) * 100
        overhead = results[n] / base * 100
        print(
            f"devices={n:3d}  aggregate={results[n]/1e6:8.1f} M lookups/s  "
            + (
                f"aggregate-vs-1dev={overhead:5.1f}% (100% = no sharding overhead)"
                if virtual
                else f"efficiency={eff:5.1f}%"
            )
            + f"  (hits {total})"
        )
        n *= 2

    counts_list  # keep linters quiet


if __name__ == "__main__":
    main()
