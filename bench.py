#!/usr/bin/env python3
"""Headline benchmark: canonical k-mer lookups/s on one chip.

Measures the engine's hot loop — 2-bit canonical window extraction +
cuckoo membership lookup + deterministic count scatter — over a
strain-scale index (~6.7M k-mers, matching the bundled Bacteroides
example) with a realistic hit/miss mix.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "lookups/s", "vs_baseline": N}

Baseline: the reference C engine sustains ~1e7 canonical-k-mer hash
lookups/s/core (BASELINE.md "implied reference lookup throughput").
"""

import json
import sys
import time

import numpy as np

BASELINE_LOOKUPS_PER_S = 1.0e7

K = 31
ROWS, ROW_LEN = 512, 4096
INDEX_KMERS = 6_700_000
WARMUP_STEPS = 3
BENCH_STEPS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.pipeline.engine import KmerEngine

    rng = np.random.default_rng(7)

    # strain-scale index: unique canonical codes from a synthetic genome
    # scan.  Built host-side: index build is the cold path, and keeping the
    # benchmark loop free of bulk device<->host traffic measures the chip,
    # not the attachment transport.
    genome = rng.integers(0, 4, size=INDEX_KMERS + K - 1, dtype=np.uint8)
    engine = KmerEngine(K)
    t0 = time.time()
    from strainer2_tpu.ops.packing import canonical_codes_np

    scan, valid = canonical_codes_np(genome, K)
    index = StrainIndex.from_scan_codes(scan[valid], k=K)
    build_s = time.time() - t0
    t = index.table
    table = index.device_table()

    # query batch: half genome-derived rows (hits), half random rows (misses)
    bases = rng.integers(0, 4, size=(ROWS, ROW_LEN), dtype=np.uint8)
    for r in range(0, ROWS, 2):
        start = int(rng.integers(0, genome.size - ROW_LEN))
        bases[r] = genome[start : start + ROW_LEN]
    bases_dev = jnp.asarray(bases)
    lookups_per_step = ROWS * (ROW_LEN - K + 1)

    counts = jnp.zeros(t.num_slots, dtype=jnp.uint32)
    for _ in range(WARMUP_STEPS):
        counts = engine.count_batch(counts, table, t.h_bits, t.salt, bases_dev)
    counts.block_until_ready()

    t0 = time.time()
    for _ in range(BENCH_STEPS):
        counts = engine.count_batch(counts, table, t.h_bits, t.salt, bases_dev)
    counts.block_until_ready()
    dt = time.time() - t0

    lookups_per_s = BENCH_STEPS * lookups_per_step / dt
    print(
        f"# index build: {build_s:.1f}s for {index.num_kmers} kmers; "
        f"steady state: {dt:.3f}s for {BENCH_STEPS} steps "
        f"({lookups_per_step} lookups/step) on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "canonical_kmer_lookups_per_s_per_chip",
                "value": round(lookups_per_s),
                "unit": "lookups/s",
                "vs_baseline": round(lookups_per_s / BASELINE_LOOKUPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
