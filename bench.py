#!/usr/bin/env python3
"""Headline benchmark: canonical k-mer lookups/s on one chip.

Measures the engine's hot loop — 2-bit canonical window extraction +
cuckoo membership lookup + deterministic count scatter — over a
strain-scale index (6.7M k-mers, matching the bundled Bacteroides
example) with a realistic hit/miss mix.

Methodology (see docs/PERFORMANCE.md "Measurement caveats"): the step runs
inside a jitted lax.fori_loop whose body depends on the loop counter (so
XLA cannot hoist the lookup as loop-invariant), timed end-to-end
(including the single result readback) at two chain lengths; the marginal
cost per step is reported.  The accumulated hit count is checked for
linearity across chain lengths, which fails if any execution is elided.

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
SLICES = 4  # LICM-defeating rotation of input batches
N_SHORT, N_LONG = 4, 36  # chain lengths (both multiples of SLICES)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.ops.lookup import accumulate_counts, bucket_lookup
    from strainer2_tpu.ops.packing import canonical_codes_np, canonical_windows

    rng = np.random.default_rng(7)

    # strain-scale index, built host-side (cold path; keeps the benchmark
    # loop free of bulk device<->host traffic)
    genome = rng.integers(0, 4, size=INDEX_KMERS + K - 1, dtype=np.uint8)
    t0 = time.time()
    scan = None
    try:
        import os
        import tempfile

        from strainer2_tpu.native import scan_file_codes_native

        with tempfile.NamedTemporaryFile("wb", suffix=".fa", delete=False) as f:
            f.write(b">g\n")
            f.write(bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[genome]))
            f.write(b"\n")
            tmp = f.name
        scan = scan_file_codes_native(tmp, K)
        os.unlink(tmp)
    except Exception:
        scan = None
    if scan is None:
        codes, valid = canonical_codes_np(genome, K)
        scan = codes[valid]
    index = StrainIndex.from_scan_codes(scan, k=K)
    build_s = time.time() - t0
    t = index.table
    rows_dev = index.device_table()  # bucket layout: (num_buckets, 64) rows

    # query slices: half genome-derived rows (hits), half random (misses)
    bases = rng.integers(0, 4, size=(SLICES, ROWS, ROW_LEN), dtype=np.uint8)
    for s in range(SLICES):
        for r in range(0, ROWS, 2):
            start = int(rng.integers(0, genome.size - ROW_LEN))
            bases[s, r] = genome[start : start + ROW_LEN]
    bases_dev = jnp.asarray(bases)
    lookups_per_step = ROWS * (ROW_LEN - K + 1)

    h_bits, salt = t.h_bits, t.salt

    def make_chain(n):
        @jax.jit
        def chain(rows, b):
            def body(i, counts):
                bi = jax.lax.dynamic_index_in_dim(b, i % SLICES, keepdims=False)
                win = canonical_windows(bi, K)
                found, slot, _ = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
                return accumulate_counts(counts, slot, found & win.valid)

            counts = jnp.zeros(t.num_slots, dtype=jnp.uint32)
            out = jax.lax.fori_loop(0, n, body, counts)
            return jnp.sum(out, dtype=jnp.uint32)

        return chain

    def run(n):
        f = make_chain(n)
        total = int(np.asarray(f(rows_dev, bases_dev)))  # compile + warm
        t0 = time.time()
        total = int(np.asarray(f(rows_dev, bases_dev)))
        return time.time() - t0, total

    d_short, sum_short = run(N_SHORT)
    d_long, sum_long = run(N_LONG)

    if sum_short * N_LONG != sum_long * N_SHORT or sum_long == 0:
        print(
            f"# WARNING: non-linear hit sums ({sum_short}@{N_SHORT} vs "
            f"{sum_long}@{N_LONG}); execution may have been elided",
            file=sys.stderr,
        )

    per_step = max((d_long - d_short) / (N_LONG - N_SHORT), 1e-9)
    lookups_per_s = lookups_per_step / per_step
    print(
        f"# index build {build_s:.1f}s ({index.num_kmers} kmers); chains: "
        f"{N_SHORT} steps {d_short:.3f}s, {N_LONG} steps {d_long:.3f}s -> "
        f"{per_step * 1e3:.2f} ms/step of {lookups_per_step} lookups on "
        f"{jax.devices()[0].platform}",
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
