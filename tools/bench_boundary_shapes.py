#!/usr/bin/env python3
"""In-jit marginal cost of the classify bodies vs READ-BOUNDARY count.

bench.py measures detect/multi bodies with ROWS+1 = 513 boundaries (one
read per packed row).  The production detection path carries the packer's
static worst-case read capacity — max_reads_capacity(31, 256, 4096) + 1 =
33,025 boundaries — and the boundary-correction term of the two-level
chunked prefix (ops/segsum.py) scales with R x chunk, not with Q.  This
tool measures the SAME bodies at several boundary counts with the same
LICM-proof fori_loop method, isolating the R-term the sustained
device-fed numbers exposed (tools/bench_sustained_detect.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/bench_boundary_shapes.py [--widths 1,32,256] [--rvals 513,8449,33025]
    [--chunks 256]
"""

import argparse
import json
import sys
import time

import numpy as np

K = 31
ROWS, ROW_LEN = 256, 4096
INDEX_KMERS = 6_700_000
SLICES = 4
N_SHORT, N_LONG = 4, 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="1,32,256")
    ap.add_argument("--rvals", default="513,8449,33025")
    ap.add_argument("--chunks", default="256")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]
    rvals = [int(r) for r in args.rvals.split(",")]
    chunks = [int(c) for c in args.chunks.split(",")]

    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.ops.lookup import (
        bucket_lookup,
        bucket_lookup_wide,
        bucket_lookup_words,
    )
    from strainer2_tpu.ops.packing import canonical_codes_np, canonical_windows
    from strainer2_tpu.ops.segsum import boundary_strain_sums

    dev0 = jax.devices()[0]
    print(f"# backend: {dev0.platform}", file=sys.stderr)
    rng = np.random.default_rng(7)

    genome = rng.integers(0, 4, size=INDEX_KMERS + K - 1, dtype=np.uint8)
    codes, valid = canonical_codes_np(genome, K)
    index = StrainIndex.from_scan_codes(codes[valid], k=K, layout="bucket")
    t = index.table

    tables = {}
    for s in widths:
        if s == 1:
            kclass = np.ones(t.num_slots, dtype=np.uint32)
            kclass[rng.random(t.num_slots) < 0.01] = 2
            tables[1] = (t, jnp.asarray(t.with_meta(kclass)))
        else:
            n_words = max(2, -(-s // 16))
            tb = (t if n_words <= 2 else
                  build_bucket_table(index.codes, K, row_width=32 + 16 * n_words))
            words = [
                rng.integers(0, 1 << 32, size=tb.num_slots, dtype=np.uint64)
                .astype(np.uint32)
                for _ in range(n_words)
            ]
            tables[s] = (tb, jnp.asarray(tb.with_meta_words(words)))

    bases = rng.integers(0, 4, size=(SLICES, ROWS, ROW_LEN), dtype=np.uint8)
    for sl in range(SLICES):
        for r in range(0, ROWS, 2):
            start = int(rng.integers(0, genome.size - ROW_LEN))
            bases[sl, r] = genome[start : start + ROW_LEN]
    bases_dev = jnp.asarray(bases)
    n_windows = ROWS * (ROW_LEN - K + 1)
    q = n_windows

    def boundaries_for(r_count: int):
        # r_count-1 reads spread evenly over the window axis (realistic
        # monotone starts), final entry = Q
        b = np.linspace(0, q, r_count, dtype=np.int64).astype(np.int32)
        b[-1] = q
        return jnp.asarray(b)

    def make_chain(s, table, boundaries, n, chunk):
        h_bits, salt = table.h_bits, table.salt
        n_words = max(2, -(-s // 16)) if s > 1 else 0

        def body(rows, bi):
            win = canonical_windows(bi, K)
            if s == 1:
                found, _, meta = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
                hit = (found & win.valid).reshape(-1)
                informative = hit & (meta.reshape(-1) == 2)
                zero = jnp.zeros(1, dtype=jnp.int32)
                cum_hit = jnp.concatenate([zero, jnp.cumsum(hit.astype(jnp.int32))])
                cum_inf = jnp.concatenate(
                    [zero, jnp.cumsum(informative.astype(jnp.int32))]
                )
                b0, b1 = boundaries[:-1], boundaries[1:]
                tot = cum_hit[b1] - cum_hit[b0]
                inf = cum_inf[b1] - cum_inf[b0]
            elif s <= 32:
                found, _, mlo, mhi = bucket_lookup_wide(
                    rows, h_bits, salt, win.hi, win.lo
                )
                hit = (found & win.valid).reshape(-1)
                masked = [jnp.where(hit, mlo.reshape(-1), 0),
                          jnp.where(hit, mhi.reshape(-1), 0)]
                tot, inf = boundary_strain_sums(masked, boundaries, s, chunk=chunk)
            else:
                found, _, words = bucket_lookup_words(
                    rows, h_bits, salt, win.hi, win.lo, n_words
                )
                hit = (found & win.valid).reshape(-1)
                masked = [jnp.where(hit, w.reshape(-1), 0) for w in words]
                tot, inf = boundary_strain_sums(masked, boundaries, s, chunk=chunk)
            return (jnp.sum(tot) + jnp.sum(inf)).astype(jnp.uint32)

        @jax.jit
        def chain(rows, b):
            def step(i, carry):
                bi = jax.lax.dynamic_index_in_dim(b, i % SLICES, keepdims=False)
                return carry + body(rows, bi)

            return jax.lax.fori_loop(0, n, step, jnp.uint32(0))

        return chain

    results = {}
    for s in widths:
        table, rows_dev = tables[s]
        for r_count in rvals:
            for chunk in chunks:
                boundaries = boundaries_for(r_count)

                def run(n):
                    f = make_chain(s, table, boundaries, n, chunk)
                    total = int(np.asarray(f(rows_dev, bases_dev)))  # warm
                    t0 = time.time()
                    total = int(np.asarray(f(rows_dev, bases_dev)))
                    return time.time() - t0, total

                d_s, sum_s = run(N_SHORT)
                d_l, sum_l = run(N_LONG)
                linear = (sum_s * N_LONG - sum_l * N_SHORT) % (1 << 32) == 0
                per_step = max((d_l - d_s) / (N_LONG - N_SHORT), 1e-9)
                rate = n_windows / per_step
                key = f"S={s},R={r_count},c={chunk}"
                results[key] = round(rate)
                print(
                    f"# {key}: {per_step*1e3:.2f} ms/step -> "
                    f"{rate/1e6:.1f} M win/s"
                    + ("" if linear else "  WARNING: non-linear"),
                    file=sys.stderr,
                )
    print(json.dumps({"metric": "classify_windows_per_s_by_boundaries",
                      "results": results}))


if __name__ == "__main__":
    main()
