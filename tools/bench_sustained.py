#!/usr/bin/env python3
"""Sustained DEVICE-FED panel counting: host decode/pack -> H2D -> device
count, measured end-to-end.

The headline count rate (bench.py, 46 M windows/s) is an in-jit marginal
cost over device-resident batches; this tool converts it into a pipeline
claim by streaming a real panel from disk through the production device
path (NativePackStream -> prefetch -> engine.count_batch) with a
device-resident accumulator and a SINGLE end-of-run readback — no bulk
D2H, so the relay pathologies (docs/PERFORMANCE.md "Measurement
caveats") do not apply; per-batch dispatches do cross the relay, which
is itself part of what this measures.

Three passes over the same panel isolate the stages:

  pack   — host decode + pack only (NativePackStream drained, no device)
  feed   — + H2D and a trivial device op per batch (transfer + dispatch)
  count  — + the real lookup/scatter kernel (production path, prefetch
           thread overlapping host pack with device work)

The binding stage is whichever pass's marginal time dominates.
Reference workload shape: /root/reference/src/kmer_scrub_count.c:19-20
(16-68 min single-core panel scans).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sustained.py
       [--panel /tmp/scale20/metagenomes_to_scrub.txt]
       [--genome /tmp/scale20/strains/<strain>.fna.gz] [--files N]
"""

import argparse
import os
import sys
import time

import numpy as np

K = 31
ROWS, ROW_LEN = 256, 4096

DEF_DIR = "/tmp/scale20"
DEF_STRAIN = (
    "strains/Bacteroides_ovatus_1001283st1_B8_1001283B150210_160208.fna.gz"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--panel", default=os.path.join(DEF_DIR, "metagenomes_to_scrub.txt"))
    ap.add_argument("--genome", default=os.path.join(DEF_DIR, DEF_STRAIN))
    ap.add_argument("--files", type=int, default=0, help="limit panel files")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.native import NativePackStream, scan_file_codes_native
    from strainer2_tpu.pipeline.engine import KmerEngine
    from strainer2_tpu.utils.prefetch import prefetch

    dev0 = jax.devices()[0]
    print(f"# backend: {dev0.platform}", file=sys.stderr)

    base = os.path.dirname(os.path.abspath(args.panel))
    paths = []
    with open(args.panel) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                p = line if os.path.isabs(line) else os.path.join(base, line)
                paths.append(p)
    if args.files:
        paths = paths[: args.files]
    total_bytes_gz = sum(os.path.getsize(p) for p in paths)
    print(f"# panel: {len(paths)} files, {total_bytes_gz/1e6:.0f} MB gz",
          file=sys.stderr)

    t0 = time.time()
    scan = scan_file_codes_native(args.genome, K)
    index = StrainIndex.from_scan_codes(scan, k=K, layout="bucket")
    t = index.table
    print(f"# index: {index.num_kmers} kmers, built {time.time()-t0:.1f}s "
          "(host-side)", file=sys.stderr)
    engine = KmerEngine(K, layout="bucket")
    table_dev = jnp.asarray(t.table)

    def pack_pass():
        n_batches = 0
        t0 = time.time()
        for batch in NativePackStream(paths, K, ROWS, ROW_LEN):
            n_batches += 1
        return time.time() - t0, n_batches

    @jax.jit
    def _touch(acc, bases):
        return acc + jnp.sum(bases, dtype=jnp.uint32)

    def feed_pass():
        acc = jnp.zeros((), dtype=jnp.uint32)
        t0 = time.time()
        for batch in NativePackStream(paths, K, ROWS, ROW_LEN):
            acc = _touch(acc, jnp.asarray(batch.bases))
        acc.block_until_ready()
        return time.time() - t0, int(np.asarray(acc))

    def count_pass(use_prefetch=True):
        counts = jnp.zeros(t.num_slots, dtype=jnp.uint32)
        valid = jnp.zeros((), dtype=jnp.int32)
        t0 = time.time()
        stream = NativePackStream(paths, K, ROWS, ROW_LEN)
        it = prefetch(stream) if use_prefetch else stream
        for batch in it:
            counts, n_valid = engine.count_batch_with_valid(
                counts, table_dev, t.h_bits, t.salt, jnp.asarray(batch.bases)
            )
            valid = valid + n_valid
        counts.block_until_ready()
        dt = time.time() - t0
        # the single end-of-run readback (outside the timed window)
        # uint32 checksum (wraps consistently; only used for determinism)
        return dt, int(np.asarray(valid)), int(np.asarray(jnp.sum(counts, dtype=jnp.uint32)))

    # warm compile with one small batch so compile time stays out of the walls
    warm = next(iter(NativePackStream(paths[:1], K, ROWS, ROW_LEN)))
    c0 = jnp.zeros(t.num_slots, dtype=jnp.uint32)
    engine.count_batch_with_valid(
        c0, table_dev, t.h_bits, t.salt, jnp.asarray(warm.bases)
    )[0].block_until_ready()
    _touch(jnp.zeros((), jnp.uint32), jnp.asarray(warm.bases)).block_until_ready()

    d_pack, n_batches = pack_pass()
    d_feed, _ = feed_pass()
    d_count, n_valid, count_sum = count_pass()
    d_count2, n_valid2, count_sum2 = count_pass()  # repeat: relay variance
    assert (n_valid, count_sum) == (n_valid2, count_sum2), "non-deterministic!"

    best_count = min(d_count, d_count2)
    rate = n_valid / best_count
    print(f"# pack-only: {d_pack:.2f}s ({n_batches} batches)", file=sys.stderr)
    print(f"# feed (pack+H2D+trivial): {d_feed:.2f}s", file=sys.stderr)
    print(f"# count (full, prefetch): {d_count:.2f}s / repeat {d_count2:.2f}s",
          file=sys.stderr)
    print(f"# valid windows: {n_valid} ; hit-count sum: {count_sum}",
          file=sys.stderr)
    stages = {
        "host pack": d_pack,
        "H2D+dispatch": max(d_feed - d_pack, 0.0),
        "device count": max(best_count - d_feed, 0.0),
    }
    binding = max(stages, key=stages.get)
    print(
        f"sustained_windows_per_s={rate:.0f} "
        f"pack_s={d_pack:.2f} feed_s={d_feed:.2f} count_s={best_count:.2f} "
        f"binding_stage={binding.replace(' ', '_')}"
    )


if __name__ == "__main__":
    main()
