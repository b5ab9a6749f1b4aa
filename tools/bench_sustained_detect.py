#!/usr/bin/env python3
"""Sustained DEVICE-FED detection classify: host decode/pack -> H2D ->
multi-strain classify, measured end-to-end from disk.

The detect/multi rates in bench.py (and BENCH_r0N.json) are in-jit
marginal costs over device-resident batches; this tool converts them into
pipeline claims by streaming the real 20x target metagenomes from disk
through the production detection path (NativePackStream with read-id
boundaries -> prefetch -> the _classify_multi vector program) with
DEVICE-RESIDENT accumulators (per-strain tot/inf sums + valid-window
tally) and a SINGLE end-of-run readback — no per-batch D2H, so the relay
pathologies (docs/PERFORMANCE.md "Measurement caveats") stay out of the
measurement; per-batch dispatches do cross the relay, which is part of
what a sustained number must include.

Passes over the same targets isolate the stages:

  pack      — host decode + pack only (boundaries built, no device)
  feed      — + H2D and a trivial device op per batch
  S=1/32/256 — + the real classify vector program at each strain width
              (single-strain meta, 64-lane wide rows, 288-lane rows — the
              same bodies pipeline/multi_detect._classify_multi runs)

Each classify pass runs twice; accumulator checksums must match
(determinism) and the better wall is reported.  The binding stage is
whichever marginal time dominates.  Reference hot loop shape:
/root/reference/src/strain_detect.c:386-663 (one strain, ~1e7 win/s/core).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/bench_sustained_detect.py [--batch /tmp/scale20/target_metagenomes.txt]
    [--genome /tmp/scale20/strains/...fna.gz] [--files N] [--widths 1,32,256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

K = 31
ROWS, ROW_LEN = 256, 4096  # DetectConfig defaults

DEF_DIR = "/tmp/scale20"
DEF_STRAIN = (
    "strains/Bacteroides_ovatus_1001283st1_B8_1001283B150210_160208.fna.gz"
)


def target_files(batch_path: str) -> list[str]:
    """All target files named by a PE/SE/PEI batch list, in order."""
    base = os.path.dirname(os.path.abspath(batch_path))
    out = []
    with open(batch_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            for p in parts[1:]:
                out.append(p if os.path.isabs(p) else os.path.join(base, p))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=os.path.join(DEF_DIR, "target_metagenomes.txt"))
    ap.add_argument("--genome", default=os.path.join(DEF_DIR, DEF_STRAIN))
    ap.add_argument("--files", type=int, default=0, help="limit target files")
    ap.add_argument("--widths", default="1,32,256")
    ap.add_argument("--rows", type=int, default=ROWS,
                    help="batch rows (256 = the production DetectConfig "
                    "shape; larger amortizes per-batch dispatch latency "
                    "on the relay transport)")
    ap.add_argument("--fixed-boundaries", action="store_true",
                    help="ship ONE device-resident boundaries array instead "
                    "of a per-batch H2D (diagnostic: isolates the relay's "
                    "per-transfer round-trip cost; window totals unchanged, "
                    "per-read split synthetic)")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    import jax
    import jax.numpy as jnp

    rows_cfg = args.rows

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.io.batches import max_reads_capacity
    from strainer2_tpu.native import NativePackStream, scan_file_codes_native
    from strainer2_tpu.ops.lookup import (
        bucket_lookup,
        bucket_lookup_wide,
        bucket_lookup_words,
    )
    from strainer2_tpu.ops.packing import canonical_windows
    from strainer2_tpu.ops.segsum import boundary_strain_sums
    from strainer2_tpu.utils.prefetch import prefetch

    dev0 = jax.devices()[0]
    print(f"# backend: {dev0.platform}", file=sys.stderr)

    paths = target_files(args.batch)
    if args.files:
        paths = paths[: args.files]
    total_bytes_gz = sum(os.path.getsize(p) for p in paths)
    print(f"# targets: {len(paths)} files, {total_bytes_gz/1e6:.0f} MB gz",
          file=sys.stderr)

    t0 = time.time()
    scan = scan_file_codes_native(args.genome, K)
    index = StrainIndex.from_scan_codes(scan, k=K, layout="bucket")
    t = index.table
    print(f"# index: {index.num_kmers} kmers, built {time.time()-t0:.1f}s "
          "(host-side)", file=sys.stderr)

    rng = np.random.default_rng(7)
    max_reads = max_reads_capacity(K, rows_cfg, ROW_LEN)
    n_windows = rows_cfg * (ROW_LEN - K + 1)

    # per-width row tables: the SAME layouts pipeline/multi_detect builds
    # (meta contents don't change the per-query work; ~1% informative for
    # S=1 mirrors the scrubbed set)
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

    def boundaries_of(batch) -> np.ndarray:
        b = np.full(max_reads + 1, n_windows, dtype=np.int32)
        b[: batch.n_reads] = batch.window_starts
        return b

    def stream():
        return NativePackStream(paths, K, rows_cfg, ROW_LEN, with_read_ids=True)

    # ---- stage passes ----
    def pack_pass():
        n_batches = 0
        t0 = time.time()
        for batch in stream():
            boundaries_of(batch)
            n_batches += 1
        return time.time() - t0, n_batches

    @jax.jit
    def _touch(acc, bases, boundaries):
        return acc + jnp.sum(bases, dtype=jnp.uint32) + jnp.sum(
            boundaries.astype(jnp.uint32)
        )

    def feed_pass():
        acc = jnp.zeros((), dtype=jnp.uint32)
        t0 = time.time()
        for batch in stream():
            acc = _touch(acc, jnp.asarray(batch.bases),
                         jnp.asarray(boundaries_of(batch)))
        acc.block_until_ready()
        return time.time() - t0, int(np.asarray(acc))

    def make_step(s, table):
        h_bits, salt = table.h_bits, table.salt
        n_words = max(2, -(-s // 16)) if s > 1 else 0

        @jax.jit
        def step(acc, valid, rows, bases, boundaries):
            win = canonical_windows(bases, K)
            nv = jnp.sum(win.valid.astype(jnp.uint32))
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
                checks = jnp.sum(tot) + jnp.sum(inf)
            elif s <= 32:
                found, _, mlo, mhi = bucket_lookup_wide(
                    rows, h_bits, salt, win.hi, win.lo
                )
                hit = (found & win.valid).reshape(-1)
                masked = [jnp.where(hit, mlo.reshape(-1), 0),
                          jnp.where(hit, mhi.reshape(-1), 0)]
                tot, inf = boundary_strain_sums(masked, boundaries, s)
                checks = jnp.sum(tot) + jnp.sum(inf)
            else:
                found, _, words = bucket_lookup_words(
                    rows, h_bits, salt, win.hi, win.lo, n_words
                )
                hit = (found & win.valid).reshape(-1)
                masked = [jnp.where(hit, w.reshape(-1), 0) for w in words]
                tot, inf = boundary_strain_sums(masked, boundaries, s)
                checks = jnp.sum(tot) + jnp.sum(inf)
            return acc + checks.astype(jnp.uint32), valid + nv

        return step

    fixed_b = None
    if args.fixed_boundaries:
        b = np.linspace(0, n_windows, max_reads + 1, dtype=np.int64)
        fixed_b = jnp.asarray(b.astype(np.int32))

    # ONE jit wrapper per width, created once and reused by warm-up and
    # both timed passes — a fresh wrapper per pass would re-trace and
    # re-compile (minutes over the relay's remote_compile) inside every
    # timed window, which is exactly the bug this tool's first version had
    steps = {s: make_step(s, tables[s][0]) for s in widths}

    def classify_pass(s, put_ahead=False):
        """put_ahead: issue the NEXT batch's device_put transfers before
        dispatching the current step, so H2D overlaps device compute
        (one-deep software pipeline)."""
        _, rows_dev = tables[s]
        step = steps[s]
        acc = jnp.zeros((), dtype=jnp.uint32)
        valid = jnp.zeros((), dtype=jnp.uint32)
        t0 = time.time()
        if not put_ahead:
            for batch in prefetch(stream()):
                bdev = fixed_b if fixed_b is not None else jnp.asarray(
                    boundaries_of(batch))
                acc, valid = step(acc, valid, rows_dev,
                                  jnp.asarray(batch.bases), bdev)
        else:
            import jax

            pending = None
            for batch in prefetch(stream()):
                nxt = (
                    jax.device_put(batch.bases),
                    fixed_b if fixed_b is not None
                    else jax.device_put(boundaries_of(batch)),
                )
                if pending is not None:
                    acc, valid = step(acc, valid, rows_dev, *pending)
                pending = nxt
            if pending is not None:
                acc, valid = step(acc, valid, rows_dev, *pending)
        acc.block_until_ready()
        dt = time.time() - t0
        # single end-of-run readback, outside the timed window
        return dt, int(np.asarray(valid)), int(np.asarray(acc))

    # warm compiles with one small batch (keeps compile out of the walls)
    warm = next(iter(NativePackStream(paths[:1], K, rows_cfg, ROW_LEN,
                                      with_read_ids=True)))
    wb = jnp.asarray(warm.bases)
    wbd = jnp.asarray(boundaries_of(warm))
    _touch(jnp.zeros((), jnp.uint32), wb, wbd).block_until_ready()
    for s in widths:
        _, rows_dev = tables[s]
        steps[s](
            jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32),
            rows_dev, wb, wbd,
        )[0].block_until_ready()

    d_pack, n_batches = pack_pass()
    d_feed, _ = feed_pass()
    print(f"# pack-only: {d_pack:.2f}s ({n_batches} batches)", file=sys.stderr)
    print(f"# feed (pack+H2D+trivial): {d_feed:.2f}s", file=sys.stderr)

    import os as _os

    put_ahead = _os.environ.get("S2_BENCH_PUT_AHEAD", "0") == "1"
    results = {}
    for s in widths:
        d1, nv1, a1 = classify_pass(s, put_ahead)
        d2, nv2, a2 = classify_pass(s, put_ahead)
        assert (nv1, a1) == (nv2, a2), f"non-deterministic at S={s}!"
        best = min(d1, d2)
        rate = nv1 / best
        stages = {
            "host_pack": d_pack,
            "H2D+dispatch": max(d_feed - d_pack, 0.0),
            "device_classify": max(best - d_feed, 0.0),
        }
        binding = max(stages, key=stages.get)
        results[s] = {
            "sustained_windows_per_s": round(rate),
            "effective_strain_lookups_per_s": round(rate * s),
            "wall_s": round(best, 2),
            "repeat_wall_s": round(max(d1, d2), 2),
            "binding_stage": binding,
        }
        print(
            f"# S={s}: {d1:.2f}s / repeat {d2:.2f}s, {nv1} valid windows -> "
            f"{rate/1e6:.1f} M win/s sustained ({rate*s/1e9:.2f}G effective), "
            f"binding: {binding}",
            file=sys.stderr,
        )

    print(json.dumps({
        "metric": "sustained_detect_windows_per_s",
        "pack_s": round(d_pack, 2),
        "feed_s": round(d_feed, 2),
        "n_batches": n_batches,
        "per_width": results,
    }))


if __name__ == "__main__":
    main()
