#!/usr/bin/env python3
"""Sorted-query merge-join lookup experiment (SURVEY §7.3's last untried
escape hatch from the ~13 ns serialized-access floor).

Hypothesis under test: sort each 2M-window query batch (~30 ms by the
measured primitive table), then a *sequential-access* merge join against
the sorted 6.7M-key array replaces BOTH the serialized gather and the
count scatter of the production bucket path.

On a TPU there is no sequential two-pointer walk; the data-parallel
equivalent of the merge join is:

  1. union sort: lax.sort over (hi, lo, tag) of keys+queries
     (keys tag 0, queries tag 1 — a query's predecessor of equal value is
     its key iff the key exists);
  2. forward-fill the last key value with an associative_scan
     ("last non-null" operator over (hi, lo, is_key));
  3. match = query rows whose filled value equals their own.

This yields hit flags in UNION-SORTED order.  Everything the pipeline
needs next — per-key counts in a stable accumulator layout (count path)
or per-window flags in original window order (detect path) — requires
either a compaction over the 6.7M keys or an unsort of the 2M flags,
both of which are themselves serialized-access or sort-class costs.  The
variants below therefore measure a LOWER BOUND for any merge-join-based
step (sort + scan + match + reduce, no unsort/compaction) against the
production paths; if the lower bound already loses, the whole approach
is dead.  Each variant runs in a jitted fori_loop with a loop-dependent
body (LICM-proof marginal-cost method, docs/PERFORMANCE.md "Measurement
caveats"), and the mergejoin variant's total hit count is verified equal
to the production count path's on the same batches.

Reference context: /root/reference/src/genome_compare.c:220 is the
membership loop this would replace.

Usage: run on the TPU (default env); results in docs/PERFORMANCE.md
"Sorted-query merge-join experiment".
"""

import sys
import time

import numpy as np

K = 31
ROWS, ROW_LEN = 512, 4096
INDEX_KMERS = 6_700_000
SLICES = 4
N_SHORT, N_LONG = 2, 10

if "--small" in sys.argv:  # CPU smoke test of the variant bodies
    ROWS, ROW_LEN = 16, 512
    INDEX_KMERS = 50_000
    N_SHORT, N_LONG = 1, 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.ops.lookup import accumulate_counts, bucket_lookup
    from strainer2_tpu.ops.packing import canonical_codes_np, canonical_windows
    from strainer2_tpu.ops.packing_np import split_code64_np

    rng = np.random.default_rng(7)
    dev0 = jax.devices()[0]
    print(f"# backend: {dev0.platform}", file=sys.stderr)

    genome = rng.integers(0, 4, size=INDEX_KMERS + K - 1, dtype=np.uint8)
    scan = None
    try:  # native rolling scan (seconds); numpy fallback for --small/CPU
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
    index = StrainIndex.from_scan_codes(scan, k=K, layout="bucket")
    t = index.table
    kclass = np.ones(t.num_slots, dtype=np.uint32)
    rows_dev = jnp.asarray(t.with_meta(kclass))

    # sorted key planes for the merge join
    keys_sorted = np.sort(index.codes)
    khi, klo = split_code64_np(keys_sorted, K)
    khi_dev, klo_dev = jnp.asarray(khi), jnp.asarray(klo)
    n_keys = khi.shape[0]

    bases = rng.integers(0, 4, size=(SLICES, ROWS, ROW_LEN), dtype=np.uint8)
    for s in range(SLICES):
        for r in range(0, ROWS, 2):
            start = int(rng.integers(0, genome.size - ROW_LEN))
            bases[s, r] = genome[start : start + ROW_LEN]
    bases_dev = jnp.asarray(bases)
    width = ROW_LEN - K + 1
    q_per_step = ROWS * width
    h_bits, salt = t.h_bits, t.salt

    def query_planes(bi):
        win = canonical_windows(bi, K)
        qhi = win.hi.reshape(-1)
        qlo = win.lo.reshape(-1)
        v = win.valid.reshape(-1)
        # invalid windows -> sentinel above any 31-bit key half: never match
        qhi = jnp.where(v, qhi, jnp.uint32(0xFFFFFFFF))
        qlo = jnp.where(v, qlo, jnp.uint32(0xFFFFFFFF))
        return qhi, qlo

    # --- variants -----------------------------------------------------------
    # Every body takes its big operand (row table / sorted key planes) as
    # an ARGUMENT pytree: closure-captured arrays become XLA constants and
    # blow up the remote-compile payload (docs/PERFORMANCE.md; the relay
    # rejects them outright with HTTP 413).

    def count_body(big, bi, counts):
        win = canonical_windows(bi, K)
        found, slot, _ = bucket_lookup(big, h_bits, salt, win.hi, win.lo)
        return accumulate_counts(counts, slot, found & win.valid)

    def gather_body(big, bi, carry):
        win = canonical_windows(bi, K)
        found, _, _ = bucket_lookup(big, h_bits, salt, win.hi, win.lo)
        return carry + jnp.sum(found & win.valid, dtype=jnp.uint32)

    def qsort_body(big, bi, carry):
        # the precondition alone: 2-key sort of the 2M query batch,
        # carrying the original index (what an unsort would need)
        qhi, qlo = query_planes(bi)
        iota = jnp.arange(q_per_step, dtype=jnp.uint32)
        shi, slo, sidx = jax.lax.sort((qhi, qlo, iota), num_keys=2)
        return carry + shi[0] % 7 + slo[-1] % 5 + sidx[q_per_step // 2] % 3

    def _union_sort(big, bi):
        khi, klo = big
        qhi, qlo = query_planes(bi)
        uhi = jnp.concatenate([khi, qhi])
        ulo = jnp.concatenate([klo, qlo])
        tag = jnp.concatenate(
            [jnp.zeros(n_keys, jnp.uint32), jnp.ones(q_per_step, jnp.uint32)]
        )
        return jax.lax.sort((uhi, ulo, tag), num_keys=3)

    def mergejoin_body(big, bi, carry):
        # lower bound of any merge-join step: union sort + forward-fill
        # scan + match + reduce (NO unsort / per-key compaction yet)
        shi, slo, stag = _union_sort(big, bi)
        is_key = stag == 0

        def combine(a, b):
            ah, al, af = a
            bh, bl, bf = b
            return (
                jnp.where(bf, bh, ah),
                jnp.where(bf, bl, al),
                af | bf,
            )

        fh, fl, ff = jax.lax.associative_scan(
            combine, (shi, slo, is_key)
        )
        match = (~is_key) & ff & (fh == shi) & (fl == slo)
        return carry + jnp.sum(match, dtype=jnp.uint32)

    def usort_body(big, bi, carry):
        # union sort alone (no scan/match): isolates the sort cost
        shi, slo, stag = _union_sort(big, bi)
        return carry + shi[0] % 7 + slo[-1] % 5 + stag[n_keys] % 3

    from strainer2_tpu.index.hashing import cuckoo_slots

    def _bucket_of(qhi, qlo):
        shi_ = qhi ^ jnp.uint32(salt) if salt else qhi
        return cuckoo_slots(shi_, qlo, h_bits, 0).astype(jnp.uint32)

    def sortedgather_body(big, bi, carry):
        # bucket-sorted gather, NO unsort (lower bound): sort queries by
        # their bucket id (ascending gather addresses — if the ~13
        # ns/access floor is address-locality-sensitive, this finds out),
        # then the same single-row probe in sorted order
        win = canonical_windows(bi, K)
        qhi = win.hi.reshape(-1)
        qlo = win.lo.reshape(-1)
        v = win.valid.reshape(-1).astype(jnp.uint32)
        bucket = _bucket_of(qhi, qlo)
        sb, sqhi, sqlo, sv = jax.lax.sort((bucket, qhi, qlo, v), num_keys=1)
        row = big[sb.astype(jnp.int32)]
        eq = (row[:, 0:16] == sqhi[:, None]) & (row[:, 16:32] == sqlo[:, None])
        found = eq.any(axis=1) & (sv == 1)
        return carry + jnp.sum(found, dtype=jnp.uint32)

    def sortedgather_rt_body(big, bi, carry):
        # full round trip: + original-index payload through the sort and
        # an unsort (second sort) back to window order; the checksum is
        # position-weighted so a wrong order fails the cross-check below
        win = canonical_windows(bi, K)
        qhi = win.hi.reshape(-1)
        qlo = win.lo.reshape(-1)
        v = win.valid.reshape(-1).astype(jnp.uint32)
        iota = jnp.arange(q_per_step, dtype=jnp.uint32)
        bucket = _bucket_of(qhi, qlo)
        sb, sqhi, sqlo, sv, sidx = jax.lax.sort(
            (bucket, qhi, qlo, v, iota), num_keys=1
        )
        row = big[sb.astype(jnp.int32)]
        eq = (row[:, 0:16] == sqhi[:, None]) & (row[:, 16:32] == sqlo[:, None])
        found = (eq.any(axis=1) & (sv == 1)).astype(jnp.uint32)
        _, f_orig = jax.lax.sort((sidx, found), num_keys=1)
        return carry + jnp.sum(f_orig * (iota % 5 + 1), dtype=jnp.uint32)

    def gather_rt_body(big, bi, carry):
        # the production-order twin of sortedgather_rt: same
        # position-weighted checksum, random-order gather (cross-check)
        win = canonical_windows(bi, K)
        found, _, _ = bucket_lookup(big, h_bits, salt, win.hi, win.lo)
        f = (found & win.valid).reshape(-1).astype(jnp.uint32)
        iota = jnp.arange(q_per_step, dtype=jnp.uint32)
        return carry + jnp.sum(f * (iota % 5 + 1), dtype=jnp.uint32)

    def make_chain(body, n):
        @jax.jit
        def chain(big, b):
            def step(i, carry):
                bi = jax.lax.dynamic_index_in_dim(b, i % SLICES, keepdims=False)
                return carry + body(big, bi, carry)

            return jax.lax.fori_loop(0, n, step, jnp.uint32(0))

        return chain

    def count_chain(n):
        @jax.jit
        def chain(big, b):
            def step(i, counts):
                bi = jax.lax.dynamic_index_in_dim(b, i % SLICES, keepdims=False)
                return count_body(big, bi, counts)

            counts = jnp.zeros(t.num_slots, dtype=jnp.uint32)
            return jnp.sum(jax.lax.fori_loop(0, n, step, counts), dtype=jnp.uint32)

        return chain

    def measure(mk, big, name):
        def run(n):
            f = mk(n)
            total = int(np.asarray(f(big, bases_dev)))
            t0 = time.time()
            total = int(np.asarray(f(big, bases_dev)))
            return time.time() - t0, total

        d_short, s_short = run(N_SHORT)
        d_long, s_long = run(N_LONG)
        per_step = max((d_long - d_short) / (N_LONG - N_SHORT), 1e-9)
        print(
            f"# {name}: {N_SHORT} steps {d_short:.3f}s, {N_LONG} steps "
            f"{d_long:.3f}s -> {per_step * 1e3:.2f} ms/step "
            f"({q_per_step / per_step / 1e6:.1f} M windows/s)",
            file=sys.stderr,
        )
        return per_step

    keys_big = (khi_dev, klo_dev)
    variants = {
        "count": (count_chain, rows_dev, "count (production gather+scatter)"),
        "gather": (lambda n: make_chain(gather_body, n), rows_dev,
                   "gather-only (detect floor)"),
        "qsort": (lambda n: make_chain(qsort_body, n), keys_big,
                  "query sort only (2M, 2-key)"),
        "usort": (lambda n: make_chain(usort_body, n), keys_big,
                  "union sort only (8.8M, 3-key)"),
        "mergejoin": (lambda n: make_chain(mergejoin_body, n), keys_big,
                      "merge join lower bound (union sort + scan + match)"),
        "sortedgather": (lambda n: make_chain(sortedgather_body, n), rows_dev,
                         "bucket-sorted gather, no unsort (lower bound)"),
        "sortedgather_rt": (lambda n: make_chain(sortedgather_rt_body, n),
                            rows_dev,
                            "bucket-sorted gather + unsort (round trip)"),
        "gather_rt": (lambda n: make_chain(gather_rt_body, n), rows_dev,
                      "random gather, position-weighted (rt twin)"),
    }
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = sys.argv[i + 1].split(",")
    for name, (mk, big, label) in variants.items():
        if only is None or name in only:
            measure(mk, big, label)

    # correctness, jitted whole (an eager run would dispatch hundreds of
    # relay round-trips) and AFTER the timings (readbacks degrade the
    # transport):
    #  - merge-join total hits == production total hits
    #  - sorted-gather round trip == random-gather position-weighted sum
    #    (proves the unsort restored window order exactly)
    @jax.jit
    def hits_production(rows, bi):
        win = canonical_windows(bi, K)
        found, _, _ = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
        return jnp.sum(found & win.valid, dtype=jnp.uint32)

    @jax.jit
    def hits_merge(big, bi):
        z = jnp.uint32(0)
        return mergejoin_body(big, bi, z) - z

    @jax.jit
    def rt_pair(rows, bi):
        z = jnp.uint32(0)
        return sortedgather_rt_body(rows, bi, z) - z, gather_rt_body(rows, bi, z) - z

    check_merge = only is None or "mergejoin" in only
    check_rt = only is None or "sortedgather_rt" in only
    for s in range(SLICES):
        a = int(np.asarray(hits_production(rows_dev, bases_dev[s])))
        assert a > 0
        if check_merge:
            b = int(np.asarray(hits_merge(keys_big, bases_dev[s])))
            assert a == b, (s, a, b)
        if check_rt:
            srt, grt = (int(np.asarray(x)) for x in rt_pair(rows_dev, bases_dev[s]))
            assert srt == grt, (s, srt, grt)
    print("# correctness checks passed on all batches "
          f"(merge={check_merge}, rt={check_rt})", file=sys.stderr)


if __name__ == "__main__":
    main()
