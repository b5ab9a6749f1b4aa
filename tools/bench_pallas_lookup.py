#!/usr/bin/env python3
"""Measure the Pallas DMA-gather lookup experiments against the XLA gather.

Answers VERDICT.md round-2 task #1: does a scalar-prefetch /
index-dependent-BlockSpec (or hand-pipelined) HBM row DMA beat XLA's
serialized ~13 ns/index gather on v5e?  Run on the real TPU:

    python tools/bench_pallas_lookup.py [--kmers 6700000] [--queries 262144]

Methodology is the repo-standard LICM-proof marginal-cost chain
(docs/PERFORMANCE.md "Measurement caveats"): each lookup step runs inside
a jitted lax.fori_loop whose body rotates input slices by loop counter,
timed at two chain lengths; the marginal per-step cost is reported and
result sums are checked for linearity.  Every variant resolves the exact
(found, slot, meta) bucket-lookup contract on the same query stream.

Results are recorded in docs/PERFORMANCE.md (positive or negative — a
hardware-limit claim needs the numbers on record either way).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 31
SLICES = 4
N_SHORT, N_LONG = 4, 36


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmers", type=int, default=6_700_000)
    ap.add_argument("--queries", type=int, default=262_144, help="lookups per chain step")
    ap.add_argument("--variants", default="xla,manual8x4,manual8x8,manual16x4,manual16x8,gridmap8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.ops.lookup import bucket_lookup
    from strainer2_tpu.ops.packing_np import split_code64_np
    from strainer2_tpu.ops.pallas_lookup import (
        bucket_lookup_pallas_gridmap,
        bucket_lookup_pallas_manual,
    )

    rng = np.random.default_rng(11)
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    t0 = time.time()
    codes = np.unique(rng.integers(0, 1 << 62, size=int(args.kmers * 1.01), dtype=np.uint64))[
        : args.kmers
    ]
    table = build_bucket_table(codes, K)
    meta = (np.arange(table.num_slots, dtype=np.uint64) * 2654435761 & 0xFFFFFFFF).astype(
        np.uint32
    )
    rows_dev = jnp.asarray(table.with_meta(meta))
    print(
        f"# table: {codes.size} keys, 2^{table.h_bits} buckets "
        f"({(1 << table.h_bits) * 256 / 1e6:.0f} MB), built {time.time() - t0:.1f}s",
        file=sys.stderr,
    )

    q = np.where(
        rng.random((SLICES, args.queries)) < 0.5,
        codes[rng.integers(0, codes.size, size=(SLICES, args.queries))],
        rng.integers(0, 1 << 62, size=(SLICES, args.queries), dtype=np.uint64),
    )
    qhi_np, qlo_np = split_code64_np(q.reshape(-1), K)
    qhi_dev = jnp.asarray(qhi_np.reshape(SLICES, -1))
    qlo_dev = jnp.asarray(qlo_np.reshape(SLICES, -1))

    h_bits, salt = table.h_bits, table.salt

    def xla_step(rows, qhi, qlo):
        return bucket_lookup(rows, h_bits, salt, qhi, qlo)

    def make_variant(name):
        if name == "xla":
            return xla_step
        if name.startswith("manual"):
            w, d = (int(x) for x in name[len("manual") :].split("x"))
            chunk = max(w * d * 8, 1024)

            def step(rows, qhi, qlo, w=w, d=d, chunk=chunk):
                return bucket_lookup_pallas_manual(
                    rows, h_bits, salt, qhi, qlo, w=w, d=d, chunk=chunk,
                    interpret=False,
                )

            return step
        if name.startswith("gridmap"):
            g = int(name[len("gridmap") :])
            block = 4096  # queries per pallas_call (scalar-prefetch SMEM cap)

            def step(rows, qhi, qlo, g=g):
                def one(qs):
                    f, s, m = bucket_lookup_pallas_gridmap(
                        rows, h_bits, salt, qs[0], qs[1], group=g, interpret=False
                    )
                    return f, s, m

                f, s, m = jax.lax.map(
                    one, (qhi.reshape(-1, block), qlo.reshape(-1, block))
                )
                return f.reshape(-1), s.reshape(-1), m.reshape(-1)

            return step
        raise ValueError(name)

    def measure(name):
        step = make_variant(name)

        def mk(n):
            @jax.jit
            def chain(rows, qhis, qlos):
                def body(i, carry):
                    qh = jax.lax.dynamic_index_in_dim(qhis, i % SLICES, keepdims=False)
                    ql = jax.lax.dynamic_index_in_dim(qlos, i % SLICES, keepdims=False)
                    found, slot, meta = step(rows, qh, ql)
                    t = jnp.sum(
                        jnp.where(found.reshape(-1), meta.reshape(-1), 0),
                        dtype=jnp.uint32,
                    ) + jnp.sum(found.astype(jnp.uint32))
                    return carry + t

                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

            return chain

        def run(n):
            f = mk(n)
            total = int(np.asarray(f(rows_dev, qhi_dev, qlo_dev)))
            t0 = time.time()
            total = int(np.asarray(f(rows_dev, qhi_dev, qlo_dev)))
            return time.time() - t0, total

        d_short, s_short = run(N_SHORT)
        d_long, s_long = run(N_LONG)
        # carry is uint32: compare linearity modulo 2^32
        linear = (s_short * N_LONG - s_long * N_SHORT) % (1 << 32) == 0 and s_long != 0
        per_step = max((d_long - d_short) / (N_LONG - N_SHORT), 1e-9)
        rate = args.queries / per_step
        print(
            f"{name:12s}  {per_step * 1e3:9.3f} ms/step  {rate / 1e6:9.2f} M lookups/s"
            f"  sums {s_short}/{s_long}"
            + ("" if linear else "  WARNING: NON-LINEAR (elided?)")
        )
        return rate

    results = {}
    for name in args.variants.split(","):
        name = name.strip()
        try:
            results[name] = measure(name)
        except Exception as e:  # record compile/runtime failures as data
            msg = str(e).split("\n")[0][:200]
            print(f"{name:12s}  FAILED: {type(e).__name__}: {msg}")
    if "xla" in results:
        base = results["xla"]
        for name, r in results.items():
            if name != "xla":
                print(f"# {name}: {r / base:.2f}x vs xla")


if __name__ == "__main__":
    main()
