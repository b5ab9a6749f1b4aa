#!/usr/bin/env python3
"""Wide-bucket-row experiment: how far does "slice width is free" carry?

Two questions, measured with bench.py's LICM-proof marginal-cost method on
the same 6.7M-key index:

1. gather cost vs row width — a detect-style pass (single gather + meta
   compare + boundary cumsum) over 64/128/256-lane rows.  If the
   serialized per-index access dominates and slice width stays ~free,
   per-step time should barely move.
2. multi-strain classify cost vs strain count — the _classify_multi
   program at S in {32, 48, 64, 96[, 128]} on rows sized 32 + 16*ceil(S/16)
   lanes.  Reports windows/s and the effective strain-lookups/s (= windows/s
   x S), which sets MAX_STRAINS_PER_PASS and the bench.py headline.

Usage: python tools/bench_wide_row.py [--strains 32,48,64,96,128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 31
ROWS, ROW_LEN = 512, 4096
INDEX_KMERS = 6_700_000
SLICES = 4
N_SHORT, N_LONG = 4, 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strains", default="32,48,64,96,128")
    ap.add_argument("--widths", default="64,128,256")
    ap.add_argument("--kmers", type=int, default=INDEX_KMERS)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.ops.lookup import bucket_lookup, bucket_lookup_words
    from strainer2_tpu.ops.packing import canonical_codes_np, canonical_windows
    from strainer2_tpu.pipeline.multi_detect import _expand_strain_bits

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=args.kmers + K - 1, dtype=np.uint8)
    t0 = time.time()
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
        codes, valid = canonical_codes_np(genome, K)
        scan = codes[valid]
    codes = np.unique(scan)
    print(f"# {codes.size} unique codes ({time.time()-t0:.1f}s scan) on "
          f"{jax.devices()[0].platform}", file=sys.stderr)

    bases = rng.integers(0, 4, size=(SLICES, ROWS, ROW_LEN), dtype=np.uint8)
    for s in range(SLICES):
        for r in range(0, ROWS, 2):
            start = int(rng.integers(0, genome.size - ROW_LEN))
            bases[s, r] = genome[start : start + ROW_LEN]
    bases_dev = jnp.asarray(bases)
    width = ROW_LEN - K + 1
    lookups_per_step = ROWS * width
    boundaries_dev = jnp.arange(ROWS + 1, dtype=jnp.int32) * width

    def measure(mk, rows, name):
        def run(n):
            f = mk(n)
            total = int(np.asarray(f(rows, bases_dev)))
            t0 = time.time()
            total = int(np.asarray(f(rows, bases_dev)))
            return time.time() - t0, total

        d_short, s_short = run(N_SHORT)
        d_long, s_long = run(N_LONG)
        linear = s_short * N_LONG == s_long * N_SHORT and s_long != 0
        per_step = max((d_long - d_short) / (N_LONG - N_SHORT), 1e-9)
        rate = lookups_per_step / per_step
        print(
            f"{name}: {per_step*1e3:.2f} ms/step -> {rate/1e6:.1f} M windows/s"
            + ("" if linear else f"  WARNING non-linear ({s_short}/{s_long})"),
            flush=True,
        )
        return rate

    def make_chain(body, n):
        @jax.jit
        def chain(rows, b):
            def step(i, carry):
                bi = jax.lax.dynamic_index_in_dim(b, i % SLICES, keepdims=False)
                return carry + body(rows, bi, carry)

            return jax.lax.fori_loop(0, n, step, jnp.uint32(0))

        return chain

    # --- 1. gather cost vs row width (detect-style single-strain pass) ---
    for w in (int(x) for x in args.widths.split(",")):
        t = build_bucket_table(codes, K, row_width=w)
        kclass = np.ones(t.num_slots, dtype=np.uint32)
        kclass[rng.random(t.num_slots) < 0.01] = 2
        rows_dev = jnp.asarray(t.with_meta(kclass))
        h_bits, salt = t.h_bits, t.salt

        def detect_body(rows, bi, _carry, h_bits=h_bits, salt=salt):
            win = canonical_windows(bi, K)
            found, _, meta = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
            hit = (found & win.valid).reshape(-1)
            informative = hit & (meta.reshape(-1) == 2)
            zero = jnp.zeros(1, dtype=jnp.int32)
            cum_hit = jnp.concatenate([zero, jnp.cumsum(hit.astype(jnp.int32))])
            cum_inf = jnp.concatenate([zero, jnp.cumsum(informative.astype(jnp.int32))])
            b0, b1 = boundaries_dev[:-1], boundaries_dev[1:]
            return (jnp.sum(cum_hit[b1] - cum_hit[b0])
                    + jnp.sum(cum_inf[b1] - cum_inf[b0])).astype(jnp.uint32)

        measure(lambda n: make_chain(detect_body, n), rows_dev, f"detect w={w}")
        del rows_dev

    # --- 2. multi-strain classify vs S ---
    for S in (int(x) for x in args.strains.split(",")):
        n_words = max(2, -(-S // 16))
        t = build_bucket_table(codes, K, row_width=32 + 16 * n_words)
        words_np = [
            rng.integers(0, 1 << 32, size=t.num_slots, dtype=np.uint64).astype(np.uint32)
            for _ in range(n_words)
        ]
        rows_dev = jnp.asarray(t.with_meta_words(words_np))
        h_bits, salt = t.h_bits, t.salt

        def multi_body(rows, bi, _carry, h_bits=h_bits, salt=salt, S=S,
                       n_words=n_words):
            win = canonical_windows(bi, K)
            found, _, words = bucket_lookup_words(
                rows, h_bits, salt, win.hi, win.lo, n_words
            )
            hit = (found & win.valid).reshape(-1)
            ps, infs = [], []
            for j, wd in enumerate(words):
                n_j = min(16, S - 16 * j)
                if n_j <= 0:
                    break
                p_j, i_j = _expand_strain_bits(
                    jnp.where(hit, wd.reshape(-1), 0), n_j, jnp
                )
                ps.append(p_j)
                infs.append(i_j)
            present = jnp.concatenate(ps, axis=1)
            informative = jnp.concatenate(infs, axis=1)
            zero = jnp.zeros((1, S), dtype=jnp.int32)
            cum_tot = jnp.concatenate([zero, jnp.cumsum(present, axis=0)])
            cum_inf = jnp.concatenate([zero, jnp.cumsum(informative, axis=0)])
            b0, b1 = boundaries_dev[:-1], boundaries_dev[1:]
            return (jnp.sum(cum_tot[b1] - cum_tot[b0])
                    + jnp.sum(cum_inf[b1] - cum_inf[b0])).astype(jnp.uint32)

        rate = measure(lambda n: make_chain(multi_body, n), rows_dev, f"multi S={S}")
        print(f"  -> effective {rate * S / 1e9:.3f} G strain-lookups/s", flush=True)
        del rows_dev


if __name__ == "__main__":
    main()
