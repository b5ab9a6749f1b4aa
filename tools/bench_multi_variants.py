#!/usr/bin/env python3
"""Where does the multi-strain classify spend its time, and can narrower
dtypes buy it back?

At S=96 the pass runs ~26 M windows/s vs the ~75 M windows/s gather-only
ceiling (tools/bench_wide_row.py), so ~65% of the step is the
expand+cumsum vector program, not the serialized gather.  This tool
measures isolated ablations and dtype variants of the classify body on
the same 6.7M-key index / 128-lane rows:

  gather      — bucket_lookup_words + trivial reduce (the floor)
  expand_only — + bit expand to (Q, 2S), sum (no cumsum)
  full_i32    — production body (int32 expand, int32 cumsum)
  full_i8     — int8 expand, cumsum(dtype=int32): 4x less expand traffic
  full_fused  — ONE (Q, 2S) int8 expand + ONE int32 cumsum, present and
                informative interleaved (decoded at the 513 boundaries)
  full_chunked — two-level chunked prefix (ops/segsum.py): fused
                expand+reduce to (Q/256, 2S) chunk sums, a 256x shorter
                cumsum, and per-boundary intra-chunk correction

All variants verify the same per-read totals (summed) so XLA cannot elide
work.  LICM-proof marginal-cost timing as in bench.py.

Usage: python tools/bench_multi_variants.py [--strains 96]
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
    ap.add_argument("--strains", type=int, default=96)
    ap.add_argument("--kmers", type=int, default=INDEX_KMERS)
    ap.add_argument(
        "--variants",
        default="gather,expand_only,full_i32,full_i8,full_fused,full_chunked",
        help="comma list; run one per process on a contended relay",
    )
    ap.add_argument("--long", type=int, default=N_LONG)
    args = ap.parse_args()
    n_long = args.long
    chosen = set(args.variants.split(","))
    S = args.strains
    n_words = max(2, -(-S // 16))

    import jax
    import jax.numpy as jnp

    from strainer2_tpu.pipeline.engine import _maybe_enable_compile_cache

    _maybe_enable_compile_cache()  # repeated invocations skip the jit compiles

    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.ops.lookup import bucket_lookup_words
    from strainer2_tpu.ops.packing import canonical_codes_np, canonical_windows

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=args.kmers + K - 1, dtype=np.uint8)
    try:
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
    t = build_bucket_table(codes, K, row_width=32 + 16 * n_words)
    words_np = [
        rng.integers(0, 1 << 32, size=t.num_slots, dtype=np.uint64).astype(np.uint32)
        for _ in range(n_words)
    ]
    rows_dev = jnp.asarray(t.with_meta_words(words_np))
    h_bits, salt = t.h_bits, t.salt
    print(f"# {codes.size} keys, S={S}, {n_words} meta words, "
          f"{t.table.shape[1]}-lane rows on {jax.devices()[0].platform}",
          flush=True)

    bases = rng.integers(0, 4, size=(SLICES, ROWS, ROW_LEN), dtype=np.uint8)
    for s in range(SLICES):
        for r in range(0, ROWS, 2):
            start = int(rng.integers(0, genome.size - ROW_LEN))
            bases[s, r] = genome[start : start + ROW_LEN]
    bases_dev = jnp.asarray(bases)
    width = ROW_LEN - K + 1
    lookups_per_step = ROWS * width
    boundaries_dev = jnp.arange(ROWS + 1, dtype=jnp.int32) * width

    def probe(rows, bi):
        # rows rides in as a jit ARGUMENT: a closure would embed the
        # ~1 GB table as an XLA constant and the compile takes minutes
        # (the CLAUDE.md "never put big arrays in jit closures" rule)
        win = canonical_windows(bi, K)
        found, _, words = bucket_lookup_words(
            rows, h_bits, salt, win.hi, win.lo, n_words
        )
        hit = (found & win.valid).reshape(-1)
        return hit, [w.reshape(-1) for w in words]

    def body_gather(rows, bi):
        hit, words = probe(rows, bi)
        acc = jnp.where(hit, words[0], 0)
        for w in words[1:]:
            acc = acc ^ w
        return jnp.sum(acc, dtype=jnp.uint32)

    def _expand(masked, n_j, dtype):
        shifts = jnp.arange(n_j, dtype=jnp.uint32) * 2
        p = ((masked[:, None] >> shifts[None, :]) & 1).astype(dtype)
        i = ((masked[:, None] >> (shifts[None, :] + 1)) & 1).astype(dtype)
        return p, i

    def body_expand_only(rows, bi):
        hit, words = probe(rows, bi)
        tot = jnp.uint32(0)
        for j, w in enumerate(words):
            n_j = min(16, S - 16 * j)
            if n_j <= 0:
                break
            p, i = _expand(jnp.where(hit, w, 0), n_j, jnp.int32)
            tot += jnp.sum(p, dtype=jnp.int32).astype(jnp.uint32)
            tot += jnp.sum(i, dtype=jnp.int32).astype(jnp.uint32)
        return tot

    def _full(rows, bi, dtype):
        hit, words = probe(rows, bi)
        ps, infs = [], []
        for j, w in enumerate(words):
            n_j = min(16, S - 16 * j)
            if n_j <= 0:
                break
            p, i = _expand(jnp.where(hit, w, 0), n_j, dtype)
            ps.append(p)
            infs.append(i)
        present = jnp.concatenate(ps, axis=1)
        informative = jnp.concatenate(infs, axis=1)
        zero = jnp.zeros((1, present.shape[1]), dtype=jnp.int32)
        cum_tot = jnp.concatenate([zero, jnp.cumsum(present, axis=0, dtype=jnp.int32)])
        cum_inf = jnp.concatenate(
            [zero, jnp.cumsum(informative, axis=0, dtype=jnp.int32)]
        )
        b0, b1 = boundaries_dev[:-1], boundaries_dev[1:]
        tot = cum_tot[b1] - cum_tot[b0]
        inf = cum_inf[b1] - cum_inf[b0]
        return (jnp.sum(tot) + jnp.sum(inf)).astype(jnp.uint32)

    def body_full_i32(rows, bi):
        return _full(rows, bi, jnp.int32)

    def body_full_i8(rows, bi):
        return _full(rows, bi, jnp.int8)

    def body_full_fused(rows, bi):
        # one interleaved (Q, 2S) plane: lane 2s = present_s, 2s+1 = informative_s
        hit, words = probe(rows, bi)
        planes = []
        for j, w in enumerate(words):
            n_j = min(16, S - 16 * j)
            if n_j <= 0:
                break
            masked = jnp.where(hit, w, 0)
            shifts = jnp.arange(2 * n_j, dtype=jnp.uint32)
            planes.append(((masked[:, None] >> shifts[None, :]) & 1).astype(jnp.int8))
        bits = jnp.concatenate(planes, axis=1)  # (Q, 2S)
        zero = jnp.zeros((1, bits.shape[1]), dtype=jnp.int32)
        cum = jnp.concatenate([zero, jnp.cumsum(bits, axis=0, dtype=jnp.int32)])
        b0, b1 = boundaries_dev[:-1], boundaries_dev[1:]
        seg = cum[b1] - cum[b0]  # (R, 2S)
        return (jnp.sum(seg[:, 0::2]) + jnp.sum(seg[:, 1::2])).astype(jnp.uint32)

    def body_full_chunked(rows, bi):
        from strainer2_tpu.ops.segsum import boundary_strain_sums

        hit, words = probe(rows, bi)
        masked = []
        for j, w in enumerate(words):
            if min(16, S - 16 * j) <= 0:
                break
            masked.append(jnp.where(hit, w, 0))
        tot, inf = boundary_strain_sums(masked, boundaries_dev, S)
        return (jnp.sum(tot) + jnp.sum(inf)).astype(jnp.uint32)

    def make_chain(body, n):
        @jax.jit
        def chain(rows, b):
            def step(i, carry):
                bi = jax.lax.dynamic_index_in_dim(b, i % SLICES, keepdims=False)
                return carry + body(rows, bi)

            return jax.lax.fori_loop(0, n, step, jnp.uint32(0))

        return chain

    def measure(body, name):
        def run(n):
            f = make_chain(body, n)
            total = int(np.asarray(f(rows_dev, bases_dev)))
            t0 = time.time()
            total = int(np.asarray(f(rows_dev, bases_dev)))
            return time.time() - t0, total

        d_short, s_short = run(N_SHORT)
        d_long, s_long = run(n_long)
        # modulo 2^32: the uint32 accumulator legitimately wraps at wide S
        linear = (
            (s_short * n_long - s_long * N_SHORT) % (1 << 32) == 0
            and s_long != 0
        )
        per_step = max((d_long - d_short) / (n_long - N_SHORT), 1e-9)
        rate = lookups_per_step / per_step
        print(
            f"{name}: {per_step*1e3:.2f} ms/step -> {rate/1e6:.1f} M windows/s"
            f" ({rate*S/1e9:.3f} G effective)"
            + ("" if linear else f"  WARNING non-linear ({s_short}/{s_long})"),
            flush=True,
        )
        return s_long, rate

    bodies = {
        "gather": body_gather,
        "expand_only": body_expand_only,
        "full_i32": body_full_i32,
        "full_i8": body_full_i8,
        "full_fused": body_full_fused,
        "full_chunked": body_full_chunked,
    }
    sums = {}
    for name, body in bodies.items():
        if name in chosen:
            sums[name], _ = measure(body, f"{name:<11}")
    full_sums = {k: v for k, v in sums.items() if k.startswith("full_")}
    if len(full_sums) > 1:
        assert len(set(full_sums.values())) == 1, full_sums
        print("# full-variant result sums identical", flush=True)


if __name__ == "__main__":
    main()
