"""Native C++ host library vs pure-Python twins (bit-exact agreement)."""

import gzip

import numpy as np
import pytest

from strainer2_tpu import native
from strainer2_tpu.index.cuckoo import _try_build
from strainer2_tpu.index.hashing import cuckoo_slots
from strainer2_tpu.ops.packing import split_code64_np
from tests.oracle import random_dna, seq_to_base_codes

K = 31

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_reference_row_order_native_matches_python_with_expansion():
    from strainer2_tpu.index import refhash_order

    rng = np.random.default_rng(0)
    codes = np.unique(rng.integers(0, 1 << 62, size=4000, dtype=np.uint64))
    # small initial capacity forces several expand/rehash rounds
    for cap in (64, 1000, 8_000_000):
        nat = native.reference_row_order_native(codes, K, cap)
        # force the Python path by calling internals
        n = codes.shape[0]
        hashes = refhash_order.djb2_codes(codes, K).tolist()
        m = refhash_order.reference_initial_capacity(cap)
        table = [-1] * m
        count = 0

        def insert(key_idx, tbl, c):
            slot = hashes[key_idx] % c
            while tbl[slot] != -1:
                slot = (slot + 1) % c
            tbl[slot] = key_idx

        for i in range(n):
            insert(i, table, m)
            if count >= m // 2:
                new_m = m * 2
                nt = [-1] * new_m
                for k_idx in table:
                    if k_idx != -1:
                        insert(k_idx, nt, new_m)
                table, m = nt, new_m
            count += 1
        py = np.fromiter((i for i in table if i != -1), dtype=np.int64, count=n)
        np.testing.assert_array_equal(nat, py, err_msg=f"cap={cap}")


def test_native_cuckoo_matches_layout_contract():
    rng = np.random.default_rng(1)
    codes = np.unique(rng.integers(0, 1 << 62, size=20000, dtype=np.uint64))
    h_bits = 16
    out = native.build_cuckoo_native(codes, K, h_bits, 0)
    assert out not in (None, "retry")
    table, slot_of_key = out
    hi, lo = split_code64_np(codes, K)
    np.testing.assert_array_equal(table[slot_of_key, 0], hi)
    np.testing.assert_array_equal(table[slot_of_key, 1], lo)
    # every key is at one of its two hash slots
    s0 = cuckoo_slots(hi, lo, h_bits, 0).astype(np.int64)
    s1 = cuckoo_slots(hi, lo, h_bits, 1).astype(np.int64) + (1 << h_bits)
    assert bool(np.all((slot_of_key == s0) | (slot_of_key == s1)))


def test_native_pack_stream_matches_python(tmp_path):
    from strainer2_tpu.io import pack_stream
    from strainer2_tpu.ops.packing import canonical_codes_np

    rng = np.random.default_rng(2)
    seqs = [random_dna(rng, int(rng.integers(20, 300)), n_prob=0.02) for _ in range(80)]
    fa = tmp_path / "reads.fasta.gz"
    with gzip.open(fa, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")

    def codes_of(batches):
        out = []
        for b in batches:
            for row in b.bases:
                cc, vv = canonical_codes_np(row, K)
                out.extend(cc[vv].tolist())
        return out

    py_batches = list(
        pack_stream((s.encode() for s in seqs), K, rows=4, row_len=512)
    )
    nat_batches = list(
        native.NativePackStream([str(fa)], K, rows=4, row_len=512)
    )
    assert sorted(codes_of(py_batches)) == sorted(codes_of(nat_batches))
    # read-id mode: per-batch lengths agree with the input reads
    nat_ids = list(
        native.NativePackStream(
            [str(fa)], K, rows=8, row_len=512, with_read_ids=True, max_reads=1000
        )
    )
    all_lengths = [ln for b in nat_ids for ln in b.read_lengths.tolist()]
    assert all_lengths == [len(s) for s in seqs]
    for b in nat_ids:
        for r in range(b.n_reads):
            n_pos = int((b.read_id == r).sum())
            ln = int(b.read_lengths[r])
            if ln >= K:
                assert n_pos in (ln, ln + K - 1)
            else:
                assert n_pos == 0


def test_native_pe_interleave_stream(tmp_path):
    rng = np.random.default_rng(3)
    a = [random_dna(rng, 60) for _ in range(10)]
    b = [random_dna(rng, 70) for _ in range(10)]
    fa1, fa2 = tmp_path / "p1.fa", tmp_path / "p2.fa"
    for path, seqs in ((fa1, a), (fa2, b)):
        with open(path, "w") as f:
            for i, s in enumerate(seqs):
                f.write(f">x{i}\n{s}\n")
    batches = list(
        native.NativePackStream(
            [str(fa1), str(fa2)], K, rows=4, row_len=512, mode=1,
            with_read_ids=True, max_reads=100, group_size=2,
        )
    )
    lengths = [ln for bt in batches for ln in bt.read_lengths.tolist()]
    expect = []
    for x, y in zip(a, b):
        expect.extend([len(x), len(y)])
    assert lengths == expect


def test_native_format_scrub_rows():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 1 << 62, size=100, dtype=np.uint64)
    c0 = rng.integers(0, 1000, size=100).astype(np.uint32)
    c1 = rng.integers(0, 1000, size=100).astype(np.uint32)
    c2 = rng.integers(0, 1000, size=100).astype(np.uint32)
    c3 = rng.integers(0, 1000, size=100).astype(np.uint32)
    from strainer2_tpu.ops.packing import decode_codes_np

    kmers = decode_codes_np(codes, K)
    expect4 = "".join(
        f"{s}\t{a}\t{b}\t{c}\n" for s, a, b, c in zip(kmers, c0, c1, c2)
    ).encode()
    assert native.format_scrub_rows(codes, c0, c1, c2, None, K) == expect4
    expect5 = "".join(
        f"{s}\t{a}\t{b}\t{c}\t{d}\n" for s, a, b, c, d in zip(kmers, c0, c1, c2, c3)
    ).encode()
    assert native.format_scrub_rows(codes, c0, c1, c2, c3, K) == expect5


def test_native_scan_matches_numpy(tmp_path):
    from strainer2_tpu.native import scan_file_codes_native
    from strainer2_tpu.ops.packing import canonical_codes_np

    rng = np.random.default_rng(5)
    seqs = [random_dna(rng, int(rng.integers(10, 400)), n_prob=0.03) for _ in range(40)]
    fa = tmp_path / "g.fa.gz"
    with gzip.open(fa, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">c{i}\n{s}\n")
    nat = scan_file_codes_native(str(fa), K)
    expect = []
    for s in seqs:
        cc, vv = canonical_codes_np(seq_to_base_codes(s), K)
        expect.extend(cc[vv].tolist())
    np.testing.assert_array_equal(nat, np.asarray(expect, dtype=np.uint64))


def test_native_comparer_matches_python_oracle(tmp_path):
    """Arbitrary-k compare engine (s2_compare_*): hits/misses identical to
    the pure-Python string-set oracle on IUPAC-rich sequences, for full
    scans and for rapid-mode early exits at every decision outcome."""
    import numpy as np
    import pytest

    from strainer2_tpu.native import NativeComparer, available
    from strainer2_tpu.pipeline.compare import _HostSetComparer

    if not available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGTACGTACGTACGTNRYK", dtype=np.uint8)  # mostly ACGT

    def rand_fasta(path, n_recs, lo, hi):
        with open(path, "wb") as f:
            for i in range(n_recs):
                ln = int(rng.integers(lo, hi))
                seq = bytes(alphabet[rng.integers(0, alphabet.size, size=ln)])
                f.write(b">r%d\n" % i)
                # mixed-case + multi-line to exercise the raw reader
                f.write(seq[: ln // 2].lower() + b"\n" + seq[ln // 2 :] + b"\n")

    a = str(tmp_path / "a.fa")
    b = str(tmp_path / "b.fa")
    rand_fasta(a, 8, 30, 400)
    rand_fasta(b, 20, 30, 400)

    for k in (33, 40, 64, 101):
        nat = NativeComparer(a, k)
        py = _HostSetComparer(a, k)
        assert nat.num_kmers == len(py.kmers)
        for max_seeds, thr in [(0, 0.1), (50, 0.001), (50, 0.999), (123, 0.05)]:
            assert nat.score(b, max_seeds, thr) == py.score(b, max_seeds, thr), (
                k, max_seeds, thr,
            )
        # self-compare: all hits
        assert nat.score(a, 0, 0.1) == py.score(a, 0, 0.1)
