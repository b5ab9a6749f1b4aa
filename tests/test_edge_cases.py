"""Edge-case behavior: empty inputs, sub-k reads, CRLF, lowercase."""

import gzip
import io
import os

import numpy as np
import pytest

MINI = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "mini")


@pytest.fixture(autouse=True)
def _chdir(monkeypatch):
    monkeypatch.chdir(MINI)


def test_detect_empty_target_file(tmp_path):
    """An empty metagenome still gets its four summary lines with zeros
    (matches the reference's behavior of printing totals regardless)."""
    from strainer2_tpu.pipeline.detect import run_detect

    empty = tmp_path / "empty.fasta"
    empty.write_text("")
    batch = tmp_path / "targets.txt"
    batch.write_text(f"SE\t{empty}\n")
    hits = str(tmp_path / "h.gz")
    run_detect(
        "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits,
        batch_list=str(batch), stdout=io.StringIO(),
    )
    with gzip.open(hits, "rt") as f:
        lines = f.read().splitlines()
    assert len(lines) == 4
    assert lines[0].endswith("total_kmer_evaluated\t0")
    assert lines[1].endswith("total_reads_evaluated\t0")


def test_detect_all_subk_reads(tmp_path):
    from strainer2_tpu.pipeline.detect import run_detect

    f = tmp_path / "short.fasta"
    f.write_text(">a\nACGT\n>b\nACGTACGT\n")
    batch = tmp_path / "targets.txt"
    batch.write_text(f"SE\t{f}\n")
    hits = str(tmp_path / "h.gz")
    run_detect(
        "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits,
        batch_list=str(batch), stdout=io.StringIO(),
    )
    with gzip.open(hits, "rt") as f2:
        lines = f2.read().splitlines()
    assert lines[0].endswith("total_kmer_evaluated\t0")
    assert lines[1].endswith("total_reads_evaluated\t0")


def test_reader_crlf_and_lowercase(tmp_path):
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine
    from tests.oracle import canonical_codes_of_seq

    seq = "acgtacgtacgtacgtacgtacgtacgtacgtacgtacgta"
    f = tmp_path / "crlf.fa"
    f.write_bytes(b">c1\r\n" + seq[:20].encode() + b"\r\n" + seq[20:].encode() + b"\r\n")
    codes = scan_file_codes(str(f), KmerEngine(31))
    expect = [c for v, c in canonical_codes_of_seq(seq.upper(), 31) if v]
    assert codes.tolist() == expect


def test_scrub_genome_with_subk_contig(tmp_path):
    """Sub-k genome contigs are guarded (the reference segfaults on these,
    SURVEY.md §2.2)."""
    from strainer2_tpu.index.build import StrainIndex
    from strainer2_tpu.pipeline.engine import KmerEngine

    f = tmp_path / "g.fa"
    f.write_text(">c1\n" + "ACGTACGTAC" * 8 + "\n>tiny\nACGT\n")
    idx = StrainIndex.from_fasta(str(f), KmerEngine(31))
    assert idx.num_kmers > 0


def test_empty_panel_file_counts_nothing(tmp_path):
    import jax.numpy as jnp

    from strainer2_tpu.index.build import StrainIndex
    from strainer2_tpu.pipeline.engine import KmerEngine
    from strainer2_tpu.pipeline.scrub_count import count_panel_file

    engine = KmerEngine(31)
    index = StrainIndex.from_fasta("data/strainA.fna.gz", engine)
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    counts = jnp.zeros(index.table.num_slots, dtype=jnp.uint32)
    counts = count_panel_file(engine, index, counts, str(empty), 8, 512)
    assert int(np.asarray(counts).sum()) == 0


def test_scrub_unreadable_errors_match_reference(tmp_path, capsys):
    """Unreadable -r / list / panel files exit 1 with the reference's exact
    stderr lines (reference src/genome_compare.c:986,125,196)."""
    import pytest

    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    genome = str(tmp_path / "g.fa")
    with open(genome, "w") as f:
        f.write(">g\n" + "ACGT" * 50 + "\n")
    good_list = str(tmp_path / "good.txt")
    with open(good_list, "w") as f:
        f.write(genome + "\n")
    bad_list = str(tmp_path / "bad.txt")
    with open(bad_list, "w") as f:
        f.write("/nonexistent_panel.fa.gz\n")

    import io

    with pytest.raises(SystemExit) as e:
        run_scrub_count("/nonexistent.fna.gz", good_list, good_list, out=io.StringIO())
    assert e.value.code == 1
    assert capsys.readouterr().err.endswith(
        "could not read file /nonexistent.fna.gz GEN_hash_sequences_set_count_vec()\n"
    )

    with pytest.raises(SystemExit) as e:
        run_scrub_count(genome, "/nonexistent_list.txt", good_list, out=io.StringIO())
    assert e.value.code == 1
    assert capsys.readouterr().err.endswith(
        "could not read file /nonexistent_list.txt in GEN_all_kmer_counts()\n"
    )

    for threads in ("1", "4"):
        import os

        os.environ["STRAINER2_COUNT_THREADS"] = threads
        try:
            # two panel entries so threads=4 engages the parallel pool
            with open(bad_list, "w") as f:
                f.write("/nonexistent_panel.fa.gz\n" + genome + "\n")
            with pytest.raises(SystemExit) as e:
                run_scrub_count(genome, bad_list, good_list, out=io.StringIO())
            assert e.value.code == 1
            assert capsys.readouterr().err.endswith(
                "could not read file /nonexistent_panel.fa.gz "
                "in GEN_calculate_kmer_count()\n"
            ), threads
        finally:
            del os.environ["STRAINER2_COUNT_THREADS"]


def test_genome_compare_unreadable_errors_match_reference(tmp_path, capsys):
    """Unreadable query / list files exit 1 with the reference's exact
    stderr lines (src/genome_compare.c:289,251).  An unreadable -a HANGS
    the reference (no error check in GEN_read_seq_file) — we error cleanly."""
    import io

    import pytest

    from strainer2_tpu.pipeline.compare import run_genome_compare

    genome = str(tmp_path / "a.fa")
    with open(genome, "w") as f:
        f.write(">a\n" + "ACGTTGCA" * 40 + "\n")

    with pytest.raises(SystemExit) as e:
        run_genome_compare(genome, b_file="/nonexistent_q.fa", out=io.StringIO())
    assert e.value.code == 1
    assert capsys.readouterr().err.endswith(
        "could not read file /nonexistent_q.fa in GEN_calculate_coverage()\n"
    )

    with pytest.raises(SystemExit) as e:
        run_genome_compare(genome, b_list="/nonexistent_list.txt", out=io.StringIO())
    assert e.value.code == 1
    assert capsys.readouterr().err.endswith(
        "could not read file /nonexistent_list.txt in GEN_all_coverage()\n"
    )

    # list with an unreadable entry (parallel scoring path)
    blist = str(tmp_path / "qs.txt")
    with open(blist, "w") as f:
        f.write(genome + "\n/nonexistent_q.fa\n")
    with pytest.raises(SystemExit) as e:
        run_genome_compare(genome, b_list=blist, out=io.StringIO())
    assert e.value.code == 1
    assert capsys.readouterr().err.endswith(
        "could not read file /nonexistent_q.fa in GEN_calculate_coverage()\n"
    )


# ---- corrupt / hostile inputs (round 5) -------------------------------------
# Reference behavior established empirically against the built reference
# binaries (docs/PARITY.md "Round 5": truncated gzip and garbage bytes are
# tolerated silently — kseq just stops / skips to the next record marker,
# /root/reference/src/kseq.h:171-211; IUPAC letters are ordinary non-N
# characters that count in the evaluated totals and simply miss the index).
# These tests pin OUR two reader/engine paths to that behavior and to each
# other.


def _python_reader_codes(monkeypatch, path, k=31):
    """scan_file_codes with the native fast path disabled — the pure
    Python/NumPy reader."""
    from strainer2_tpu import native
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine

    monkeypatch.setattr(native, "scan_file_codes_native", lambda *a, **kw: None)
    try:
        return scan_file_codes(path, KmerEngine(k))
    finally:
        monkeypatch.undo()


def test_truncated_gzip_mid_record_both_readers(tmp_path, monkeypatch):
    """A gzip stream cut mid-record parses to the decodable prefix and
    stops silently (reference kseq behavior, verified empirically at toy
    scale: byte-identical scrub tables, exit 0).  Native and Python
    readers must agree with each other."""
    import gzip as _gzip

    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine

    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [
        alpha[rng.integers(0, 4, size=100)].tobytes().decode() for _ in range(50)
    ]
    text = "".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)).encode()
    blob = _gzip.compress(text)
    trunc = tmp_path / "trunc.fa.gz"
    trunc.write_bytes(blob[: len(blob) // 2])

    native_codes = scan_file_codes(str(trunc), KmerEngine(31))
    assert 0 < native_codes.size < 50 * 70, "expected a proper prefix"
    python_codes = _python_reader_codes(monkeypatch, str(trunc))
    np.testing.assert_array_equal(native_codes, python_codes)


def test_garbage_between_fastq_records_both_readers(tmp_path, monkeypatch):
    """Binary garbage between records is skipped to the next '@'/'>'
    marker (kseq record-start scan); both reads around it parse.  Pinned
    byte-identical to the reference binary at probe time (exit 0,
    total_reads_evaluated 2)."""
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine
    from tests.oracle import canonical_codes_of_seq

    f = tmp_path / "garbage.fastq"
    r1 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    r2 = "TTGCACGTACGTACGTACGTACGTACGTACGTACGTACGA"
    f.write_bytes(
        (f"@r1\n{r1}\n+\n" + "I" * len(r1) + "\n").encode()
        + b"\x00\xff\x13garbage~~~\n"
        + (f"@r2\n{r2}\n+\n" + "I" * len(r2) + "\n").encode()
    )
    want = np.array(
        [c for v, c in canonical_codes_of_seq(r1, 31) if v]
        + [c for v, c in canonical_codes_of_seq(r2, 31) if v],
        dtype=np.uint64,
    )
    got_native = scan_file_codes(str(f), KmerEngine(31))
    np.testing.assert_array_equal(got_native, want)
    got_python = _python_reader_codes(monkeypatch, str(f))
    np.testing.assert_array_equal(got_python, want)


def test_iupac_letters_in_detect_targets(tmp_path, monkeypatch):
    """IUPAC letters (R/Y/S/W/K/M/B/D/H/V) in target reads are ordinary
    non-N characters to the reference: their windows COUNT in
    total_kmer_evaluated and simply never match the index.  Verified
    byte-identical against the reference binary at probe time; here both
    engine paths must agree and reproduce the exact totals."""
    from strainer2_tpu.pipeline.detect import run_detect

    f = tmp_path / "iupac.fasta"
    # r1: 46 chars -> 16 windows (IUPAC + lowercase); r2: 40 chars with
    # N-flanks -> 10 windows.  Totals count windows regardless of N/IUPAC.
    f.write_text(
        ">r1\nACGTRYSWKMBDHVacgtACGTACGTACGTACGTACGTACGTACGT\n"
        ">r2\nNNNNACGTACGTACGTACGTACGTACGTACGTACGTNNNN\n"
    )
    batch = tmp_path / "targets.txt"
    batch.write_text(f"SE\t{f}\n")

    payloads = []
    for native in ("1", "0"):
        monkeypatch.setenv("STRAINER2_NATIVE_COUNT", native)
        hits = str(tmp_path / f"h_{native}.gz")
        run_detect(
            "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits,
            batch_list=str(batch), stdout=io.StringIO(),
        )
        with gzip.open(hits, "rt") as fh:
            payloads.append(fh.read())
    assert payloads[0] == payloads[1]
    lines = payloads[0].splitlines()
    assert lines[0].endswith("total_kmer_evaluated\t26")
    assert lines[1].endswith("total_reads_evaluated\t2")


def test_multimember_gzip_genome_both_readers(tmp_path, monkeypatch):
    """A genome split across two gzip members (cat of .gz parts) reads
    identically to the single-member file on both reader paths (zlib and
    Python gzip both decode concatenated members transparently; verified
    byte-identical through the reference binary at probe time)."""
    import gzip as _gzip

    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine

    with _gzip.open("data/strainA.fna.gz", "rb") as fh:
        text = fh.read()
    half = len(text) // 2
    mm = tmp_path / "mm.fna.gz"
    mm.write_bytes(_gzip.compress(text[:half]) + _gzip.compress(text[half:]))

    want = scan_file_codes("data/strainA.fna.gz", KmerEngine(31))
    got_native = scan_file_codes(str(mm), KmerEngine(31))
    np.testing.assert_array_equal(got_native, want)
    got_python = _python_reader_codes(monkeypatch, str(mm))
    np.testing.assert_array_equal(got_python, want)


def test_truncated_fastq_quality_drops_record_and_stops(tmp_path, monkeypatch):
    """kseq returns -2 on a truncated or length-mismatched quality string,
    which ends every reference caller's `while (kseq_read >= 0)` loop: the
    partial record AND everything after it are dropped.  A FASTQ truncated
    BEFORE its '+' line is instead yielded as-is (kseq returns the partial
    sequence).  Both pinned byte-identical against the reference binary at
    probe time (docs/PARITY.md round 5); both readers must agree."""
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine
    from tests.oracle import canonical_codes_of_seq

    r1 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    r2 = "TTTTACGTACGTACGTACGTACGTACGTACGTTTTT"
    good = f"@r1\n{r1}\n+\n" + "I" * len(r1) + "\n"
    want_r1 = np.array(
        [c for v, c in canonical_codes_of_seq(r1, 31) if v], dtype=np.uint64
    )
    want_both = np.array(
        [c for v, c in canonical_codes_of_seq(r1, 31) if v]
        + [c for v, c in canonical_codes_of_seq(r2, 31) if v],
        dtype=np.uint64,
    )

    midqual = tmp_path / "midqual.fastq"
    midqual.write_text(good + f"@r2\n{r2}\n+\nIIIII")  # quality cut short
    midseq = tmp_path / "midseq.fastq"
    midseq.write_text(good + f"@r2\n{r2}")  # no '+' reached

    for path, want in ((midqual, want_r1), (midseq, want_both)):
        got_native = scan_file_codes(str(path), KmerEngine(31))
        np.testing.assert_array_equal(got_native, want, err_msg=str(path))
        got_python = _python_reader_codes(monkeypatch, str(path))
        np.testing.assert_array_equal(got_python, want, err_msg=str(path))


def test_leading_garbage_skipped_to_first_marker(tmp_path, monkeypatch):
    """kseq's record-start scan skips BYTES until the first '>'/'@' — a
    file with leading junk still parses its records; a file with no marker
    at all yields zero records, silently."""
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine
    from tests.oracle import canonical_codes_of_seq

    r1 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    lead = tmp_path / "lead.fa"
    lead.write_bytes(b"\x00junk junk\n~~\n" + f">r1\n{r1}\n".encode())
    want = np.array(
        [c for v, c in canonical_codes_of_seq(r1, 31) if v], dtype=np.uint64
    )
    np.testing.assert_array_equal(scan_file_codes(str(lead), KmerEngine(31)), want)
    np.testing.assert_array_equal(_python_reader_codes(monkeypatch, str(lead)), want)

    nomarker = tmp_path / "nomarker.txt"
    nomarker.write_bytes(b"no markers here\nat all\n")
    assert scan_file_codes(str(nomarker), KmerEngine(31)).size == 0
    assert _python_reader_codes(monkeypatch, str(nomarker)).size == 0


def test_mixed_fasta_fastq_single_file(tmp_path, monkeypatch):
    """kseq parses format PER RECORD, so FASTA and FASTQ records can mix
    in one file (probed byte-identical through the reference binary:
    3 reads, all windows evaluated).  Both readers must agree."""
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine
    from tests.oracle import canonical_codes_of_seq

    r1 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    r2 = "TTGCACGTACGTACGTACGTACGTACGTACGTACGA"
    r3 = "GGGTACGTACGTACGTACGTACGTACGTACGTACCC"
    f = tmp_path / "mixed.fa"
    f.write_text(
        f">r1\n{r1}\n@r2\n{r2}\n+\n" + "I" * len(r2) + f"\n>r3\n{r3}\n"
    )
    want = np.array(
        sum(([c for v, c in canonical_codes_of_seq(r, 31) if v]
             for r in (r1, r2, r3)), []),
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(scan_file_codes(str(f), KmerEngine(31)), want)
    np.testing.assert_array_equal(_python_reader_codes(monkeypatch, str(f)), want)
