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
