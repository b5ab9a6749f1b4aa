"""Byte-exact parity against committed reference goldens (mini fixtures).

The fixtures in tests/golden/mini were produced by tools/make_mini_fixtures.py
running the *reference* binaries/scripts; these tests assert our pipeline
reproduces every output byte-for-byte (tables, informative sets, hit rows,
stdout diagnostics, metrics).
"""

import gzip
import io
import os

import pytest

MINI = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "mini")


def expected(name: str) -> bytes:
    with open(os.path.join(MINI, "expected", name), "rb") as f:
        return f.read()


@pytest.fixture(autouse=True)
def _chdir(monkeypatch):
    monkeypatch.chdir(MINI)


class _Out(io.StringIO):
    def bytes(self) -> bytes:
        return self.getvalue().encode()


def test_scrub_count_parity():
    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    out = _Out()
    run_scrub_count("data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt", out=out)
    assert out.bytes() == expected("scrub_counts.tsv")


def test_scrub_count_drug_panel_parity(capsys):
    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    out = _Out()
    run_scrub_count(
        "data/strainA.fna.gz",
        "data/genomes.txt",
        "data/metagenomes.txt",
        c_list="data/drugs.txt",
        out=out,
    )
    assert out.bytes() == expected("scrub_counts_drug.tsv")
    # the reference genome inside the drug list is skipped with a message
    assert "skipping data/strainA.fna.gz (identical match)" in capsys.readouterr().err


@pytest.mark.parametrize(
    "src,kwargs,golden",
    [
        ("scrub_counts.gz", dict(min_fraction=0.05), "scrubbed_m05.txt"),
        ("scrub_counts.gz", dict(min_fraction=0.3), "scrubbed_m30.txt"),
        ("scrub_counts_drug.gz", dict(min_fraction=0.05), "scrubbed_drug_m05.txt"),
        ("scrub_counts.gz", dict(min_fraction=0.05, independent=True), "scrubbed_indep_m05.txt"),
    ],
)
def test_filter_parity(src, kwargs, golden):
    from strainer2_tpu.pipeline.filter import parse_scrub_tables, run_filter

    table = parse_scrub_tables([os.path.join("expected", src)])
    out = _Out()
    run_filter(table, out=out, err=io.StringIO(), **kwargs)
    assert out.bytes() == expected(golden)


def _detect(tmp_path, golden_hits, golden_stdout, **kwargs):
    from strainer2_tpu.pipeline.detect import run_detect

    hits = str(tmp_path / "hits.gz")
    out = _Out()
    run_detect(
        "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits, stdout=out, **kwargs
    )
    with gzip.open(hits, "rb") as f:
        payload = f.read()
    assert payload == expected(golden_hits)
    assert out.bytes() == expected(golden_stdout)


def test_detect_batch_parity(tmp_path):
    _detect(tmp_path, "kmer_hits.txt", "detect_stdout.txt", batch_list="data/targets.txt")


def test_detect_background_filter_parity(tmp_path):
    _detect(
        tmp_path,
        "kmer_hits_bg.txt",
        "detect_bg_stdout.txt",
        batch_list="data/targets.txt",
        background_list="data/background.txt",
    )


def test_detect_single_pe_parity(tmp_path):
    from strainer2_tpu.constants import IS_PAIRED_END

    _detect(
        tmp_path,
        "kmer_hits_single.txt",
        "detect_single_stdout.txt",
        b_file="data/target_PE1.fasta.gz",
        b_file2="data/target_PE2.fasta.gz",
        file_type=IS_PAIRED_END,
    )


@pytest.mark.parametrize("native_cov", ["1", "0"])
@pytest.mark.parametrize(
    "kwargs,golden",
    [
        (dict(), "coverage_depth.tsv"),
        (dict(min_kmer_hits=5), "coverage_depth_m5.tsv"),
        (dict(background_metagenomes_file="data/background.txt"), "coverage_depth_bg.tsv"),
    ],
)
def test_coverage_depth_parity(tmp_path, kwargs, golden, native_cov, monkeypatch):
    """Both hits-file parse routes (native columnar / per-line Python)
    must hit the golden byte-for-byte."""
    from strainer2_tpu.pipeline.coverage import run_coverage_depth

    monkeypatch.setenv("STRAINER2_NATIVE_COVERAGE", native_cov)
    hits_gz = str(tmp_path / "strainA_x.kmer_hits.gz")
    with gzip.open(hits_gz, "wb") as f:
        f.write(expected("kmer_hits.txt"))
    out = _Out()
    run_coverage_depth(hits_gz, out=out, **kwargs)
    assert out.bytes() == expected(golden)


def test_detect_no_gzip_output_parity(tmp_path):
    """--no-gzip (the reference's NO_GZIP_OUTPUT toggle,
    src/strain_detect.c:23,292-304) writes the identical rows as plain
    TSV."""
    from strainer2_tpu.pipeline.detect import run_detect

    hits = str(tmp_path / "hits.tsv")
    out = _Out()
    run_detect(
        "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits, stdout=out,
        batch_list="data/targets.txt", gzip_output=False,
    )
    with open(hits, "rb") as f:
        payload = f.read()
    assert payload[:2] != b"\x1f\x8b", "output must not be gzip"
    assert payload == expected("kmer_hits.txt")
    assert out.bytes() == expected("detect_stdout.txt")


def test_detect_python_fallback_path_parity(tmp_path, monkeypatch):
    """Detection parity with the native library disabled (pure-Python
    reader/packer path)."""
    import strainer2_tpu.native as native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    _detect(tmp_path, "kmer_hits.txt", "detect_stdout.txt", batch_list="data/targets.txt")


def test_scrub_count_sharded_mesh_parity():
    """Sharded panel counting over the virtual 8-device mesh produces the
    byte-identical table."""
    from strainer2_tpu.pipeline.scrub_count import ScrubCountConfig, run_scrub_count

    out = _Out()
    cfg = ScrubCountConfig(mesh=(4, 2))
    run_scrub_count(
        "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
        out=out, cfg=cfg,
    )
    assert out.bytes() == expected("scrub_counts.tsv")


@pytest.mark.parametrize(
    "kwargs,golden",
    [
        (dict(k=40), "gc_s40.txt"),
        (dict(k=40, max_seeds=200, threshold_for_fullmap=0.3), "gc_s40_rapid.txt"),
    ],
)
def test_genome_compare_large_k_parity(kwargs, golden):
    """k > 32 uses the exact string-set host engine (arbitrary seed support,
    like the reference's string hash)."""
    from strainer2_tpu.pipeline.compare import CompareConfig, run_genome_compare

    out = _Out()
    run_genome_compare(
        "data/strainA.fna.gz", b_list="data/compare_list.txt",
        cfg=CompareConfig(**kwargs), out=out,
    )
    assert out.bytes() == expected(golden)


def test_filter_multi_file_list_parity(tmp_path):
    """-l list mode: panel counts accumulate across files (reference
    kmer_scrub_filter.py:152-201)."""
    import shutil

    from strainer2_tpu.pipeline.filter import parse_scrub_tables, run_filter

    p1 = str(tmp_path / "sc1.gz")
    p2 = str(tmp_path / "sc2.gz")
    shutil.copy("expected/scrub_counts.gz", p1)
    shutil.copy("expected/scrub_counts.gz", p2)
    table = parse_scrub_tables([p1, p2])
    out = _Out()
    run_filter(table, min_fraction=0.05, out=out, err=io.StringIO())
    assert out.bytes() == expected("scrubbed_list_m05.txt")


def test_filter_drug_scrub_abort():
    """Too-similar drug strains abort after the stats lines (reference
    kmer_scrub_filter.py:217-218)."""
    import numpy as np

    from strainer2_tpu.pipeline.filter import ScrubTable, run_filter

    n = 100
    keys = [b"A" * 31 for _ in range(n)]
    table = ScrubTable(
        keys=keys,
        strain=np.ones(n, np.int64),
        pan=np.zeros(n, np.int64),
        meta=np.zeros(n, np.int64),
        drug_mask=np.ones(n, bool),  # everything drug-scrubbed
        has_drug=True,
    )
    out = _Out()
    with pytest.raises(RuntimeError, match="too few kmers remain"):
        run_filter(table, min_fraction=0.05, out=out, err=io.StringIO())
    assert "#drug_scrubbed kmers:100" in out.getvalue()


def test_detect_sharded_mesh_parity(tmp_path):
    """Sharded classification over the virtual device mesh produces the
    byte-identical hits file."""
    from strainer2_tpu.pipeline.detect import DetectConfig, run_detect

    hits = str(tmp_path / "hits.gz")
    out = _Out()
    cfg = DetectConfig(mesh=(4, 2))
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits,
               batch_list="data/targets.txt", cfg=cfg, stdout=out)
    with gzip.open(hits, "rb") as f:
        assert f.read() == expected("kmer_hits.txt")
    assert out.bytes() == expected("detect_stdout.txt")


def test_fused_pipeline_artifact_parity(tmp_path):
    """The fused one-process pipeline (shared index, in-memory filter)
    writes the SAME bytes as the staged CLIs for every artifact."""
    from strainer2_tpu.pipeline.coverage import run_coverage_depth
    from strainer2_tpu.pipeline.fused import FusedConfig, run_pipeline

    out_dir = str(tmp_path / "fused")
    paths = run_pipeline(
        "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
        "data/targets.txt", out_dir,
        fused_cfg=FusedConfig(min_fraction=0.05),
        err=io.StringIO(), stdout=_Out(),
    )
    with gzip.open(paths["counts"], "rb") as f:
        assert f.read() == expected("scrub_counts.tsv")
    with gzip.open(paths["scrubbed"], "rb") as f:
        assert f.read() == expected("scrubbed_m05.txt")
    with gzip.open(paths["hits"], "rb") as f:
        assert f.read() == expected("kmer_hits.txt")
    # coverage file equals a staged coverage_depth run on the same hits file
    out = _Out()
    run_coverage_depth(paths["hits"], out=out)
    with open(paths["coverage"], "rb") as f:
        assert f.read() == out.bytes()


def test_fused_pipeline_background_and_no_intermediates(tmp_path):
    from strainer2_tpu.pipeline.fused import FusedConfig, run_pipeline

    out_dir = str(tmp_path / "fused_bg")
    stdout = _Out()
    paths = run_pipeline(
        "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
        "data/targets.txt", out_dir, background_list="data/background.txt",
        fused_cfg=FusedConfig(min_fraction=0.05, write_counts=False,
                              write_scrubbed=False),
        err=io.StringIO(), stdout=stdout,
    )
    assert paths["counts"] is None and paths["scrubbed"] is None
    with gzip.open(paths["hits"], "rb") as f:
        assert f.read() == expected("kmer_hits_bg.txt")
    assert stdout.bytes() == expected("detect_bg_stdout.txt")


def test_detect_jit_engine_path_parity(tmp_path, monkeypatch):
    """The jit engine path (STRAINER2_NATIVE_COUNT=0; the TPU default)
    produces the same bytes as the native CPU fast path — the dual-path
    invariant (CLAUDE.md)."""
    monkeypatch.setenv("STRAINER2_NATIVE_COUNT", "0")
    _detect(tmp_path, "kmer_hits.txt", "detect_stdout.txt", batch_list="data/targets.txt")


def test_scrub_count_jit_engine_path_parity(monkeypatch):
    monkeypatch.setenv("STRAINER2_NATIVE_COUNT", "0")
    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    out = _Out()
    run_scrub_count("data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt", out=out)
    assert out.bytes() == expected("scrub_counts.tsv")


def test_scrub_count_parallel_threads_parity(monkeypatch):
    """Parallel per-file panel counting (per-thread buffers merged by
    integer addition) is byte-identical to the sequential scan."""
    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    monkeypatch.setenv("STRAINER2_COUNT_THREADS", "4")
    out = _Out()
    run_scrub_count(
        "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt", out=out
    )
    assert out.bytes() == expected("scrub_counts.tsv")


@pytest.mark.parametrize(
    "args,golden",
    [
        # mirrors tools/make_mini_fixtures.py gc invocations (k <= 32:
        # the native string engine on CPU, jit engine on device)
        (dict(b_file="data/panel1.fna.gz", print_header=True), "gc_single.txt"),
        (dict(b_list="data/compare_list.txt", cfg_kw=dict(k=17)), "gc_list_s17.txt"),
        (
            dict(b_list="data/compare_list.txt",
                 cfg_kw=dict(max_seeds=300, threshold_for_fullmap=0.5)),
            "gc_rapid.txt",
        ),
        (
            dict(b_list="data/compare_list.txt",
                 cfg_kw=dict(max_seeds=100_000, threshold_for_fullmap=0.05)),
            "gc_strainmode.txt",
        ),
    ],
)
@pytest.mark.parametrize("native", [True, False])
def test_genome_compare_small_k_parity(args, golden, native, monkeypatch):
    from strainer2_tpu.pipeline.compare import CompareConfig, run_genome_compare

    if not native:
        monkeypatch.setenv("STRAINER2_NATIVE_COMPARE", "0")
    args = dict(args)
    cfg = CompareConfig(**args.pop("cfg_kw", {}))
    out = _Out()
    run_genome_compare("data/strainA.fna.gz", cfg=cfg, out=out, **args)
    assert out.bytes() == expected(golden)


def test_detect_batch_parallel_threads_parity(tmp_path, monkeypatch):
    """Sample-parallel detection (ordered buffered writes) is byte-identical
    to the sequential loop on the batch-list golden."""
    monkeypatch.setenv("STRAINER2_DETECT_THREADS", "4")
    _detect(tmp_path, "kmer_hits.txt", "detect_stdout.txt", batch_list="data/targets.txt")


def test_detect_batch_parallel_error_matches_sequential(tmp_path, monkeypatch, capsys):
    """An unreadable sample mid-batch: parallel mode writes every EARLIER
    sample's output, prints exactly the sequential run's diagnostics, exits
    1, and discards later samples — stop-at-first-failure semantics."""
    import gzip as _gzip

    import pytest as _pytest

    from strainer2_tpu.pipeline.detect import run_detect

    batch = tmp_path / "targets_bad.txt"
    with open("data/targets.txt") as f:
        lines = [ln for ln in f if ln.strip() and not ln.startswith("#")]
    lines.insert(1, "SE\t%s\n" % (tmp_path / "missing.fa.gz"))
    batch.write_text("".join(lines))

    results = {}
    for tag, threads in [("seq", "1"), ("par", "4")]:
        monkeypatch.setenv("STRAINER2_DETECT_THREADS", threads)
        hits = str(tmp_path / f"hits_{tag}.gz")
        out = _Out()
        with _pytest.raises(SystemExit) as exc:
            run_detect(
                "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits,
                stdout=out, batch_list=str(batch),
            )
        code = exc.value.code if exc.value.code is not None else 0
        with _gzip.open(hits, "rb") as f:
            payload = f.read()
        results[tag] = (code, payload, capsys.readouterr().err)
    assert results["seq"][0] == results["par"][0] == 1
    assert results["seq"][1] == results["par"][1]
    assert results["seq"][1]  # first sample's output IS present
    assert "could not read file" in results["par"][2]
    assert results["seq"][2] == results["par"][2]


def test_detect_batch_warnings_interleave_and_stop_on_error(tmp_path, monkeypatch, capsys):
    """Malformed-line warnings print at their batch-list position relative
    to sample processing: a warning AFTER a failing sample never prints
    (the reference's streaming loop stops first) — on both the sequential
    and parallel paths."""
    import pytest as _pytest

    from strainer2_tpu.pipeline.detect import run_detect

    batch = tmp_path / "targets_warn.txt"
    with open("data/targets.txt") as f:
        lines = [ln for ln in f if ln.strip() and not ln.startswith("#")]
    # [warn0, sample0, bad-sample, warn1, sample1]
    content = (
        "XX\twhatever\n" + lines[0]
        + "SE\t%s\n" % (tmp_path / "missing.fa.gz")
        + "YY\twhatever\n" + lines[1]
    )
    batch.write_text(content)

    for threads in ("1", "4"):
        monkeypatch.setenv("STRAINER2_DETECT_THREADS", threads)
        out = _Out()
        with _pytest.raises(SystemExit):
            run_detect(
                "data/strainA.fna.gz", "expected/scrubbed_m05.txt",
                str(tmp_path / f"h{threads}.gz"), stdout=out,
                batch_list=str(batch),
            )
        capsys.readouterr()
        assert out.getvalue() == "unknown file type skipping line (XX)\n", threads


def test_detect_batch_parallel_partial_output_on_pe2_early(tmp_path, monkeypatch, capsys):
    """A sample whose PE2 ends early emits its PARTIAL rows before the
    error (the stream classifies complete pairs first, then exits 1) —
    identically on the sequential and parallel paths."""
    import gzip as _gzip
    import shutil

    import pytest as _pytest

    from strainer2_tpu.pipeline.detect import run_detect

    # truncate PE2: decompress, keep the first half of the reads
    import strainer2_tpu.io.fastx as fastx

    pe1 = "data/target_PE1.fasta.gz"
    pe2 = "data/target_PE2.fasta.gz"
    short2 = tmp_path / "short_PE2.fasta"
    recs = list(fastx.read_fastx(pe2))
    with open(short2, "wb") as f:
        for i, rec in enumerate(recs[: len(recs) // 2]):
            f.write(b">r%d\n" % i + rec.seq + b"\n")
    good_se = "data/target_SE.fastq"
    batch = tmp_path / "targets_pe2.txt"
    batch.write_text(
        f"SE\t{good_se}\nPE\t{pe1}\t{short2}\nSE\t{good_se}\n"
    )

    results = {}
    for threads in ("1", "4"):
        monkeypatch.setenv("STRAINER2_DETECT_THREADS", threads)
        hits = str(tmp_path / f"hits_{threads}.gz")
        out = _Out()
        with _pytest.raises(SystemExit) as exc:
            run_detect(
                "data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits,
                stdout=out, batch_list=str(batch),
            )
        with _gzip.open(hits, "rb") as f:
            results[threads] = (exc.value.code, f.read(), capsys.readouterr().err)
    assert results["1"][0] == results["4"][0] == 1
    assert results["1"][1] == results["4"][1], "payload differs"
    # the failing sample's partial rows made it out on both paths
    assert results["1"][1].count(b"\n") > 4  # more than the SE summary lines
    assert "reached end of PE2" in results["4"][2]
    assert results["1"][2] == results["4"][2]
