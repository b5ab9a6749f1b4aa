"""Shared-panel multi-strain scrub == per-strain runs, byte-exact."""

import io
import os

import pytest

MINI = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "mini")


@pytest.fixture(autouse=True)
def _chdir(monkeypatch):
    monkeypatch.chdir(MINI)


class _Out(io.StringIO):
    def bytes(self):
        return self.getvalue().encode()


def _single(r, c_list=None):
    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    out = _Out()
    run_scrub_count(r, "data/genomes.txt", "data/metagenomes.txt",
                    c_list=c_list, out=out)
    return out.bytes()


def test_multi_scrub_matches_single_runs():
    from strainer2_tpu.pipeline.multi_scrub import run_multi_scrub

    r_files = ["data/strainA.fna.gz", "data/drug1.fna.gz"]
    singles = [_single(r) for r in r_files]
    outs = [_Out() for _ in r_files]
    run_multi_scrub(r_files, "data/genomes.txt", "data/metagenomes.txt", None, outs)
    for i, o in enumerate(outs):
        assert o.bytes() == singles[i], f"strain {i}"


def test_multi_scrub_with_drug_panel_and_own_file_skip(capsys):
    """-C semantics: each strain skips its own genome in the drug panel
    (data/drugs.txt lists strainA itself)."""
    from strainer2_tpu.pipeline.multi_scrub import run_multi_scrub

    r_files = ["data/strainA.fna.gz", "data/drug1.fna.gz"]
    singles = [_single(r, c_list="data/drugs.txt") for r in r_files]
    outs = [_Out() for _ in r_files]
    run_multi_scrub(r_files, "data/genomes.txt", "data/metagenomes.txt",
                    "data/drugs.txt", outs)
    for i, o in enumerate(outs):
        assert o.bytes() == singles[i], f"strain {i}"


def test_fused_multi_pipeline_matches_staged_per_strain(tmp_path):
    """run_multi_pipeline's per-strain artifacts equal S independent
    staged runs (scrub -> filter -> detect -> coverage)."""
    import gzip

    from strainer2_tpu.pipeline.coverage import run_coverage_depth
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.filter import parse_scrub_tables, run_filter
    from strainer2_tpu.pipeline.fused import FusedConfig, run_multi_pipeline

    r_files = ["data/strainA.fna.gz", "data/drug1.fna.gz"]

    # staged per-strain expectations
    staged = []
    for i, r in enumerate(r_files):
        counts = tmp_path / f"c{i}.tsv"
        counts.write_bytes(_single(r))
        scrub_out = _Out()
        run_filter(parse_scrub_tables([str(counts)]), min_fraction=0.05,
                   out=scrub_out, err=io.StringIO())
        scrubbed = tmp_path / f"s{i}.txt"
        scrubbed.write_bytes(scrub_out.bytes())
        hits = tmp_path / f"h{i}.gz"
        run_detect(r, str(scrubbed), str(hits), batch_list="data/targets.txt",
                   stdout=_Out())
        cov = _Out()
        run_coverage_depth(str(hits), out=cov)
        with gzip.open(hits, "rb") as f:
            staged.append((scrub_out.bytes(), f.read(), cov.bytes()))

    out_dir = tmp_path / "fusedm"
    all_paths = run_multi_pipeline(
        r_files, "data/genomes.txt", "data/metagenomes.txt",
        "data/targets.txt", str(out_dir),
        fused_cfg=FusedConfig(min_fraction=0.05),
        err=io.StringIO(), stdout=_Out(),
    )
    for paths, (exp_scrubbed, exp_hits, _) in zip(all_paths, staged):
        with gzip.open(paths["scrubbed"], "rb") as f:
            assert f.read() == exp_scrubbed
        with gzip.open(paths["hits"], "rb") as f:
            assert f.read() == exp_hits
        # coverage derives names from the hits FILENAME, so compare against
        # a staged coverage run on the fused hits file itself
        cov = _Out()
        run_coverage_depth(paths["hits"], out=cov)
        with open(paths["coverage"], "rb") as f:
            assert f.read() == cov.bytes()


def test_multi_paths_never_build_per_strain_tables():
    """Per-strain membership tables are LAZY (index/build.py) and the
    multi-strain pipelines only need codes/counts per strain (lookups go
    through the union table): after a full multi-scrub the per-strain
    indexes must still be table-less — S strains must not pay S builds."""
    from strainer2_tpu.pipeline.multi_scrub import multi_scrub_counts
    from strainer2_tpu.pipeline.scrub_count import ScrubCountConfig

    strain_indexes, columns = multi_scrub_counts(
        ["data/strainA.fna.gz", "data/drug1.fna.gz"],
        "data/genomes.txt", "data/metagenomes.txt", None, ScrubCountConfig(),
    )
    assert len(columns) == 2
    for ix in strain_indexes:
        assert ix.table_ is None, "per-strain table was built needlessly"


def test_multi_scrub_unreadable_panel_matches_reference_diagnostic(tmp_path, capsys):
    """An unreadable panel file in the shared union scan exits 1 with the
    reference's exact stderr line (reference src/genome_compare.c:196),
    like the single-strain loop — not a raw traceback."""
    import pytest as _pytest

    from strainer2_tpu.pipeline.multi_scrub import run_multi_scrub

    bad = tmp_path / "bad.txt"
    bad.write_text("/nonexistent_panel.fa.gz\n")
    with _pytest.raises(SystemExit) as e:
        run_multi_scrub(
            ["data/strainA.fna.gz"], str(bad), "data/metagenomes.txt", None,
            [io.StringIO()],
        )
    assert e.value.code == 1
    assert capsys.readouterr().err.endswith(
        "could not read file /nonexistent_panel.fa.gz "
        "in GEN_calculate_kmer_count()\n"
    )
