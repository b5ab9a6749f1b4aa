"""Multi-strain single-pass detection == per-strain single runs, byte-exact."""

import gzip
import os

import numpy as np
import pytest

MINI = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "mini")


@pytest.fixture(autouse=True)
def _chdir(monkeypatch):
    monkeypatch.chdir(MINI)


def _informative_subset(tmp_path, genome, every=5):
    """Build a valid -a file: every Nth distinct k-mer of the genome."""
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.ops.packing import decode_codes_np
    from strainer2_tpu.pipeline.engine import KmerEngine

    codes = scan_file_codes(genome, KmerEngine(31))
    uniq = np.unique(codes)[::every]
    p = tmp_path / (os.path.basename(genome) + ".inf.txt")
    with open(p, "w") as f:
        for s in decode_codes_np(uniq, 31):
            f.write(s + "\n")
    return str(p)


def test_plan_strain_passes_splits_by_projected_bytes():
    """Pass sizing obeys both the strain-count cap and the projected
    union row-table bytes (num_buckets x row_width x 4) against the
    device budget — synthetic disjoint unions force a split."""
    from strainer2_tpu.pipeline.multi_detect import (
        MAX_STRAINS_PER_PASS,
        plan_strain_passes,
        projected_rows_bytes,
    )

    counts = [6_700_000] * 8
    # no byte budget: one pass (count cap permitting)
    assert plan_strain_passes(counts, budget=None) == [(0, 8)]
    # budget that fits exactly two disjoint strains' union per pass
    b = projected_rows_bytes(2 * 6_700_000, 2)
    assert plan_strain_passes(counts, budget=b) == [
        (0, 2), (2, 4), (4, 6), (6, 8),
    ]
    # index sharding multiplies the effective budget
    assert plan_strain_passes(counts, budget=b, index_shards=4) == [(0, 8)]
    # a single over-budget strain still gets its own pass (the detector's
    # hard check reports it with the actual union size)
    assert plan_strain_passes([10**9], budget=1024) == [(0, 1)]
    # the count cap still binds when bytes don't
    assert plan_strain_passes([1] * 300, budget=None) == [
        (0, MAX_STRAINS_PER_PASS), (MAX_STRAINS_PER_PASS, 300),
    ]
    # formula mirrors the build: 6.7M keys -> 2^21 64-lane rows
    assert projected_rows_bytes(6_700_000, 2) == (1 << 21) * 64 * 4
    assert projected_rows_bytes(6_700_000, 33) == (1 << 21) * 80 * 4
    assert projected_rows_bytes(6_700_000, 256) == (1 << 21) * 288 * 4


def test_detect_multi_cli_through_planner(tmp_path):
    """The detect-multi CLI end to end: strain list -> planned passes ->
    per-strain hits files identical to single-strain runs (pins the
    planner wiring in cli/strainer2_tools.py, not just the detector)."""
    from strainer2_tpu.cli.strainer2_tools import main as tools_main
    from strainer2_tpu.pipeline.detect import run_detect

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/panel1.fna.gz", _informative_subset(tmp_path, "data/panel1.fna.gz")),
    ]
    singles = []
    for i, (r, a) in enumerate(strains):
        p = str(tmp_path / f"cli_single_{i}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt")
        with gzip.open(p, "rb") as f:
            singles.append(f.read())

    slist = tmp_path / "strains.tsv"
    with open(slist, "w") as f:
        for r, a in strains:
            f.write(f"{r}\t{a}\n")
    out_dir = tmp_path / "cli_out"
    tools_main([
        "detect-multi", "-S", str(slist), "-B", "data/targets.txt",
        "-o", str(out_dir),
    ])
    from strainer2_tpu.pipeline.fused import _stem

    for (r, _), want in zip(strains, singles):
        with gzip.open(out_dir / (_stem(r) + ".kmer_hits.gz"), "rb") as f:
            assert f.read() == want, r


def test_estimate_genome_kmers(tmp_path):
    """Planner estimates: exact uncompressed bytes for .gz (ALL members —
    a cat of .gz parts must not report just the last member), file size
    for plain — both upper bounds on distinct k-mers."""
    import gzip as _gzip

    from strainer2_tpu.pipeline.multi_detect import estimate_genome_kmers

    body = b">g\n" + b"ACGT" * 5000 + b"\n"
    plain = tmp_path / "g.fa"
    plain.write_bytes(body)
    assert estimate_genome_kmers(str(plain)) == len(body)
    gz = tmp_path / "g.fa.gz"
    with _gzip.open(gz, "wb") as f:
        f.write(body)
    assert estimate_genome_kmers(str(gz)) == len(body)

    # multi-member (cat of two .gz): the ISIZE trailer sees only the tiny
    # last member — the estimate must cover BOTH members
    tail = b">h\n" + b"AC" * 10 + b"\n"
    gz2 = tmp_path / "m.fa.gz"
    with _gzip.open(tmp_path / "tail.gz", "wb") as f:
        f.write(tail)
    gz2.write_bytes(gz.read_bytes() + (tmp_path / "tail.gz").read_bytes())
    assert estimate_genome_kmers(str(gz2)) == len(body) + len(tail)

    # bgzip-style: a trailing empty member (ISIZE 0) must not zero the bound
    empty = _gzip.compress(b"")
    gz3 = tmp_path / "b.fa.gz"
    gz3.write_bytes(gz.read_bytes() + empty)
    assert estimate_genome_kmers(str(gz3)) == len(body)

    # trailing non-gzip padding after a complete member: clean stop
    gz4 = tmp_path / "p.fa.gz"
    gz4.write_bytes(gz.read_bytes() + b"\x00" * 64)
    assert estimate_genome_kmers(str(gz4)) == len(body)

    # truncated mid-member: decode fails, trailer garbage — the compressed
    # size (never 0) remains a usable planning value
    blob = gz.read_bytes()
    gz5 = tmp_path / "t.fa.gz"
    gz5.write_bytes(blob[: len(blob) // 2])
    assert estimate_genome_kmers(str(gz5)) > 0


def test_union_over_budget_fails_loudly(tmp_path, monkeypatch):
    """An over-budget union must raise an actionable error naming the
    projected size and the budget env var, not device-OOM."""
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    monkeypatch.setenv("STRAINER2_DEVICE_MEM_BUDGET", "4096")
    strains = [("data/strainA.fna.gz", "expected/scrubbed_m05.txt")]
    with pytest.raises(RuntimeError, match="STRAINER2_DEVICE_MEM_BUDGET"):
        MultiStrainDetector(strains)


def test_budget_forced_split_passes_stay_byte_identical(tmp_path, monkeypatch):
    """A budget that forces the fused multi pipeline into multiple
    detection passes must not change a single output byte."""
    import io

    from strainer2_tpu.pipeline.fused import FusedConfig, run_multi_pipeline
    from strainer2_tpu.pipeline.multi_detect import projected_rows_bytes

    r_files = ["data/strainA.fna.gz", "data/panel1.fna.gz", "data/drug1.fna.gz"]

    def run(out_dir):
        return run_multi_pipeline(
            r_files, "data/genomes.txt", "data/metagenomes.txt",
            "data/targets.txt", str(out_dir),
            fused_cfg=FusedConfig(min_fraction=0.05),
            err=io.StringIO(), stdout=io.StringIO(),
        )

    base = run(tmp_path / "one_pass")
    # budget = the largest single strain's projection: every strain still
    # fits alone, but the 3-strain union cannot ride one pass
    from strainer2_tpu.index.build import scan_file_codes
    from strainer2_tpu.pipeline.engine import KmerEngine
    from strainer2_tpu.pipeline.multi_detect import plan_strain_passes_from_codes

    eng = KmerEngine(31)
    codes = [np.unique(scan_file_codes(r, eng)) for r in r_files]
    budget = max(projected_rows_bytes(c.size, 1) for c in codes)
    assert len(plan_strain_passes_from_codes(codes, budget=budget)) > 1, (
        "budget must force a multi-pass plan for this test to mean anything"
    )
    monkeypatch.setenv("STRAINER2_DEVICE_MEM_BUDGET", str(budget))
    split = run(tmp_path / "split")
    for b, s in zip(base, split):
        for key in ("counts", "scrubbed", "hits", "coverage"):
            opener = gzip.open if str(b[key]).endswith(".gz") else open
            with opener(b[key], "rb") as f:
                want = f.read()
            with opener(s[key], "rb") as f:
                assert f.read() == want, f"{key} differs under forced split"


def test_multi_strain_single_pass_matches_single_runs(tmp_path):
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/strainA.fna.gz", "expected/scrubbed_m30.txt"),
        ("data/panel1.fna.gz", _informative_subset(tmp_path, "data/panel1.fna.gz")),
    ]

    singles = []
    for i, (r, a) in enumerate(strains):
        p = str(tmp_path / f"single_{i}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt")
        with gzip.open(p, "rb") as f:
            singles.append(f.read())

    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"multi_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for i, p in enumerate(outs):
        with gzip.open(p, "rb") as f:
            assert f.read() == singles[i], f"strain {i} differs"


def test_multi_strain_sharded_mesh_matches_unsharded(tmp_path):
    """--mesh DxI multi-strain detection is byte-identical to the
    single-device pass (EP meta decode over the sharded union table)."""
    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/panel1.fna.gz", _informative_subset(tmp_path, "data/panel1.fna.gz")),
    ]
    base = []
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"plain_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for p in outs:
        with gzip.open(p, "rb") as f:
            base.append(f.read())

    det_m = MultiStrainDetector(strains, cfg=DetectConfig(mesh=(2, 4)))
    assert det_m._sharded is not None
    outs_m = [str(tmp_path / f"mesh_{i}.gz") for i in range(len(strains))]
    det_m.quantify_all(outs_m, "data/targets.txt")
    for i, p in enumerate(outs_m):
        with gzip.open(p, "rb") as f:
            assert f.read() == base[i], f"strain {i} differs under mesh"


def test_multi_strain_background_filter_matches_single_runs(tmp_path):
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/strainA.fna.gz", "expected/scrubbed_m30.txt"),
    ]
    singles = []
    for i, (r, a) in enumerate(strains):
        p = str(tmp_path / f"sbg_{i}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt",
                   background_list="data/background.txt")
        with gzip.open(p, "rb") as f:
            singles.append(f.read())

    det = MultiStrainDetector(strains, background_list="data/background.txt")
    outs = [str(tmp_path / f"mbg_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for i, p in enumerate(outs):
        with gzip.open(p, "rb") as f:
            assert f.read() == singles[i], f"strain {i}"


def _twenty_strains(tmp_path):
    """20 strains (> 16: exercises the wide two-meta-block layout) over the
    three mini genomes with varied informative subsets."""
    genomes = ["data/strainA.fna.gz", "data/panel1.fna.gz", "data/panel2.fna"]
    strains = []
    for i in range(20):
        g = genomes[i % len(genomes)]
        strains.append((g, _informative_subset(tmp_path, g, every=3 + i)))
    return strains


def test_multi_strain_wide_pass_matches_single_runs(tmp_path):
    """A 20-strain single pass (strains 16..19 ride the second meta block,
    bucket_lookup_wide) is byte-identical to 20 per-strain runs — on the
    default (native) path and the jit engine path."""
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _twenty_strains(tmp_path)
    singles = []
    for i, (r, a) in enumerate(strains):
        p = str(tmp_path / f"single_{i}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt")
        with gzip.open(p, "rb") as f:
            singles.append(f.read())

    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"multi_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for i, p in enumerate(outs):
        with gzip.open(p, "rb") as f:
            assert f.read() == singles[i], f"strain {i} differs (native path)"


def test_multi_strain_wide_jit_path_matches_native(tmp_path, monkeypatch):
    """Same 20-strain pass with the native classifier disabled: the jit
    wide-lookup path produces identical bytes."""
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _twenty_strains(tmp_path)
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"nat_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")

    monkeypatch.setenv("STRAINER2_NATIVE_COUNT", "0")
    det_j = MultiStrainDetector(strains)
    outs_j = [str(tmp_path / f"jit_{i}.gz") for i in range(len(strains))]
    det_j.quantify_all(outs_j, "data/targets.txt")
    for i, (p, q) in enumerate(zip(outs, outs_j)):
        with gzip.open(p, "rb") as f, gzip.open(q, "rb") as g:
            assert f.read() == g.read(), f"strain {i} differs (jit vs native)"


def test_multi_strain_wide_sharded_mesh_matches_unsharded(tmp_path):
    """18-strain sharded (EP over the mesh) pass == single-device pass."""
    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _twenty_strains(tmp_path)[:18]
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"plain_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    base = []
    for p in outs:
        with gzip.open(p, "rb") as f:
            base.append(f.read())

    det_m = MultiStrainDetector(strains, cfg=DetectConfig(mesh=(2, 4)))
    assert det_m._sharded is not None
    outs_m = [str(tmp_path / f"mesh_{i}.gz") for i in range(len(strains))]
    det_m.quantify_all(outs_m, "data/targets.txt")
    for i, p in enumerate(outs_m):
        with gzip.open(p, "rb") as f:
            assert f.read() == base[i], f"strain {i} differs (mesh)"


def _forty_strains(tmp_path):
    """40 strains (> 32: meta words 2+ ride the native side array and the
    wider 96-lane device rows) over the three mini genomes."""
    genomes = ["data/strainA.fna.gz", "data/panel1.fna.gz", "data/panel2.fna"]
    return [
        (genomes[i % len(genomes)],
         _informative_subset(tmp_path, genomes[i % len(genomes)], every=3 + i))
        for i in range(40)
    ]


def test_multi_strain_xwide_pass_matches_single_runs(tmp_path):
    """A 40-strain single pass (strains 32..39 live in meta word 2 — the
    native CountTable side array / third 16-lane device meta block) is
    byte-identical to 40 per-strain runs."""
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _forty_strains(tmp_path)
    singles = []
    for i, (r, a) in enumerate(strains):
        p = str(tmp_path / f"xsingle_{i}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt")
        with gzip.open(p, "rb") as f:
            singles.append(f.read())

    det = MultiStrainDetector(strains)
    assert det.table.table.shape[1] == 32 + 16 * 3  # 3 meta blocks
    outs = [str(tmp_path / f"xmulti_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for i, p in enumerate(outs):
        with gzip.open(p, "rb") as f:
            assert f.read() == singles[i], f"strain {i} differs (native path)"


def test_multi_strain_beyond_96_pass_matches_single_runs(tmp_path):
    """A 130-strain single pass (9 meta blocks — beyond the round-2 cap of
    96 / 6 blocks) stays byte-identical to per-strain runs; probes cover
    word indices 0, 3, 6, and 8."""
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.multi_detect import (
        MAX_STRAINS_PER_PASS,
        MultiStrainDetector,
    )

    assert MAX_STRAINS_PER_PASS >= 130
    genomes = ["data/strainA.fna.gz", "data/panel1.fna.gz", "data/panel2.fna"]
    a_files = {
        g: _informative_subset(tmp_path, g, every=3 + j)
        for j, g in enumerate(genomes)
    }
    strains = [(genomes[i % 3], a_files[genomes[i % 3]]) for i in range(130)]

    det = MultiStrainDetector(strains)
    assert det.table.table.shape[1] == 32 + 16 * 9  # 9 meta blocks
    outs = [str(tmp_path / f"b96_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")

    for probe in (0, 55, 100, 129):  # words 0, 3, 6, 8
        r, a = strains[probe]
        p = str(tmp_path / f"b96_single_{probe}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt")
        with gzip.open(p, "rb") as f, gzip.open(outs[probe], "rb") as g:
            assert g.read() == f.read(), f"strain {probe} differs"


def test_multi_strain_xwide_jit_path_matches_native(tmp_path, monkeypatch):
    """Same 40-strain pass on the jit bucket_lookup_words path."""
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _forty_strains(tmp_path)
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"xnat_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")

    monkeypatch.setenv("STRAINER2_NATIVE_COUNT", "0")
    det_j = MultiStrainDetector(strains)
    outs_j = [str(tmp_path / f"xjit_{i}.gz") for i in range(len(strains))]
    det_j.quantify_all(outs_j, "data/targets.txt")
    for i, (p, q) in enumerate(zip(outs, outs_j)):
        with gzip.open(p, "rb") as f, gzip.open(q, "rb") as g:
            assert f.read() == g.read(), f"strain {i} differs (jit vs native)"


def test_multi_strain_xwide_sharded_mesh_matches_unsharded(tmp_path):
    """36-strain sharded (EP over the mesh, 3 meta words) == single-device."""
    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _forty_strains(tmp_path)[:36]
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"xplain_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    base = []
    for p in outs:
        with gzip.open(p, "rb") as f:
            base.append(f.read())

    det_m = MultiStrainDetector(strains, cfg=DetectConfig(mesh=(2, 4)))
    assert det_m._sharded is not None
    outs_m = [str(tmp_path / f"xmesh_{i}.gz") for i in range(len(strains))]
    det_m.quantify_all(outs_m, "data/targets.txt")
    for i, p in enumerate(outs_m):
        with gzip.open(p, "rb") as f:
            assert f.read() == base[i], f"strain {i} differs (mesh)"


def test_multi_strain_parallel_samples_match_sequential(tmp_path, monkeypatch):
    """Sample-parallel multi-strain scoring (ordered per-strain buffers) is
    byte-identical to the sequential sample loop."""
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/panel1.fna.gz", _informative_subset(tmp_path, "data/panel1.fna.gz")),
    ]
    base = []
    monkeypatch.setenv("STRAINER2_DETECT_THREADS", "1")
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"seq_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for p in outs:
        with gzip.open(p, "rb") as f:
            base.append(f.read())

    monkeypatch.setenv("STRAINER2_DETECT_THREADS", "4")
    det_p = MultiStrainDetector(strains)
    outs_p = [str(tmp_path / f"par_{i}.gz") for i in range(len(strains))]
    det_p.quantify_all(outs_p, "data/targets.txt")
    for i, p in enumerate(outs_p):
        with gzip.open(p, "rb") as f:
            assert f.read() == base[i], f"strain {i} differs"


def test_multi_strain_wide_with_background_matches_single_runs(tmp_path):
    """18 strains + shared -g background filter: demotion happens before
    the dual-block meta packing, so hi-block strains demote exactly like
    per-strain runs."""
    from strainer2_tpu.pipeline.detect import run_detect
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = _twenty_strains(tmp_path)[:18]
    singles = []
    for i, (r, a) in enumerate(strains):
        p = str(tmp_path / f"sbgw_{i}.gz")
        run_detect(r, a, p, batch_list="data/targets.txt",
                   background_list="data/background.txt")
        with gzip.open(p, "rb") as f:
            singles.append(f.read())

    det = MultiStrainDetector(strains, background_list="data/background.txt")
    outs = [str(tmp_path / f"mbgw_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    for i, p in enumerate(outs):
        with gzip.open(p, "rb") as f:
            assert f.read() == singles[i], f"strain {i} differs"


def test_over_budget_union_executes_sharded_to_identical_output(tmp_path, monkeypatch):
    """The over-budget error's own advice must WORK: a union that exceeds
    the per-device budget on one device runs under --mesh DxI (the budget
    multiplies by index shards) and produces byte-identical outputs to an
    unbudgeted single-device pass."""
    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import (
        MultiStrainDetector,
        projected_rows_bytes,
    )

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/panel1.fna.gz", _informative_subset(tmp_path, "data/panel1.fna.gz")),
    ]
    # unbudgeted single-device baseline (also yields the union size)
    det = MultiStrainDetector(strains)
    outs = [str(tmp_path / f"plain_{i}.gz") for i in range(len(strains))]
    det.quantify_all(outs, "data/targets.txt")
    base = []
    for p in outs:
        with gzip.open(p, "rb") as f:
            base.append(f.read())
    needed = projected_rows_bytes(det._union_codes.shape[0], len(strains))

    # a synthetic budget the single-device pass cannot satisfy...
    monkeypatch.setenv("STRAINER2_DEVICE_MEM_BUDGET", str(needed - 1))
    with pytest.raises(RuntimeError, match="STRAINER2_DEVICE_MEM_BUDGET"):
        MultiStrainDetector(strains)

    # ...executes under an index-sharded mesh (budget x 4 shards covers it)
    det_m = MultiStrainDetector(strains, cfg=DetectConfig(mesh=(2, 4)))
    assert det_m._sharded is not None
    outs_m = [str(tmp_path / f"mesh_{i}.gz") for i in range(len(strains))]
    det_m.quantify_all(outs_m, "data/targets.txt")
    for i, p in enumerate(outs_m):
        with gzip.open(p, "rb") as f:
            assert f.read() == base[i], f"strain {i} differs under mesh"


def test_post_build_budget_recheck_catches_grown_table(tmp_path, monkeypatch):
    """build_bucket_table grows h_bits on bucket overflow, so the BUILT
    table can exceed the pre-build projection; the detector must re-check
    actual bytes and fail loudly instead of OOMing later."""
    import numpy as np

    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.pipeline import multi_detect as md

    strains = [("data/strainA.fna.gz", "expected/scrubbed_m05.txt")]

    def grown(codes, k, h_bits=None, row_width=64):
        n = np.asarray(codes).shape[0]
        default = max(4, int(np.ceil(np.log2(max(n, 1) / 3.3))))
        return build_bucket_table(codes, k, h_bits=default + 2, row_width=row_width)

    monkeypatch.setattr(md, "build_bucket_table", grown)
    # budget sized to the PROJECTION: the pre-build check passes, the
    # post-build check must catch the 4x-grown table
    from strainer2_tpu.index.build import StrainIndex
    from strainer2_tpu.pipeline.engine import KmerEngine

    idx = StrainIndex.from_fasta("data/strainA.fna.gz", KmerEngine(31), 256, 256)
    needed = md.projected_rows_bytes(idx.num_kmers, 1)
    monkeypatch.setenv("STRAINER2_DEVICE_MEM_BUDGET", str(needed))
    with pytest.raises(RuntimeError, match="BUILT"):
        md.MultiStrainDetector(strains)


def test_plan_from_codes_exact_union_beats_sum_bound():
    """Exact union planning keeps RELATED strains in one pass where the
    conservative sum-bound splits them; for disjoint strains both agree."""
    from strainer2_tpu.pipeline.multi_detect import (
        plan_strain_passes,
        plan_strain_passes_from_codes,
        projected_rows_bytes,
    )

    rng = np.random.default_rng(3)
    base = np.unique(rng.integers(0, 1 << 60, size=50_000, dtype=np.uint64))
    # 4 "variants": each shares ~99% of the base set
    variants = []
    for _ in range(4):
        drop = rng.random(base.size) < 0.01
        extra = rng.integers(0, 1 << 60, size=500, dtype=np.uint64)
        variants.append(np.unique(np.concatenate([base[~drop], extra])))
    union_all = np.unique(np.concatenate(variants))
    # budget: fits the REAL 4-variant union, not the 4x sum
    budget = projected_rows_bytes(union_all.size, 4)
    assert len(plan_strain_passes([v.size for v in variants], budget=budget)) > 1
    assert plan_strain_passes_from_codes(variants, budget=budget) == [(0, 4)]

    # disjoint strains: both planners split identically
    disjoint = [
        np.unique(rng.integers(0, 1 << 60, size=50_000, dtype=np.uint64))
        for _ in range(4)
    ]
    b2 = projected_rows_bytes(2 * 50_000, 2)
    assert plan_strain_passes_from_codes(disjoint, budget=b2) == plan_strain_passes(
        [v.size for v in disjoint], budget=b2
    )

    # callable (lazy-scan) entries work and fetch at most twice
    calls = {"n": 0}

    def getter(v):
        def get():
            calls["n"] += 1
            return v

        return get

    assert plan_strain_passes_from_codes(
        [getter(v) for v in disjoint], budget=b2
    ) == [(0, 2), (2, 4)]
    assert calls["n"] <= len(disjoint) + 2  # one re-fetch per pass boundary


def test_mesh_plus_multiprocess_refusals_are_clean(tmp_path, monkeypatch, capsys):
    """--mesh + multi-process partitioning must refuse with an explanatory
    error (divergent per-rank program counts would deadlock collectives),
    not hang: pinned for both the multi-strain detector and the scrub
    pipeline (pipeline/multi_detect.py, pipeline/scrub_count.py)."""
    import io

    import jax

    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    det = MultiStrainDetector(
        [("data/strainA.fna.gz", "expected/scrubbed_m05.txt")],
        DetectConfig(mesh=(2, 4)), stdout=io.StringIO(),
    )
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(SystemExit) as e:
        det.quantify_all([str(tmp_path / "h.gz")], "data/targets.txt")
    assert e.value.code == 1
    assert "cannot combine" in capsys.readouterr().err

    from strainer2_tpu.parallel import distributed
    from strainer2_tpu.pipeline.scrub_count import ScrubCountConfig, run_scrub_count

    monkeypatch.setattr(distributed, "initialize", lambda *a, **kw: (0, 2))
    with pytest.raises(SystemExit) as e:
        run_scrub_count(
            "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
            out=io.StringIO(), cfg=ScrubCountConfig(mesh=(1, 8)),
        )
    assert e.value.code == 1
    assert "cannot combine" in capsys.readouterr().err
