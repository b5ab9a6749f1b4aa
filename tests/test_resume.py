"""Checkpoint/resume must be bit-identical to an uninterrupted run."""

import io
import os

import pytest

MINI = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "mini")


@pytest.fixture(autouse=True)
def _chdir(monkeypatch):
    monkeypatch.chdir(MINI)


def test_scrub_resume_bit_identical(tmp_path):
    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    ck = str(tmp_path / "ckpt")

    class Boom(Exception):
        pass

    # run once, crashing after the first panel file completes
    from strainer2_tpu.pipeline import scrub_count as sc

    orig = sc.count_panel_file
    calls = {"n": 0}

    def crashing(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return orig(*a, **kw)

    sc.count_panel_file = crashing
    try:
        with pytest.raises(Boom):
            run_scrub_count(
                "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
                out=io.StringIO(), checkpoint_dir=ck,
            )
    finally:
        sc.count_panel_file = orig

    # resume: only the remaining files are re-counted
    out = io.StringIO()
    run_scrub_count(
        "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
        out=out, checkpoint_dir=ck,
    )
    with open("expected/scrub_counts.tsv", "rb") as f:
        assert out.getvalue().encode() == f.read()


def _read_gz(path):
    import gzip

    with gzip.open(path, "rb") as f:
        return f.read()


def test_detect_checkpoint_fresh_run_identical(tmp_path):
    """A checkpointed batch run (staged scoring path) is byte-identical to
    the streaming loop, including stdout warning interleaving."""
    from strainer2_tpu.pipeline.detect import run_detect

    p_ref, p_ck = str(tmp_path / "ref.gz"), str(tmp_path / "ck.gz")
    out_ref, out_ck = io.StringIO(), io.StringIO()
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p_ref,
               batch_list="data/targets.txt", stdout=out_ref)
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p_ck,
               batch_list="data/targets.txt", stdout=out_ck,
               checkpoint_dir=str(tmp_path / "ckpt"))
    assert _read_gz(p_ck) == _read_gz(p_ref)
    assert out_ck.getvalue() == out_ref.getvalue()


def test_detect_resume_bit_identical(tmp_path, monkeypatch):
    """Crash after the first sample of a -B batch; the resumed run replays
    the stored payload, scores only the remaining samples, and the output
    is byte-identical to an uninterrupted run."""
    from strainer2_tpu.pipeline.detect import StrainDetector, run_detect

    monkeypatch.setenv("STRAINER2_DETECT_THREADS", "1")  # deterministic crash point
    p_ref = str(tmp_path / "ref.gz")
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p_ref,
               batch_list="data/targets.txt", stdout=io.StringIO())

    class Boom(Exception):
        pass

    calls = {"n": 0}
    orig_native = StrainDetector._quantify_sample_native
    orig_jit = StrainDetector._quantify_sample

    def crash_after_first(orig):
        def wrapper(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise Boom()
            return orig(self, *a, **kw)

        return wrapper

    ck = str(tmp_path / "ckpt")
    p1 = str(tmp_path / "crash.gz")
    monkeypatch.setattr(
        StrainDetector, "_quantify_sample_native", crash_after_first(orig_native)
    )
    monkeypatch.setattr(
        StrainDetector, "_quantify_sample", crash_after_first(orig_jit)
    )
    with pytest.raises(Boom):
        run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p1,
                   batch_list="data/targets.txt", stdout=io.StringIO(),
                   checkpoint_dir=ck)
    assert calls["n"] == 2

    # resume: the completed sample must NOT be rescored
    calls["n"] = 0
    monkeypatch.setattr(
        StrainDetector, "_quantify_sample_native",
        lambda self, nc, f1, *a, **kw: (_ for _ in ()).throw(
            AssertionError(f"rescored {f1}")
        ) if f1 == "data/target_PE1.fasta.gz" else orig_native(self, nc, f1, *a, **kw),
    )
    monkeypatch.setattr(
        StrainDetector, "_quantify_sample",
        lambda self, f1, *a, **kw: (_ for _ in ()).throw(
            AssertionError(f"rescored {f1}")
        ) if f1 == "data/target_PE1.fasta.gz" else orig_jit(self, f1, *a, **kw),
    )
    p2 = str(tmp_path / "resumed.gz")
    out2 = io.StringIO()
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p2,
               batch_list="data/targets.txt", stdout=out2, checkpoint_dir=ck)
    assert _read_gz(p2) == _read_gz(p_ref)


def test_multi_detect_checkpoint_fresh_and_resume(tmp_path):
    """Multi-strain staged detection: a checkpointed run matches the
    streaming run per strain, and a full resume (all samples recorded)
    replays without rescoring."""
    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    strains = [
        ("data/strainA.fna.gz", "expected/scrubbed_m05.txt"),
        ("data/strainA.fna.gz", "expected/scrubbed_m30.txt"),
    ]
    ref_paths = [str(tmp_path / f"ref_{i}.gz") for i in range(len(strains))]
    det = MultiStrainDetector(strains, DetectConfig(), stdout=io.StringIO())
    det.quantify_all(ref_paths, "data/targets.txt")

    ck = str(tmp_path / "ckpt")
    ck_paths = [str(tmp_path / f"ck_{i}.gz") for i in range(len(strains))]
    det2 = MultiStrainDetector(strains, DetectConfig(), stdout=io.StringIO())
    det2.quantify_all(ck_paths, "data/targets.txt", checkpoint_dir=ck)
    for rp, cp in zip(ref_paths, ck_paths):
        assert _read_gz(cp) == _read_gz(rp)

    # full resume: no sample is rescored
    det3 = MultiStrainDetector(strains, DetectConfig(), stdout=io.StringIO())
    det3._quantify_sample_native = det3._quantify_sample = (
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("rescored"))
    )
    re_paths = [str(tmp_path / f"re_{i}.gz") for i in range(len(strains))]
    det3.quantify_all(re_paths, "data/targets.txt", checkpoint_dir=ck)
    for rp, cp in zip(ref_paths, re_paths):
        assert _read_gz(cp) == _read_gz(rp)


def test_detect_staged_error_matches_sequential(tmp_path, monkeypatch, capsys):
    """The staged (checkpointed) path keeps the sequential loop's failure
    semantics: earlier samples' output present, the failing sample's
    diagnostics printed, exit 1, later samples (and later warnings)
    discarded — and a resume after fixing the input completes to the
    uninterrupted bytes."""
    import gzip as _gzip

    import pytest as _pytest

    from strainer2_tpu.pipeline.detect import run_detect

    missing = tmp_path / "missing.fa.gz"
    batch = tmp_path / "targets_bad.txt"
    with open("data/targets.txt") as f:
        lines = [ln for ln in f if ln.strip() and not ln.startswith("#")]
    batch.write_text(lines[0] + f"SE\t{missing}\n" + "YY\twhatever\n" + lines[1])

    # sequential (non-staged) expectation
    hits_seq = str(tmp_path / "seq.gz")
    out_seq = io.StringIO()
    with _pytest.raises(SystemExit) as exc:
        run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits_seq,
                   stdout=out_seq, batch_list=str(batch))
    assert (exc.value.code or 0) == 1
    err_seq = capsys.readouterr().err
    with _gzip.open(hits_seq, "rb") as f:
        payload_seq = f.read()

    hits_st = str(tmp_path / "staged.gz")
    out_st = io.StringIO()
    with _pytest.raises(SystemExit) as exc:
        run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", hits_st,
                   stdout=out_st, batch_list=str(batch),
                   checkpoint_dir=str(tmp_path / "ckpt"))
    assert (exc.value.code or 0) == 1
    assert capsys.readouterr().err == err_seq
    with _gzip.open(hits_st, "rb") as f:
        assert f.read() == payload_seq
    assert out_st.getvalue() == out_seq.getvalue()
    assert "YY" not in out_st.getvalue()  # warning after the failure never prints

    # fix the input; resume completes without rescoring the first sample
    import shutil

    src = lines[1].split("\t")[1].strip()
    shutil.copy(src, missing)
    expected_hits = str(tmp_path / "full.gz")
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", expected_hits,
               stdout=io.StringIO(), batch_list=str(batch))
    resumed = str(tmp_path / "resumed.gz")
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", resumed,
               stdout=io.StringIO(), batch_list=str(batch),
               checkpoint_dir=str(tmp_path / "ckpt"))
    with _gzip.open(expected_hits, "rb") as a, _gzip.open(resumed, "rb") as b:
        assert a.read() == b.read()


def test_detect_index_cache_identical(tmp_path):
    import gzip

    from strainer2_tpu.pipeline.detect import run_detect

    cache = str(tmp_path / "idx.npz")
    p1, p2 = str(tmp_path / "a.gz"), str(tmp_path / "b.gz")
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p1,
               batch_list="data/targets.txt", index_cache=cache)
    assert os.path.exists(cache)
    run_detect("data/strainA.fna.gz", "expected/scrubbed_m05.txt", p2,
               batch_list="data/targets.txt", index_cache=cache)
    with gzip.open(p1, "rb") as a, gzip.open(p2, "rb") as b:
        assert a.read() == b.read()


# ---- multi-strain resume (the shared union panel scan + fused pipeline) ----


def _run_multi_scrub_mini(r_files, outs, **kw):
    from strainer2_tpu.pipeline.multi_scrub import run_multi_scrub

    run_multi_scrub(r_files, "data/genomes.txt", "data/metagenomes.txt",
                    None, outs, **kw)


def test_multi_scrub_resume_bit_identical(tmp_path, monkeypatch):
    """Crash the shared union panel scan mid-panel; the resumed run skips
    the recorded file, recounts only the rest, and every strain's table is
    byte-identical to an uninterrupted run."""
    import json

    from strainer2_tpu.pipeline import progress as prog

    r_files = ["data/strainA.fna.gz", "data/drug1.fna.gz"]
    outs = [io.StringIO() for _ in r_files]
    _run_multi_scrub_mini(r_files, outs)
    want = [o.getvalue() for o in outs]

    class Boom(Exception):
        pass

    ck = str(tmp_path / "ckpt")
    calls = {"n": 0}
    orig_record = prog.ScrubCheckpoint.record

    def crashing(self, column, path, counts):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return orig_record(self, column, path, counts)

    monkeypatch.setattr(prog.ScrubCheckpoint, "record", crashing)
    with pytest.raises(Boom):
        _run_multi_scrub_mini(
            r_files, [io.StringIO() for _ in r_files], checkpoint_dir=ck
        )
    monkeypatch.setattr(prog.ScrubCheckpoint, "record", orig_record)

    with open(os.path.join(ck, "manifest.json")) as f:
        manifest = json.load(f)
    done_files = [p for lst in manifest["done"].values() for p in lst]
    assert done_files, "no file completed before the crash"
    assert manifest.get("key"), "checkpoint must carry the strain-set key"

    # resume: the recorded file must NOT be recounted, on either engine path
    from strainer2_tpu.index.build import StrainIndex
    from strainer2_tpu.pipeline import scrub_count as sc

    orig_nc = StrainIndex.native_counter
    orig_cpf = sc.count_panel_file

    class GuardNC:
        def __init__(self, nc):
            self._nc = nc

        def count_file(self, counts, path):
            assert path not in done_files, f"recounted {path}"
            return self._nc.count_file(counts, path)

    monkeypatch.setattr(
        StrainIndex, "native_counter", lambda self: GuardNC(orig_nc(self))
    )

    def guard_cpf(engine, index, counts, path, rows, row_len):
        assert path not in done_files, f"recounted {path}"
        return orig_cpf(engine, index, counts, path, rows, row_len)

    monkeypatch.setattr(sc, "count_panel_file", guard_cpf)
    outs = [io.StringIO() for _ in r_files]
    _run_multi_scrub_mini(r_files, outs, checkpoint_dir=ck)
    assert [o.getvalue() for o in outs] == want


def test_multi_scrub_checkpoint_stale_strain_set_restarts(tmp_path, capsys):
    """A checkpoint recorded for a DIFFERENT strain set must be discarded
    (fresh start), not mixed in: the union's slot-indexed counts only mean
    anything against the exact union they were recorded for."""
    ck = str(tmp_path / "ckpt")
    outs = [io.StringIO()]
    _run_multi_scrub_mini(["data/drug1.fna.gz"], outs, checkpoint_dir=ck)

    r_files = ["data/strainA.fna.gz", "data/drug1.fna.gz"]
    outs = [io.StringIO() for _ in r_files]
    _run_multi_scrub_mini(r_files, outs)
    want = [o.getvalue() for o in outs]

    outs = [io.StringIO() for _ in r_files]
    _run_multi_scrub_mini(r_files, outs, checkpoint_dir=ck)
    assert [o.getvalue() for o in outs] == want
    assert "starting fresh" in capsys.readouterr().err


def _mini_multi_pipeline(out_dir, **kw):
    from strainer2_tpu.pipeline.fused import FusedConfig, run_multi_pipeline

    return run_multi_pipeline(
        ["data/strainA.fna.gz", "data/drug1.fna.gz"],
        "data/genomes.txt", "data/metagenomes.txt", "data/targets.txt",
        str(out_dir), fused_cfg=FusedConfig(min_fraction=0.05),
        err=io.StringIO(), stdout=io.StringIO(), **kw,
    )


def _artifact_payloads(all_paths):
    out = []
    for paths in all_paths:
        for key in ("counts", "scrubbed", "hits"):
            out.append(_read_gz(paths[key]))
        with open(paths["coverage"], "rb") as f:
            out.append(f.read())
    return out


def test_pipeline_multi_resume_scrub_crash(tmp_path, monkeypatch):
    """pipeline-multi killed mid-panel during the shared union scan: the
    resumed run completes and EVERY per-strain artifact (counts, scrubbed,
    hits, coverage) is byte-identical to an uninterrupted run."""
    from strainer2_tpu.pipeline import progress as prog

    want = _artifact_payloads(_mini_multi_pipeline(tmp_path / "ref"))

    class Boom(Exception):
        pass

    calls = {"n": 0}
    orig_record = prog.ScrubCheckpoint.record

    def crashing(self, column, path, counts):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return orig_record(self, column, path, counts)

    ck = tmp_path / "ckpt"
    monkeypatch.setattr(prog.ScrubCheckpoint, "record", crashing)
    with pytest.raises(Boom):
        _mini_multi_pipeline(tmp_path / "crash", checkpoint_dir=str(ck))
    monkeypatch.setattr(prog.ScrubCheckpoint, "record", orig_record)
    assert (ck / "scrub" / "manifest.json").exists()

    got = _artifact_payloads(
        _mini_multi_pipeline(tmp_path / "resumed", checkpoint_dir=str(ck))
    )
    assert got == want


def test_pipeline_multi_resume_detect_crash(tmp_path, monkeypatch):
    """pipeline-multi killed after the first detection sample: the resumed
    run replays the stored per-strain payloads for that sample (no
    rescore) and all artifacts match an uninterrupted run."""
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector

    monkeypatch.setenv("STRAINER2_DETECT_THREADS", "1")
    want = _artifact_payloads(_mini_multi_pipeline(tmp_path / "ref"))

    class Boom(Exception):
        pass

    calls = {"n": 0}
    orig = MultiStrainDetector._quantify_sample_native
    orig_jit = MultiStrainDetector._quantify_sample

    def crash_after_first(fn):
        def wrapper(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise Boom()
            return fn(self, *a, **kw)

        return wrapper

    ck = tmp_path / "ckpt"
    monkeypatch.setattr(
        MultiStrainDetector, "_quantify_sample_native", crash_after_first(orig)
    )
    monkeypatch.setattr(
        MultiStrainDetector, "_quantify_sample", crash_after_first(orig_jit)
    )
    with pytest.raises(Boom):
        _mini_multi_pipeline(tmp_path / "crash", checkpoint_dir=str(ck))
    assert calls["n"] == 2

    # resume: the completed first sample must not be rescored
    first = "data/target_PE1.fasta.gz"
    monkeypatch.setattr(
        MultiStrainDetector, "_quantify_sample_native",
        lambda self, nc, f1, *a, **kw: (_ for _ in ()).throw(
            AssertionError(f"rescored {f1}")
        ) if f1 == first else orig(self, nc, f1, *a, **kw),
    )
    monkeypatch.setattr(
        MultiStrainDetector, "_quantify_sample",
        lambda self, f1, *a, **kw: (_ for _ in ()).throw(
            AssertionError(f"rescored {f1}")
        ) if f1 == first else orig_jit(self, f1, *a, **kw),
    )
    got = _artifact_payloads(
        _mini_multi_pipeline(tmp_path / "resumed", checkpoint_dir=str(ck))
    )
    assert got == want


def test_pipeline_multi_detect_checkpoint_keyed_to_filter_config(tmp_path):
    """A pipeline-multi detect checkpoint is keyed to the strains AND the
    filter outcome: rerunning with a different min_fraction must NOT
    replay the old payloads (different informative sets -> different
    directory), and the rerun's artifacts equal a fresh run's."""
    from strainer2_tpu.pipeline.fused import FusedConfig, run_multi_pipeline

    def run(out_dir, m, ck=None):
        return run_multi_pipeline(
            ["data/strainA.fna.gz", "data/drug1.fna.gz"],
            "data/genomes.txt", "data/metagenomes.txt", "data/targets.txt",
            str(out_dir), fused_cfg=FusedConfig(min_fraction=m),
            err=io.StringIO(), stdout=io.StringIO(),
            checkpoint_dir=ck,
        )

    ck = str(tmp_path / "ckpt")
    run(tmp_path / "a", 0.05, ck=ck)
    dirs_before = {d for d in os.listdir(ck) if d.startswith("detect_")}
    assert dirs_before

    want = _artifact_payloads(run(tmp_path / "ref30", 0.30))
    got = _artifact_payloads(run(tmp_path / "b", 0.30, ck=ck))
    assert got == want
    dirs_after = {d for d in os.listdir(ck) if d.startswith("detect_")}
    assert dirs_after - dirs_before, "different filter config must re-key"


def test_pipeline_fused_single_resume_scrub_and_detect(tmp_path, monkeypatch):
    """The single-strain fused pipeline with --checkpoint: crash during
    panel counting, resume; then a second crash during detection, resume
    again — final artifacts byte-identical to an uninterrupted run."""
    from strainer2_tpu.pipeline import progress as prog
    from strainer2_tpu.pipeline.detect import StrainDetector
    from strainer2_tpu.pipeline.fused import FusedConfig, run_pipeline

    monkeypatch.setenv("STRAINER2_DETECT_THREADS", "1")

    def run(out_dir, ck=None):
        return run_pipeline(
            "data/strainA.fna.gz", "data/genomes.txt", "data/metagenomes.txt",
            "data/targets.txt", str(out_dir),
            fused_cfg=FusedConfig(min_fraction=0.05),
            err=io.StringIO(), stdout=io.StringIO(), checkpoint_dir=ck,
        )

    ref = run(tmp_path / "ref")
    want = [_read_gz(ref["counts"]), _read_gz(ref["scrubbed"]),
            _read_gz(ref["hits"])]

    class Boom(Exception):
        pass

    ck = str(tmp_path / "ckpt")
    calls = {"n": 0}
    orig_record = prog.ScrubCheckpoint.record

    def crashing(self, column, path, counts):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return orig_record(self, column, path, counts)

    monkeypatch.setattr(prog.ScrubCheckpoint, "record", crashing)
    with pytest.raises(Boom):
        run(tmp_path / "crash1", ck=ck)
    monkeypatch.setattr(prog.ScrubCheckpoint, "record", orig_record)
    assert os.path.exists(os.path.join(ck, "scrub"))

    # second crash: during detection of the 2nd sample
    dcalls = {"n": 0}
    orig_nat = StrainDetector._quantify_sample_native
    orig_jit = StrainDetector._quantify_sample

    def crash_detect(fn):
        def wrapper(self, *a, **kw):
            dcalls["n"] += 1
            if dcalls["n"] == 2:
                raise Boom()
            return fn(self, *a, **kw)

        return wrapper

    monkeypatch.setattr(
        StrainDetector, "_quantify_sample_native", crash_detect(orig_nat)
    )
    monkeypatch.setattr(StrainDetector, "_quantify_sample", crash_detect(orig_jit))
    with pytest.raises(Boom):
        run(tmp_path / "crash2", ck=ck)
    monkeypatch.setattr(StrainDetector, "_quantify_sample_native", orig_nat)
    monkeypatch.setattr(StrainDetector, "_quantify_sample", orig_jit)

    got = run(tmp_path / "resumed", ck=ck)
    assert [_read_gz(got["counts"]), _read_gz(got["scrubbed"]),
            _read_gz(got["hits"])] == want
