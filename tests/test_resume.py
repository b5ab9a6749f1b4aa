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
