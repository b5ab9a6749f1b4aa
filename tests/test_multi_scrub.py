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
