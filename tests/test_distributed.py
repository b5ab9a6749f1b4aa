import os
import socket
import subprocess
import sys

import numpy as np

from strainer2_tpu.parallel.distributed import (
    host_file_partition,
    initialize,
    merge_across_hosts,
)


def test_initialize_single_process():
    assert initialize() == (0, 1)


def test_host_file_partition_covers_and_balances(tmp_path):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(13):
        p = tmp_path / f"f{i}.fa"
        p.write_bytes(b"x" * int(rng.integers(10, 10_000)))
        paths.append(str(p))
    shares = [host_file_partition(paths, h, 4) for h in range(4)]
    # disjoint and complete
    union = [p for s in shares for p in s]
    assert sorted(union) == sorted(paths)
    assert len(set(union)) == len(paths)
    # order within each share follows the original list order
    for s in shares:
        assert s == [p for p in paths if p in set(s)]


def test_merge_across_hosts_single_process_passthrough():
    counts = np.arange(100, dtype=np.uint32)
    np.testing.assert_array_equal(merge_across_hosts(counts), counts)


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def test_merge_across_hosts_two_real_processes(tmp_path):
    """Launch 2 actual jax.distributed processes over localhost CPU; each
    counts its host_file_partition share of the panel through the
    production path and merges.  Both merged vectors must be bit-identical
    to a single-process count over the full file list."""
    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.pipeline.engine import KmerEngine
    from strainer2_tpu.pipeline.scrub_count import count_panel_file

    k, rows, row_len = 31, 8, 512
    rng = np.random.default_rng(42)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=3000)].tobytes().decode()
    _write_fasta(tmp_path / "genome.fa", [genome])
    panels = []
    for j in range(3):
        reads = []
        for _ in range(60):
            if rng.random() < 0.5:  # genome-derived read -> guaranteed hits
                start = int(rng.integers(0, len(genome) - 80))
                reads.append(genome[start : start + 80])
            else:
                reads.append(alpha[rng.integers(0, 4, size=80)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))

    # expected: single-process count over every panel file, same code path
    engine = KmerEngine(k)
    index = StrainIndex.from_fasta(str(tmp_path / "genome.fa"), engine, rows, row_len)
    counts = engine.init_counts(index)
    for p in panels:
        counts = count_panel_file(engine, index, counts, p, rows, row_len)
    expected = np.asarray(engine.finalize_counts(counts))
    assert int(expected.sum()) > 0

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    env = {
        k_: v
        for k_, v in os.environ.items()
        if k_ not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")

    locals_ = [np.load(tmp_path / f"local_{i}.npy") for i in range(2)]
    # the partition is a real split: neither process saw everything
    assert any((loc != expected).any() for loc in locals_)
    np.testing.assert_array_equal(locals_[0] + locals_[1], expected)
    for i in range(2):
        merged = np.load(tmp_path / f"merged_{i}.npy")
        np.testing.assert_array_equal(merged, expected)


def test_run_scrub_count_two_real_processes(tmp_path):
    """The SPMD scrub pipeline over 2 real jax.distributed processes:
    rank 0's table is byte-identical to a single-process run; rank 1
    writes nothing."""
    import io

    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=3000)].tobytes().decode()
    _write_fasta(tmp_path / "genome.fa", [genome])
    panels = []
    for j in range(4):
        reads = []
        for _ in range(40):
            if rng.random() < 0.5:
                start = int(rng.integers(0, len(genome) - 80))
                reads.append(genome[start : start + 80])
            else:
                reads.append(alpha[rng.integers(0, 4, size=80)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels) + "\n")

    out = io.StringIO()
    run_scrub_count(
        str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
        str(tmp_path / "panels.txt"), out=out,
    )
    expected = out.getvalue()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    env = {
        k_: v
        for k_, v in os.environ.items()
        if k_ not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, str(tmp_path), "scrub"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")
    with open(tmp_path / "table_0.tsv") as f:
        assert f.read() == expected
    with open(tmp_path / "table_1.tsv") as f:
        assert f.read() == ""  # non-zero ranks write nothing


def test_host_file_partition_duplicate_entries_split_by_occurrence(tmp_path):
    """Duplicate list entries (supported: they re-count) are partitioned by
    POSITION — each occurrence lands on exactly one host."""
    p = tmp_path / "f.fa"
    p.write_bytes(b"x" * 100)
    paths = [str(p), str(p)]
    shares = [host_file_partition(paths, h, 2) for h in range(2)]
    assert sorted(len(s) for s in shares) in ([0, 2], [1, 1])
    assert sum(len(s) for s in shares) == 2


def _launch_scrub_workers(tmp_path, mode, nproc=2, extra_env=None,
                          expect_rc=0):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    env = {
        k_: v
        for k_, v in os.environ.items()
        if k_ not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), port, str(tmp_path), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out = p.communicate(timeout=240)[0]
        outs.append(out)
        if expect_rc is not None:
            assert p.returncode == expect_rc, out.decode(errors="replace")
    return procs, outs


def test_run_scrub_count_two_processes_checkpointed_and_resumed(tmp_path):
    """Multi-host + checkpoint: per-rank checkpoint dirs, partition computed
    over the full list so resume can't shift assignments.  A fresh
    checkpointed 2-process run AND a full resume (every file already done)
    both produce the single-process table byte-for-byte."""
    import io

    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=2500)].tobytes().decode()
    _write_fasta(tmp_path / "genome.fa", [genome])
    panels = []
    for j in range(5):
        reads = []
        for _ in range(30):
            if rng.random() < 0.5:
                start = int(rng.integers(0, len(genome) - 70))
                reads.append(genome[start : start + 70])
            else:
                reads.append(alpha[rng.integers(0, 4, size=70)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))
    # a duplicate entry exercises occurrence-level partitioning
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels + [panels[0]]) + "\n")

    out = io.StringIO()
    run_scrub_count(
        str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
        str(tmp_path / "panels.txt"), out=out,
    )
    expected = out.getvalue()

    _launch_scrub_workers(tmp_path, "scrub_ckpt")
    with open(tmp_path / "table_0.tsv") as f:
        assert f.read() == expected
    assert (tmp_path / "ckpt" / "rank0").is_dir()
    assert (tmp_path / "ckpt" / "rank1").is_dir()

    # resume: every file recorded done — counts restore from checkpoints
    os.remove(tmp_path / "table_0.tsv")
    _launch_scrub_workers(tmp_path, "scrub_ckpt")
    with open(tmp_path / "table_0.tsv") as f:
        assert f.read() == expected


def _make_detect_workdir(tmp_path, rng, with_background=True):
    """Genome + scrubbed-k-mer file + mixed SE/PE batch list (including a
    malformed line, so stdout-warning interleaving is exercised)."""
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=4000)].tobytes().decode()
    _write_fasta(tmp_path / "genome.fa", [genome])
    with open(tmp_path / "scrubbed.txt", "w") as f:
        for i in range(0, 2000, 40):
            f.write(genome[i : i + 31] + "\n")

    def make_reads(n, hit_rate):
        reads = []
        for _ in range(n):
            if rng.random() < hit_rate:
                start = int(rng.integers(0, len(genome) - 90))
                reads.append(genome[start : start + 90])
            else:
                reads.append(alpha[rng.integers(0, 4, size=90)].tobytes().decode())
        return reads

    sample_files = []
    for j in range(4):
        p = tmp_path / f"se_{j}.fa"
        _write_fasta(p, make_reads(25 + 10 * j, 0.4))
        sample_files.append(str(p))
    _write_fasta(tmp_path / "pe_1.fa", make_reads(30, 0.5))
    _write_fasta(tmp_path / "pe_2.fa", make_reads(30, 0.5))
    with open(tmp_path / "targets.txt", "w") as f:
        f.write(f"SE\t{sample_files[0]}\n")
        f.write(f"PE\t{tmp_path}/pe_1.fa\t{tmp_path}/pe_2.fa\n")
        f.write("XX\tnot_a_file\n")  # malformed: stdout warning position
        for s in sample_files[1:]:
            f.write(f"SE\t{s}\n")
    if with_background:
        bg = tmp_path / "bg.fa"
        _write_fasta(bg, make_reads(40, 0.3))
        with open(tmp_path / "background.txt", "w") as f:
            f.write(f"{bg}\n{sample_files[0]}\n")


def _expected_detect(tmp_path, with_background=True):
    import io

    from strainer2_tpu.pipeline.detect import run_detect

    out = io.StringIO()
    run_detect(
        str(tmp_path / "genome.fa"), str(tmp_path / "scrubbed.txt"),
        str(tmp_path / "hits_ref.gz"),
        batch_list=str(tmp_path / "targets.txt"),
        background_list=(
            str(tmp_path / "background.txt") if with_background else None
        ),
        stdout=out,
    )
    import gzip as _gzip

    with _gzip.open(tmp_path / "hits_ref.gz", "rb") as f:
        return f.read(), out.getvalue()


def test_run_detect_two_real_processes(tmp_path):
    """SPMD detection over 2 real jax.distributed processes: samples are
    scored across ranks (background filter counting partitioned too) and
    rank 0's gzip payload + stdout are byte-identical to a single-process
    run; rank 1 writes neither."""
    rng = np.random.default_rng(31)
    _make_detect_workdir(tmp_path, rng)
    expected_hits, expected_stdout = _expected_detect(tmp_path)
    assert b"\t" in expected_hits  # some informative rows, not just summaries

    _launch_scrub_workers(tmp_path, "detect")
    import gzip as _gzip

    with _gzip.open(tmp_path / "hits_0.gz", "rb") as f:
        assert f.read() == expected_hits
    with open(tmp_path / "detect_stdout_0.txt") as f:
        assert f.read() == expected_stdout
    assert not (tmp_path / "hits_1.gz").exists()
    with open(tmp_path / "detect_stdout_1.txt") as f:
        assert f.read() == ""


def test_run_detect_two_processes_checkpointed_and_resumed(tmp_path):
    """SPMD detection + per-rank sample checkpoints: a fresh checkpointed
    2-process run AND a full resume (every sample already recorded) both
    reproduce the single-process output byte-for-byte, and both ranks
    actually scored samples (the partition is a real split)."""
    import json

    rng = np.random.default_rng(53)
    _make_detect_workdir(tmp_path, rng)
    expected_hits, expected_stdout = _expected_detect(tmp_path)

    _launch_scrub_workers(tmp_path, "detect_ckpt")
    import gzip as _gzip

    with _gzip.open(tmp_path / "hits_0.gz", "rb") as f:
        assert f.read() == expected_hits
    with open(tmp_path / "detect_stdout_0.txt") as f:
        assert f.read() == expected_stdout
    for r in (0, 1):
        with open(tmp_path / "dckpt" / f"rank{r}" / "detect_manifest.json") as f:
            assert len(json.load(f)["samples"]) > 0, f"rank{r} scored nothing"

    # full resume: payloads replay from the checkpoints
    os.remove(tmp_path / "hits_0.gz")
    _launch_scrub_workers(tmp_path, "detect_ckpt")
    with _gzip.open(tmp_path / "hits_0.gz", "rb") as f:
        assert f.read() == expected_hits


def test_fused_pipeline_two_real_processes(tmp_path):
    """The fused 4-stage pipeline in SPMD mode: ranks share the panel
    counting, rank 0 produces every artifact byte-identical to a
    single-process run; rank 1 produces none."""
    rng = np.random.default_rng(23)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=2500)].tobytes().decode()
    _write_fasta(tmp_path / "genome.fa", [genome])
    panels = []
    for j in range(4):
        reads = []
        for _ in range(30):
            if rng.random() < 0.5:
                start = int(rng.integers(0, len(genome) - 70))
                reads.append(genome[start : start + 70])
            else:
                reads.append(alpha[rng.integers(0, 4, size=70)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels) + "\n")
    with open(tmp_path / "targets.txt", "w") as f:
        # several samples so the SPMD detection phase actually partitions
        f.write(f"SE\t{panels[0]}\n")
        f.write(f"SE\t{panels[1]}\n")
        f.write(f"PE\t{panels[2]}\t{panels[3]}\n")

    from strainer2_tpu.pipeline.fused import FusedConfig, run_pipeline

    ref_paths = run_pipeline(
        str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
        str(tmp_path / "panels.txt"), str(tmp_path / "targets.txt"),
        str(tmp_path / "fused_ref"),
    )

    _launch_scrub_workers(tmp_path, "fused")
    import gzip as _gzip

    for key, ref_p in ref_paths.items():
        got_p = ref_p.replace("fused_ref", "fused_out_0")
        if ref_p.endswith(".gz"):
            with _gzip.open(ref_p, "rb") as a, _gzip.open(got_p, "rb") as b:
                assert a.read() == b.read(), key
        else:
            with open(ref_p, "rb") as a, open(got_p, "rb") as b:
                assert a.read() == b.read(), key
    # rank 1 wrote no artifacts beyond its (empty-ish) out dir
    import os as _os

    r1 = tmp_path / "fused_out_1"
    assert not any(_os.scandir(r1)) if r1.exists() else True


def test_fused_multi_pipeline_two_real_processes(tmp_path):
    """The fused MULTI-strain pipeline (`strainer2_tools pipeline-multi`)
    in SPMD mode: the shared panel scan and the multi-strain detection
    passes both partition across 2 real jax.distributed ranks, and rank 0
    produces every per-strain artifact byte-identical to a single-process
    run; rank 1 produces none."""
    rng = np.random.default_rng(61)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [
        alpha[rng.integers(0, 4, size=2500)].tobytes().decode() for _ in range(2)
    ]
    _write_fasta(tmp_path / "genome.fa", [genomes[0]])
    _write_fasta(tmp_path / "genome2.fa", [genomes[1]])
    panels = []
    for j in range(4):
        reads = []
        for _ in range(30):
            r = rng.random()
            if r < 0.6:  # reads from one of the strains -> guaranteed hits
                g = genomes[int(rng.integers(0, 2))]
                start = int(rng.integers(0, len(g) - 70))
                reads.append(g[start : start + 70])
            else:
                reads.append(alpha[rng.integers(0, 4, size=70)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels) + "\n")
    with open(tmp_path / "targets.txt", "w") as f:
        # several samples so the SPMD detection phase actually partitions
        f.write(f"SE\t{panels[0]}\n")
        f.write(f"SE\t{panels[1]}\n")
        f.write(f"PE\t{panels[2]}\t{panels[3]}\n")

    from strainer2_tpu.pipeline.fused import run_multi_pipeline

    ref_paths = run_multi_pipeline(
        [str(tmp_path / "genome.fa"), str(tmp_path / "genome2.fa")],
        str(tmp_path / "panels.txt"), str(tmp_path / "panels.txt"),
        str(tmp_path / "targets.txt"), str(tmp_path / "multi_ref"),
    )

    _launch_scrub_workers(tmp_path, "multi")
    import gzip as _gzip

    n_checked = 0
    for strain_paths in ref_paths:
        for key, ref_p in strain_paths.items():
            if ref_p is None:
                continue
            got_p = ref_p.replace("multi_ref", "multi_out_0")
            if ref_p.endswith(".gz"):
                with _gzip.open(ref_p, "rb") as a, _gzip.open(got_p, "rb") as b:
                    assert a.read() == b.read(), key
            else:
                with open(ref_p, "rb") as a, open(got_p, "rb") as b:
                    assert a.read() == b.read(), key
            n_checked += 1
    assert n_checked >= 6  # counts/scrubbed/hits/coverage x 2 strains
    import os as _os

    r1 = tmp_path / "multi_out_1"
    assert not any(_os.scandir(r1)) if r1.exists() else True


def test_run_scrub_count_four_processes_fewer_files_than_ranks(tmp_path):
    """4 real jax.distributed ranks, 2 panel files: ranks with EMPTY
    shares must still cross the real collective merge (their all-zero
    vectors participate) and rank 0's table must equal the
    single-process run byte-for-byte.  The reference analogue — the
    per-strain Snakemake fan-out — routinely has uneven work
    (/root/reference/test/Snakemake.strain_detect:23-24)."""
    import io

    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    rng = np.random.default_rng(17)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=2500)].tobytes().decode()
    _write_fasta(tmp_path / "genome.fa", [genome])
    panels = []
    for j in range(2):  # fewer files than the 4 ranks
        reads = []
        for _ in range(30):
            if rng.random() < 0.5:
                start = int(rng.integers(0, len(genome) - 70))
                reads.append(genome[start : start + 70])
            else:
                reads.append(alpha[rng.integers(0, 4, size=70)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels) + "\n")

    from strainer2_tpu.parallel.distributed import host_file_partition

    shares = [host_file_partition(panels, r, 4) for r in range(4)]
    assert sum(1 for s in shares if not s) >= 2, "expected empty shares"

    out = io.StringIO()
    run_scrub_count(
        str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
        str(tmp_path / "panels.txt"), out=out,
    )
    expected = out.getvalue()

    _launch_scrub_workers(tmp_path, "scrub", nproc=4)
    with open(tmp_path / "table_0.tsv") as f:
        assert f.read() == expected
    for r in (1, 2, 3):
        with open(tmp_path / f"table_{r}.tsv") as f:
            assert f.read() == ""


def test_run_detect_four_processes_fewer_samples_than_ranks(tmp_path):
    """4 real ranks, 2 scoreable samples: empty-share ranks cross the
    payload gather with empty blobs; rank 0's gzip payload + stdout are
    byte-identical to a single-process run."""
    rng = np.random.default_rng(71)
    _make_detect_workdir(tmp_path, rng, with_background=False)
    # shrink the batch to 2 samples (+ the malformed line)
    with open(tmp_path / "targets.txt") as f:
        lines = f.readlines()
    keep = [l for l in lines if l.startswith(("SE", "PE"))][:2]
    bad = [l for l in lines if l.startswith("XX")]
    with open(tmp_path / "targets.txt", "w") as f:
        f.writelines(keep + bad)
    expected_hits, expected_stdout = _expected_detect(
        tmp_path, with_background=False
    )

    _launch_scrub_workers(tmp_path, "detect", nproc=4)
    import gzip as _gzip

    with _gzip.open(tmp_path / "hits_0.gz", "rb") as f:
        assert f.read() == expected_hits
    with open(tmp_path / "detect_stdout_0.txt") as f:
        assert f.read() == expected_stdout
    for r in (1, 2, 3):
        assert not (tmp_path / f"hits_{r}.gz").exists()


def test_dead_rank_produces_timely_error(tmp_path):
    """A peer rank dying BEFORE a collective must turn into a prompt,
    actionable abort on the surviving rank (the watchdog in
    parallel/distributed.py), not an unbounded hang."""
    import time

    t0 = time.time()
    procs, outs = _launch_scrub_workers(
        tmp_path, "merge_dead", nproc=2,
        extra_env={"STRAINER2_COLLECTIVE_TIMEOUT": "8"},
        expect_rc=None,
    )
    elapsed = time.time() - t0
    # rank 1 is "dead" by design; its exit code is incidental (jax's
    # coordination client may kill it once the aborted coordinator is gone)
    assert procs[0].returncode != 0, "rank 0 must abort, not succeed"
    assert elapsed < 120, f"abort took {elapsed:.0f}s — not timely"
    assert not (tmp_path / "merged_dead_0.npy").exists()
    text = outs[0].decode(errors="replace")
    # either our watchdog fired, or jax's coordination service noticed the
    # disconnect first — both are timely, resumable errors
    assert (
        "did not complete within" in text
        or "coordination" in text.lower()
        or "heartbeat" in text.lower()
        or "disconnect" in text.lower()
    ), text


def test_env_var_cli_bringup_two_processes(tmp_path):
    """The documented user launch path: JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID env vars, one strain_detect CLI
    process per rank — payload AND stdout byte-identical to one process
    (the Gloo banner that the CPU collective backend prints to raw fd 1
    at the first collective must not leak into the output contract)."""
    import gzip as _gzip

    mini = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "golden", "mini"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    base_env = {
        k_: v
        for k_, v in os.environ.items()
        if k_ not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    base_env["PYTHONPATH"] = repo
    base_env["JAX_PLATFORMS"] = "cpu"

    cli = [sys.executable, "-m", "strainer2_tpu.cli.strain_detect",
           "-r", "data/strainA.fna.gz", "-a", "expected/scrubbed_m05.txt",
           "-B", "data/targets.txt"]

    ref = subprocess.run(
        cli + ["-o", str(tmp_path / "ref.gz")],
        cwd=mini, env=base_env, capture_output=True, timeout=180,
    )
    assert ref.returncode == 0, ref.stderr.decode(errors="replace")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            cli + ["-o", str(tmp_path / "spmd.gz")],
            cwd=mini, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    outs = [p.communicate(timeout=180) for p in procs]
    for p, (out, errs) in zip(procs, outs):
        assert p.returncode == 0, errs.decode(errors="replace")

    assert outs[0][0] == ref.stdout  # rank 0 stdout byte-exact, no banner
    assert outs[1][0] == b""  # rank 1 silent
    with _gzip.open(tmp_path / "ref.gz", "rb") as a, \
            _gzip.open(tmp_path / "spmd.gz", "rb") as b:
        assert a.read() == b.read()


def test_fused_multi_pipeline_two_processes_checkpointed_strain_threads(tmp_path):
    """pipeline-multi under SPMD (2 real jax.distributed ranks) WITH the
    union-scan checkpoint AND STRAINER2_STRAIN_THREADS>1: the per-rank
    scrub checkpoints and the per-pass detect checkpoints compose with the
    rank partitioning and the strain-thread pool, and rank 0's artifacts
    are byte-identical to a single-process serial run — both on the fresh
    checkpointed run and on a full resume."""
    rng = np.random.default_rng(97)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [
        alpha[rng.integers(0, 4, size=2500)].tobytes().decode() for _ in range(2)
    ]
    _write_fasta(tmp_path / "genome.fa", [genomes[0]])
    _write_fasta(tmp_path / "genome2.fa", [genomes[1]])
    panels = []
    for j in range(4):
        reads = []
        for _ in range(30):
            r = rng.random()
            if r < 0.6:
                g = genomes[int(rng.integers(0, 2))]
                start = int(rng.integers(0, len(g) - 70))
                reads.append(g[start : start + 70])
            else:
                reads.append(alpha[rng.integers(0, 4, size=70)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        _write_fasta(p, reads)
        panels.append(str(p))
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels) + "\n")
    with open(tmp_path / "targets.txt", "w") as f:
        f.write(f"SE\t{panels[0]}\n")
        f.write(f"SE\t{panels[1]}\n")
        f.write(f"PE\t{panels[2]}\t{panels[3]}\n")

    # serial single-process expectation (STRAINER2_STRAIN_THREADS=1)
    import subprocess as _sp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from strainer2_tpu.pipeline.fused import run_multi_pipeline;"
        f"run_multi_pipeline([r'{tmp_path}/genome.fa', r'{tmp_path}/genome2.fa'],"
        f" r'{tmp_path}/panels.txt', r'{tmp_path}/panels.txt',"
        f" r'{tmp_path}/targets.txt', r'{tmp_path}/multi_ref')"
    )
    env_serial = {
        k_: v for k_, v in os.environ.items()
        if k_ not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    env_serial["PYTHONPATH"] = repo
    env_serial["JAX_PLATFORMS"] = "cpu"
    env_serial["STRAINER2_STRAIN_THREADS"] = "1"
    r = _sp.run([sys.executable, "-c", code], env=env_serial,
                capture_output=True, timeout=240)
    assert r.returncode == 0, r.stderr.decode(errors="replace")

    # fresh checkpointed SPMD run with strain threads
    _launch_scrub_workers(tmp_path, "multi_ckpt",
                          extra_env={"STRAINER2_STRAIN_THREADS": "2"})
    import gzip as _gzip

    def compare():
        n = 0
        for stem in ("genome", "genome2"):
            for suffix in (".scrub_kmer_counts.gz", ".scrubbed_kmers.gz",
                           ".kmer_hits.gz", ".coverage_depth"):
                ref_p = tmp_path / "multi_ref" / (stem + suffix)
                got_p = tmp_path / "multi_out_0" / (stem + suffix)
                if str(ref_p).endswith(".gz"):
                    with _gzip.open(ref_p, "rb") as a, _gzip.open(got_p, "rb") as b:
                        assert a.read() == b.read(), (stem, suffix)
                else:
                    with open(ref_p, "rb") as a, open(got_p, "rb") as b:
                        assert a.read() == b.read(), (stem, suffix)
                n += 1
        assert n == 8
    compare()
    assert (tmp_path / "mckpt" / "scrub" / "rank0").is_dir()
    assert (tmp_path / "mckpt" / "scrub" / "rank1").is_dir()

    # full resume: counts restore from per-rank checkpoints, detect
    # payloads replay; artifacts identical again
    import shutil

    shutil.rmtree(tmp_path / "multi_out_0")
    _launch_scrub_workers(tmp_path, "multi_ckpt",
                          extra_env={"STRAINER2_STRAIN_THREADS": "2"})
    compare()
