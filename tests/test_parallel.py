"""Sharded (data x index) execution must be bit-identical to single-chip.

Runs on the virtual 8-device CPU mesh configured in conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strainer2_tpu.index import StrainIndex
from strainer2_tpu.io import max_reads_capacity, pack_stream
from strainer2_tpu.parallel.sharding import ShardedKmerEngine, make_mesh
from strainer2_tpu.pipeline import KmerEngine
from tests.oracle import random_dna, seq_to_base_codes

K = 31
ROWS, ROW_LEN = 8, 512


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(42)
    genome = random_dna(rng, 4000)
    engine = KmerEngine(K, max_reads=max_reads_capacity(K, ROWS, ROW_LEN), layout="cuckoo")
    scan = []
    for batch in pack_stream([genome.encode()], K, rows=ROWS, row_len=ROW_LEN):
        scan.append(engine.extract_codes(batch.bases))
    index = StrainIndex.from_scan_codes(np.concatenate(scan), k=K, layout="cuckoo")
    reads = [random_dna(rng, rng.integers(40, 150), n_prob=0.02) for _ in range(100)]
    # make half the reads overlap the genome so there are real hits
    for i in range(0, 100, 2):
        start = int(rng.integers(0, 3800))
        reads[i] = genome[start : start + 100]
    batches = list(
        pack_stream(
            [r.encode() for r in reads], K, rows=ROWS, row_len=ROW_LEN, with_read_ids=True
        )
    )
    return engine, index, batches


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_counting_matches_single_chip(setup, mesh_shape):
    engine, index, batches = setup
    t = index.table

    # single-chip reference counts
    counts1 = jnp.zeros(t.num_slots, dtype=jnp.uint32)
    for b in batches:
        counts1 = engine.count_batch(counts1, index.device_table(), t.h_bits, t.salt, b.bases)
    expect = index.key_values(np.asarray(counts1))

    mesh = make_mesh(*mesh_shape)
    sharded = ShardedKmerEngine(K, mesh, t.h_bits, t.salt, t.num_slots)
    counts = sharded.init_counts()
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("index"))
    import numpy as _np
    table = (
        jax.device_put(jnp.asarray(_np.ascontiguousarray(t.table[:, 0])), spec),
        jax.device_put(jnp.asarray(_np.ascontiguousarray(t.table[:, 1])), spec),
    )
    for b in batches:
        counts = sharded.count_batch(counts, table, b.bases)
    got = index.key_values(sharded.merge_counts(counts))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_classify_matches_single_chip(setup, mesh_shape):
    engine, index, batches = setup
    t = index.table
    kmer_type = np.full(index.num_kmers, 1, np.uint32)
    kmer_type[::3] = 2  # mark a third informative
    meta = index.slot_values(kmer_type)
    meta_dev = jnp.asarray(meta)
    max_reads = engine.max_reads

    mesh = make_mesh(*mesh_shape)
    sharded = ShardedKmerEngine(
        K, mesh, t.h_bits, t.salt, t.num_slots, max_reads=max_reads
    )
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("index"))
    import numpy as _np
    table = (
        jax.device_put(jnp.asarray(_np.ascontiguousarray(t.table[:, 0])), spec),
        jax.device_put(jnp.asarray(_np.ascontiguousarray(t.table[:, 1])), spec),
    )
    meta_sh = jax.device_put(
        meta_dev, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("index"))
    )

    n_windows = ROWS * (ROW_LEN - K + 1)
    for b in batches:
        boundaries = np.full(max_reads + 1, n_windows, dtype=np.int32)
        boundaries[: b.n_reads] = b.window_starts
        tot1, inf1 = engine.classify_batch(
            index.device_table(), meta_dev, t.h_bits, t.salt, b.bases, boundaries
        )
        tot_s, inf_s = sharded.classify_batch(table, meta_sh, b.bases, b.read_id)
        np.testing.assert_array_equal(
            np.asarray(tot_s).sum(axis=0)[:max_reads], np.asarray(tot1)
        )
        np.testing.assert_array_equal(
            np.asarray(inf_s).sum(axis=0)[:max_reads], np.asarray(inf1)
        )


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_bucket_layout_matches_single_chip(setup, mesh_shape):
    from strainer2_tpu.index.bucket import build_bucket_table

    engine_c, index, batches = setup
    codes = index.codes
    tb = build_bucket_table(codes, K)
    engine_b = KmerEngine(K, max_reads=engine_c.max_reads, layout="bucket")

    # single-chip bucket counting reference
    rows_dev = jnp.asarray(tb.table)
    counts1 = jnp.zeros(tb.num_slots, dtype=jnp.uint32)
    for b in batches:
        counts1 = engine_b.count_batch(counts1, rows_dev, tb.h_bits, tb.salt, b.bases)
    expect = np.asarray(counts1)[tb.slot_of_key]

    mesh = make_mesh(*mesh_shape)
    sharded = ShardedKmerEngine(
        K, mesh, tb.h_bits, tb.salt, tb.num_slots, max_reads=engine_b.max_reads,
        layout="bucket",
    )
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("index", None)
    )
    rows_sh = jax.device_put(jnp.asarray(tb.table), spec)
    counts = sharded.init_counts()
    for b in batches:
        counts = sharded.count_batch(counts, rows_sh, b.bases)
    got = sharded.merge_counts(counts)[tb.slot_of_key]
    np.testing.assert_array_equal(got, expect)

    # classify: meta lanes baked into rows
    kmer_type = np.full(codes.size, 1, np.uint32)
    kmer_type[::3] = 2
    meta_slots = np.zeros(tb.num_slots, np.uint32)
    meta_slots[tb.slot_of_key] = kmer_type
    rows_meta = tb.with_meta(meta_slots)
    rows_meta_dev = jnp.asarray(rows_meta)
    rows_meta_sh = jax.device_put(jnp.asarray(rows_meta), spec)
    n_windows = ROWS * (ROW_LEN - K + 1)
    for b in batches:
        boundaries = np.full(engine_b.max_reads + 1, n_windows, dtype=np.int32)
        boundaries[: b.n_reads] = b.window_starts
        tot1, inf1 = engine_b.classify_batch(
            rows_meta_dev, None, tb.h_bits, tb.salt, b.bases, boundaries
        )
        tot_s, inf_s = sharded.classify_batch(
            rows_meta_sh, None, b.bases, jnp.asarray(boundaries)
        )
        np.testing.assert_array_equal(np.asarray(tot_s).sum(axis=0), np.asarray(tot1))
        np.testing.assert_array_equal(np.asarray(inf_s).sum(axis=0), np.asarray(inf1))


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_sharded_multi_strain_classify_matches_single_chip(setup, mesh_shape):
    """EP axis over the (data, index) mesh: the union table's packed
    2-bit-per-strain meta decodes to the same per-read (reads, strains)
    matrices as the single-device multi-strain classifier."""
    from functools import partial

    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.pipeline.multi_detect import _classify_multi

    engine_c, index, batches = setup
    n_strains = 5
    rng = np.random.default_rng(7)
    codes = index.codes
    tb = build_bucket_table(codes, K)
    max_reads = engine_c.max_reads

    # random per-strain membership/informative bits over the union keys
    meta = np.zeros(codes.size, dtype=np.uint32)
    for s in range(n_strains):
        present = rng.random(codes.size) < 0.6
        informative = present & (rng.random(codes.size) < 0.4)
        meta |= present.astype(np.uint32) << np.uint32(2 * s)
        meta |= informative.astype(np.uint32) << np.uint32(2 * s + 1)
    meta_slots = np.zeros(tb.num_slots, np.uint32)
    meta_slots[tb.slot_of_key] = meta
    rows_meta = tb.with_meta(meta_slots)
    rows_dev = jnp.asarray(rows_meta)

    classify1 = jax.jit(
        partial(_classify_multi, k=K, max_reads=max_reads, n_strains=n_strains),
        static_argnames=("h_bits", "salt"),
    )

    mesh = make_mesh(*mesh_shape)
    sharded = ShardedKmerEngine(
        K, mesh, tb.h_bits, tb.salt, tb.num_slots, max_reads=max_reads,
        layout="bucket",
    )
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("index", None))
    rows_sh = jax.device_put(jnp.asarray(rows_meta), spec)

    n_windows = ROWS * (ROW_LEN - K + 1)
    for b in batches:
        boundaries = np.full(max_reads + 1, n_windows, dtype=np.int32)
        boundaries[: b.n_reads] = b.window_starts
        tot1, inf1 = classify1(
            rows_dev, b.bases, boundaries, h_bits=tb.h_bits, salt=tb.salt
        )
        tot_s, inf_s = sharded.classify_multi_batch(
            rows_sh, b.bases, boundaries, n_strains
        )
        np.testing.assert_array_equal(np.asarray(tot_s).sum(axis=0), np.asarray(tot1))
        np.testing.assert_array_equal(np.asarray(inf_s).sum(axis=0), np.asarray(inf1))
    assert int(np.asarray(tot1).sum()) > 0


def test_device_parallel_panel_feed_matches_sequential(tmp_path, monkeypatch):
    """The multi-file device feeder (scrub_count._count_files_device_parallel:
    pack threads -> one locked device accumulator) must reproduce the
    sequential device loop byte-for-byte — integer scatter-adds are
    order-independent, so any batch interleave yields identical counts."""
    import io

    import numpy as np

    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    rng = np.random.default_rng(99)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=3000)].tobytes().decode()
    with open(tmp_path / "genome.fa", "w") as f:
        f.write(">g\n" + genome + "\n")
    panels = []
    for j in range(5):
        reads = []
        for _ in range(40):
            if rng.random() < 0.5:
                start = int(rng.integers(0, len(genome) - 80))
                reads.append(genome[start : start + 80])
            else:
                reads.append(alpha[rng.integers(0, 4, size=80)].tobytes().decode())
        p = tmp_path / f"panel_{j}.fa"
        with open(p, "w") as f:
            for i, s in enumerate(reads):
                f.write(f">r{i}\n{s}\n")
        panels.append(str(p))
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(panels) + "\n")

    monkeypatch.setenv("STRAINER2_NATIVE_COUNT", "0")  # force the jit engine
    monkeypatch.setenv("STRAINER2_COUNT_THREADS", "1")
    seq = io.StringIO()
    run_scrub_count(str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
                    str(tmp_path / "panels.txt"), out=seq)

    monkeypatch.setenv("STRAINER2_COUNT_THREADS", "3")
    par = io.StringIO()
    run_scrub_count(str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
                    str(tmp_path / "panels.txt"), out=par)
    assert par.getvalue() == seq.getvalue()
    assert seq.getvalue().count("\n") > 10


def test_device_parallel_feed_unreadable_file_contract(tmp_path, monkeypatch, capsys):
    """The multi-file device feeder must keep the reference's unreadable
    -panel-file error contract (exit 1 + the exact stderr line) even when
    the failure happens on a worker thread."""
    import io

    import numpy as np
    import pytest

    from strainer2_tpu.pipeline.scrub_count import run_scrub_count

    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = alpha[rng.integers(0, 4, size=2000)].tobytes().decode()
    with open(tmp_path / "genome.fa", "w") as f:
        f.write(">g\n" + genome + "\n")
    good = []
    for j in range(3):
        p = tmp_path / f"panel_{j}.fa"
        with open(p, "w") as f:
            f.write(">r\n" + genome[:200] + "\n")
        good.append(str(p))
    missing = str(tmp_path / "nope.fa")
    with open(tmp_path / "panels.txt", "w") as f:
        f.write("\n".join(good + [missing]) + "\n")

    monkeypatch.setenv("STRAINER2_NATIVE_COUNT", "0")
    monkeypatch.setenv("STRAINER2_COUNT_THREADS", "3")
    with pytest.raises(SystemExit) as ex:
        run_scrub_count(str(tmp_path / "genome.fa"), str(tmp_path / "panels.txt"),
                        str(tmp_path / "panels.txt"), out=io.StringIO())
    assert ex.value.code == 1
    err = capsys.readouterr().err
    assert f"could not read file {missing} in GEN_calculate_kmer_count()" in err
