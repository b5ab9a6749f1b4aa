import gzip

import numpy as np
import pytest

from strainer2_tpu.io import max_reads_capacity, pack_stream, read_fastx
from strainer2_tpu.ops.packing import encode_ascii_np
from strainer2_tpu.pipeline import KmerEngine
from tests.oracle import canonical_codes_of_seq, random_dna

K = 31


def _write(path, text, gz=False):
    data = text.encode()
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return str(path)


@pytest.mark.parametrize("gz", [False, True])
def test_read_fasta_multiline(tmp_path, gz):
    p = _write(
        tmp_path / ("a.fa.gz" if gz else "a.fa"),
        ">contig1 extra comment\nACGT\nACG\n>contig2\nTTTT\n",
        gz,
    )
    recs = list(read_fastx(p))
    assert [(r.name, r.seq) for r in recs] == [
        (b"contig1", b"ACGTACG"),
        (b"contig2", b"TTTT"),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_read_fastq(tmp_path, gz):
    p = _write(
        tmp_path / ("a.fq.gz" if gz else "a.fq"),
        "@r1 comment\nACGTN\n+\nIIIII\n@r2\nGGCC\n+r2\nIIII\n",
        gz,
    )
    recs = list(read_fastx(p))
    assert [(r.name, r.seq) for r in recs] == [(b"r1", b"ACGTN"), (b"r2", b"GGCC")]


def _all_window_codes(seqs, k):
    """Oracle: multiset of valid canonical codes over all reads."""
    out = []
    for s in seqs:
        out.extend(c for v, c in canonical_codes_of_seq(s, k) if v)
    return sorted(out)


def test_pack_stream_preserves_all_windows_exactly_once():
    rng = np.random.default_rng(11)
    # mix of short reads, sub-k reads, and a long contig spanning rows
    seqs = (
        [random_dna(rng, rng.integers(20, 200), n_prob=0.02) for _ in range(50)]
        + [random_dna(rng, 3000)]
    )
    engine = KmerEngine(K)
    got = []
    for batch in pack_stream([s.encode() for s in seqs], K, rows=4, row_len=512):
        got.extend(engine.extract_codes(batch.bases).tolist())
    assert sorted(got) == _all_window_codes(seqs, K)


def test_pack_stream_long_contig_across_buffers():
    rng = np.random.default_rng(12)
    seq = random_dna(rng, 5000)
    engine = KmerEngine(K)
    got = []
    batches = list(pack_stream([seq.encode()], K, rows=2, row_len=512))
    assert len(batches) > 1  # must have split across buffers
    for batch in batches:
        got.extend(engine.extract_codes(batch.bases).tolist())
    assert sorted(got) == _all_window_codes([seq], K)


def test_pack_stream_read_ids_segments():
    rng = np.random.default_rng(13)
    seqs = [random_dna(rng, rng.integers(31, 100)) for _ in range(20)]
    cap = max_reads_capacity(K, rows=2, row_len=256)
    for batch in pack_stream(
        [s.encode() for s in seqs], K, rows=2, row_len=256, with_read_ids=True
    ):
        assert batch.read_id is not None
        assert batch.n_reads <= cap
        # every non-separator position carries the id of exactly one read,
        # and the number of positions with id r == length of read r
        ids = batch.read_id
        for r in range(batch.n_reads):
            n_pos = int((ids == r).sum())
            # split rows re-emit k-1 halo bases; reads here are < row_len so
            # a read occupies exactly its length (+ halo if split once)
            ln = int(batch.read_lengths[r])
            assert n_pos in (ln, ln + K - 1)


def test_pe_grouping_stays_in_batch():
    rng = np.random.default_rng(14)
    seqs = [random_dna(rng, 80) for _ in range(40)]
    for batch in pack_stream(
        [s.encode() for s in seqs],
        K,
        rows=1,
        row_len=512,
        with_read_ids=True,
        group_size=2,
    ):
        assert batch.n_reads % 2 == 0  # mates never split across batches


def test_encode_np_roundtrip():
    raw = np.frombuffer(b"acgtACGTnN?", dtype=np.uint8)
    np.testing.assert_array_equal(
        encode_ascii_np(raw), [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4]
    )


def test_prefetch_preserves_order_and_errors():
    from strainer2_tpu.utils.prefetch import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("x")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)
