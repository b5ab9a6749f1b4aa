#!/usr/bin/env python3
"""ThreadSanitizer stress for the threaded native host plane.

Run via tools/tsan_stress.sh (builds the TSan library, sets
STRAINER2_NATIVE_LIB + LD_PRELOAD=libtsan).  Exercises every concurrent
shape the production pipelines use — deliberately jax-free so TSan sees
only the host plane:

1. the multi-thread bucket-table build (s2_build_bucket splits the
   bucket range across up to 8 threads; strainer2_host.cc),
2. the scrub table-writer overlap: main thread formats rows natively
   (GIL released) while a writer thread drains blobs to disk
   (pipeline/scrub_count.py:301),
3. the prefetch-thread stream: a worker thread runs the native
   reader/packer while the consumer thread handles batches
   (utils/prefetch.py wrapping NativePackStream),
4. concurrent independent native panel counts from two threads (the
   multi-strain pipelines' shared-scan shape),
5. concurrent per-sample classify streams + read extractors over one
   shared classify table (sample-parallel detection,
   pipeline/detect.py::_run_sample_pool),
6. concurrent independent index builds — scan + unique-encounter + bucket
   build per thread (the strain-parallel index stage,
   pipeline/multi_scrub.py::multi_scrub_counts over a thread pool),
7. concurrent native scrub-row formatting from several threads (the
   fused multi pipeline's per-strain counts writers + pooled filters,
   pipeline/fused.py::run_multi_pipeline).
"""

import os
import queue
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from strainer2_tpu.native import (
    NativePackStream,
    available,
    build_bucket_native,
    format_scrub_rows,
    scan_file_codes_native,
)
from strainer2_tpu.utils.prefetch import prefetch

K = 31


def stress_bucket_build(rng) -> None:
    for rep in range(3):
        codes = np.unique(rng.integers(0, 1 << 62, size=300_000, dtype=np.uint64))
        h_bits = max(4, int(np.ceil(np.log2(codes.size / 3.3))))
        out = build_bucket_native(codes, K, h_bits, 0)
        assert out is not None and out != "retry"
        table, slots = out
        assert slots.shape[0] == codes.size
    print("bucket build (multi-thread): ok")


def stress_writer_overlap(rng, tmp) -> None:
    codes = np.unique(rng.integers(0, 1 << 62, size=200_000, dtype=np.uint64))
    c = rng.integers(0, 100, size=(3, codes.size)).astype(np.uint32)
    wq: queue.Queue = queue.Queue(maxsize=4)
    sink = open(os.path.join(tmp, "sink.tsv"), "wb")

    def drain():
        while True:
            blob = wq.get()
            if blob is None:
                return
            sink.write(blob)

    writer = threading.Thread(target=drain)
    writer.start()
    chunk = 16384
    for start in range(0, codes.size, chunk):
        end = min(start + chunk, codes.size)
        blob = format_scrub_rows(
            codes[start:end], c[0, start:end], c[1, start:end], c[2, start:end],
            None, K,
        )
        assert blob is not None
        wq.put(blob)
    wq.put(None)
    writer.join()
    sink.close()
    print("writer-thread overlap: ok")


def make_fasta(path: str, rng, n_reads: int, read_len: int) -> None:
    with open(path, "wb") as f:
        base = np.frombuffer(b"ACGT", dtype=np.uint8)
        for i in range(n_reads):
            f.write(b">r%d\n" % i)
            f.write(bytes(base[rng.integers(0, 4, size=read_len)]))
            f.write(b"\n")


def stress_prefetch_stream(rng, tmp) -> None:
    path = os.path.join(tmp, "reads.fa")
    make_fasta(path, rng, 5000, 150)
    for rep in range(3):
        total = 0
        stream = NativePackStream([path], K, rows=64, row_len=2048,
                                  with_read_ids=True)
        for batch in prefetch(iter(stream), depth=2):
            total += batch.n_reads
        assert total == 5000, total
    print("prefetch-thread stream: ok")


def stress_concurrent_counts(rng, tmp) -> None:
    import ctypes

    from strainer2_tpu.native import _load

    lib = _load()
    path = os.path.join(tmp, "panel.fa")
    make_fasta(path, rng, 2000, 300)
    scan = scan_file_codes_native(path, K)
    codes, first = np.unique(scan, return_index=True)
    slots = np.arange(codes.size, dtype=np.int32)
    th = lib.s2_count_build(codes.ctypes.data, slots.ctypes.data, codes.size)
    results = []

    def count():
        counts = np.zeros(codes.size, dtype=np.uint32)
        n = lib.s2_count_file(th, path.encode(), K, counts.ctypes.data)
        results.append((n, counts))

    ts = [threading.Thread(target=count) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    lib.s2_count_free(ctypes.c_void_p(th))
    assert len(results) == 2
    assert results[0][0] == results[1][0] > 0
    np.testing.assert_array_equal(results[0][1], results[1][1])
    print("concurrent panel counts: ok")


def stress_concurrent_classify(rng, tmp) -> None:
    from strainer2_tpu.native import NativeClassifier, NativeReadExtractor

    path = os.path.join(tmp, "sample.fa")
    make_fasta(path, rng, 3000, 200)
    scan = scan_file_codes_native(path, K)
    codes = np.unique(scan)
    kmer_type = np.where(np.arange(codes.size) % 7 == 0, 2, 1).astype(np.int32)
    nc = NativeClassifier(codes, kmer_type, K)
    results = []

    def sample_pass():
        tot_sum = inf_sum = reads = 0
        ex = NativeReadExtractor(path)
        stream = nc.open_stream(path, None, 0)
        for lens, tot, inf in stream:
            tot_sum += int(tot.sum())
            inf_sum += int(inf.sum())
            reads += lens.size
        ex.read(0, 200)
        ex.close()
        stream.close()
        results.append((reads, tot_sum, inf_sum))

    ts = [threading.Thread(target=sample_pass) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 3 and len(set(results)) == 1 and results[0][0] == 3000
    print("concurrent classify streams: ok")


def stress_concurrent_index_builds(rng, tmp) -> None:
    """Shape 6: N threads each scan a genome file, unique it, and build a
    bucket table concurrently (pipeline/multi_scrub.py's pooled
    StrainIndex.from_fasta)."""
    paths = []
    for j in range(3):
        p = os.path.join(tmp, f"g{j}.fa")
        make_fasta(p, rng, n_reads=40, read_len=400)
        paths.append(p)

    results = []
    lock = threading.Lock()

    def build(p):
        for _ in range(2):
            scan = scan_file_codes_native(p, K)
            codes = np.unique(scan)
            h_bits = max(4, int(np.ceil(np.log2(max(codes.size, 2) / 3.3))))
            out = build_bucket_native(codes, K, h_bits, 0)
            assert out is not None and out != "retry"
            with lock:
                results.append((p, codes.size))

    ts = [threading.Thread(target=build, args=(p,)) for p in paths]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 6
    print("concurrent index builds: ok")


def stress_concurrent_row_formatting(rng) -> None:
    """Shape 7: several threads format scrub rows natively at once (the
    fused multi pipeline runs one counts-writer thread per strain)."""
    blobs = []
    lock = threading.Lock()

    def fmt(seed):
        r = np.random.default_rng(seed)
        codes = np.unique(r.integers(0, 1 << 62, size=50_000, dtype=np.uint64))
        c = r.integers(0, 100, size=(4, codes.size)).astype(np.uint32)
        for _ in range(2):
            out = format_scrub_rows(codes, c[0], c[1], c[2], None, K)
            assert out is not None and out.count(b"\n") == codes.size
            with lock:
                blobs.append(len(out))

    ts = [threading.Thread(target=fmt, args=(100 + j,)) for j in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(blobs) == 8
    print("concurrent row formatting: ok")


def main() -> None:
    assert available(), "native library unavailable (check STRAINER2_NATIVE_LIB)"
    rng = np.random.default_rng(13)
    with tempfile.TemporaryDirectory() as tmp:
        stress_bucket_build(rng)
        stress_writer_overlap(rng, tmp)
        stress_prefetch_stream(rng, tmp)
        stress_concurrent_counts(rng, tmp)
        stress_concurrent_classify(rng, tmp)
        stress_concurrent_index_builds(rng, tmp)
        stress_concurrent_row_formatting(rng)
    print("ALL STRESSES PASSED")


if __name__ == "__main__":
    main()
