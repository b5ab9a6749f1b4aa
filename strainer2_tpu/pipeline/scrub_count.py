"""kmer_scrub_count stage: count strain k-mers across background panels.

Pipeline equivalent of the reference binary (reference
src/kmer_scrub_count.c:29-124):

1. build the strain index from -r (all canonical k-mers + genome counts),
2. stream every file of the -A genome panel, the -B metagenome panel, and
   optionally the -C co-occurring-strain panel (skipping the reference
   genome itself), counting occurrences of *indexed* k-mers only
   (lookup-only, no inserts — reference src/genome_compare.c:179-236),
3. emit the 4-column count table in the reference's row order.

The hot loop is one jitted device program per batch: canonicalize ->
cuckoo lookup -> deterministic scatter-add into a slot-indexed count
buffer resident in HBM.  Counts are integers, so accumulation order —
across batches, files, or device shards — cannot change the result.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import IO

import numpy as np

from strainer2_tpu.constants import (
    COL_DRUG,
    COL_METAGENOME,
    COL_PANGENOME,
    DEFAULT_K,
)
from strainer2_tpu.index.build import StrainIndex
from strainer2_tpu.index.refhash_order import reference_row_order
from strainer2_tpu.io.batches import DEFAULT_ROW_LEN, DEFAULT_ROWS, pack_stream
from strainer2_tpu.io.fastx import read_fastx
from strainer2_tpu.pipeline.engine import KmerEngine

__all__ = ["ScrubCountConfig", "run_scrub_count", "count_panel_file", "read_list_file"]


@dataclass
class ScrubCountConfig:
    k: int = DEFAULT_K
    rows: int = DEFAULT_ROWS
    row_len: int = DEFAULT_ROW_LEN
    # replicate the reference's printed row order (djb2 replay). When False,
    # rows are emitted in first-encounter order (a canonical order of ours;
    # count values identical, order not).
    reference_order: bool = True
    # (data, index) device-mesh shape for sharded panel counting; None =
    # single-device engine. Results are bit-identical either way.
    mesh: tuple[int, int] | None = None


def read_list_file(path: str) -> list[str]:
    """File-of-filenames, one path per line (reference getline loops)."""
    out = []
    with open(path) as f:
        for line in f:
            out.append(line.rstrip("\n"))
    return out


def _progress_line(progress: IO | None, path: str) -> None:
    """Reference format: `<path>\\t<asctime>` incl. trailing newline
    (reference src/genome_compare.c:133-136)."""
    if progress is not None:
        progress.write(f"{path}\t{time.asctime(time.localtime())}\n")
        progress.flush()


def _use_native_counting(engine) -> bool:
    """CPU fast path: the fused native scan+count loop beats the XLA CPU
    gather/scatter engine (docs/PERFORMANCE.md).  Device backends and the
    sharded engine keep the jit path.  STRAINER2_NATIVE_COUNT=0 disables."""
    import os

    if os.environ.get("STRAINER2_NATIVE_COUNT", "1") == "0":
        return False
    if type(engine) is not KmerEngine:
        return False
    from strainer2_tpu import native

    if not native.available():
        return False
    import jax

    return jax.default_backend() == "cpu"


def count_panel_file(
    engine: KmerEngine,
    index: StrainIndex,
    counts,  # device (num_slots,) uint32
    path: str,
    rows: int,
    row_len: int,
):
    """Stream one panel file through the counting kernel."""
    from strainer2_tpu import native
    from strainer2_tpu.utils.observability import stage

    if _use_native_counting(engine):
        # index-like views (e.g. multi-detect's union view) may not carry one
        nc_fn = getattr(index, "native_counter", None)
        nc = nc_fn() if nc_fn is not None else None
        if nc is not None:
            from strainer2_tpu.utils import observability as _obs

            counts_np = engine.finalize_counts(counts)
            if not (counts_np.flags.c_contiguous and counts_np.flags.writeable):
                counts_np = np.ascontiguousarray(counts_np)
            with stage("scrub.panel_lookups"):
                n = nc.count_file(counts_np, path)
            _obs._items["scrub.panel_lookups"] += n
            return counts_np

    table = engine.table_for(index)
    t = index.table
    if native.available():
        stream = native.NativePackStream([path], engine.k, rows, row_len)
    else:
        seqs = (rec.seq for rec in read_fastx(path))
        stream = pack_stream(seqs, engine.k, rows=rows, row_len=row_len)
    from strainer2_tpu.utils.prefetch import prefetch

    windows_per_batch = rows * (row_len - engine.k + 1)
    n = 0
    with stage("scrub.panel_lookups"):
        for batch in prefetch(stream):
            counts = engine.count_batch(counts, table, t.h_bits, t.salt, batch.bases)
            n += windows_per_batch
    from strainer2_tpu.utils import observability as _obs

    _obs._items["scrub.panel_lookups"] += n
    return counts


def _exit_could_not_read(msg: str) -> None:
    """Reference-exact unreadable-file diagnostic + exit 1 (the reference
    exits from inside its library functions; e.g. src/genome_compare.c:196)."""
    print(msg, file=sys.stderr)
    raise SystemExit(1)


def _count_panel(
    engine: KmerEngine,
    index: StrainIndex,
    list_path: str | None,
    cfg: ScrubCountConfig,
    progress: IO | None,
    skip_path: str | None = None,
    column: int = 0,
    checkpoint=None,
    partition: "tuple[int, int] | None" = None,
) -> np.ndarray:
    """Count all files of one panel list into a fresh column; returns
    per-key counts (first-encounter order).  With a checkpoint, completed
    files are skipped on resume and counts persist per finished file.
    partition=(process_index, process_count) restricts counting to this
    host's deterministic size-balanced share of the list (multi-host SPMD;
    the caller merges columns with merge_across_hosts)."""
    import jax.numpy as jnp

    from collections import Counter

    done: Counter = Counter()
    counts_np = checkpoint.counts(column) if checkpoint else None
    if counts_np is not None:
        done = Counter(checkpoint.done_files(column))
        counts = engine.counts_from_numpy(index, counts_np)
    else:
        counts = engine.init_counts(index)
    if list_path is not None:
        try:
            listed = read_list_file(list_path)
        except OSError:
            # reference src/genome_compare.c:125,159
            _exit_could_not_read(
                f"could not read file {list_path} in GEN_all_kmer_counts()"
            )
        multihost = partition is not None and partition[1] > 1
        eligible: list[str] = []
        for path in listed:
            if not multihost:
                _progress_line(progress, path)
            if skip_path is not None and path == skip_path:
                print(f"skipping {path} (identical match)", file=sys.stderr)
                continue
            eligible.append(path)
        if multihost:
            from strainer2_tpu.parallel.distributed import host_file_partition

            # partition the FULL eligible list (identical on every rank,
            # resumed or not) — done-file skipping applies to this rank's
            # share afterwards, so resume cannot shift the assignment
            eligible = host_file_partition(eligible, *partition)
            for path in eligible:  # this host's progress covers its share
                _progress_line(progress, path)
        todo: list[str] = []
        for path in eligible:
            if done[path] > 0:  # completed in a previous run (multiset:
                done[path] -= 1  # duplicate list entries re-count)
                continue
            todo.append(path)
        nc = None
        if checkpoint is None and len(todo) > 1 and _use_native_counting(engine):
            nc_fn = getattr(index, "native_counter", None)
            nc = nc_fn() if nc_fn is not None else None
        n_threads = _count_threads(len(todo)) if nc is not None else 1
        if n_threads > 1:
            counts_np = engine.finalize_counts(counts)
            if not (counts_np.flags.c_contiguous and counts_np.flags.writeable):
                counts_np = counts_np.copy()
            try:
                counts = _count_files_parallel(nc, counts_np, todo, n_threads)
            except OSError as e:
                _exit_could_not_read(
                    f"could not read file {getattr(e, 'filename', None) or e} "
                    "in GEN_calculate_kmer_count()"
                )
        elif (
            checkpoint is None
            and len(todo) > 1
            and _count_threads(len(todo)) > 1
        ):
            # device-engine path (TPU, or STRAINER2_NATIVE_COUNT=0): the
            # binding stage of the device-fed pipeline is host decode+pack
            # (docs/PERFORMANCE.md "Sustained device-fed"), so several
            # files pack on worker threads feeding ONE device accumulator
            try:
                counts = _count_files_device_parallel(
                    engine, index, counts, todo, _count_threads(len(todo)), cfg
                )
            except OSError as e:
                _exit_could_not_read(
                    f"could not read file {getattr(e, 'filename', None) or e} "
                    "in GEN_calculate_kmer_count()"
                )
        else:
            for path in todo:
                try:
                    counts = count_panel_file(
                        engine, index, counts, path, cfg.rows, cfg.row_len
                    )
                except OSError:
                    # reference src/genome_compare.c:196
                    _exit_could_not_read(
                        f"could not read file {path} in GEN_calculate_kmer_count()"
                    )
                if checkpoint is not None:
                    checkpoint.record(column, path, engine.finalize_counts(counts))
    return index.key_values(engine.finalize_counts(counts))


def _count_files_device_parallel(engine, index, counts, todo, n_threads, cfg):
    """Multi-file feeder for the DEVICE counting engine: worker threads
    each decode+pack their own files (the measured binding stage of the
    device-fed pipeline) while batch dispatches serialize through one
    shared device accumulator under a lock — the device dependency chain
    orders the scatter-adds, and integer adds are order-independent, so
    counts are bit-identical to the sequential loop regardless of the
    interleave (pinned by tests/test_parallel.py).  Used only on the
    non-checkpointed path: file-granular resume needs sequential,
    per-file-complete count snapshots."""
    import threading

    from strainer2_tpu import native
    from strainer2_tpu.io.batches import pack_stream
    from strainer2_tpu.io.fastx import read_fastx
    from strainer2_tpu.utils.observability import stage

    table = engine.table_for(index)
    t = index.table
    dispatch_lock = threading.Lock()
    path_lock = threading.Lock()
    paths = iter(todo)
    box = {"counts": counts}
    errs: list[BaseException] = []

    def worker():
        while True:
            with path_lock:
                path = next(paths, None)
            if path is None or errs:
                return
            try:
                if native.available():
                    stream = native.NativePackStream(
                        [path], engine.k, cfg.rows, cfg.row_len
                    )
                else:
                    seqs = (rec.seq for rec in read_fastx(path))
                    stream = pack_stream(
                        seqs, engine.k, rows=cfg.rows, row_len=cfg.row_len
                    )
                for batch in stream:
                    bases = batch.bases  # packed OUTSIDE the lock
                    with dispatch_lock:
                        box["counts"] = engine.count_batch(
                            box["counts"], table, t.h_bits, t.salt, bases
                        )
            except BaseException as e:
                if isinstance(e, OSError) and not getattr(e, "filename", None):
                    e.filename = path
                errs.append(e)
                return

    with stage("scrub.panel_lookups"):
        threads = [
            threading.Thread(target=worker, name=f"s2-device-feed-{i}")
            for i in range(n_threads)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
    if errs:
        raise errs[0]
    return box["counts"]


def _count_threads(n_files: int) -> int:
    """Worker count for parallel panel counting (STRAINER2_COUNT_THREADS
    overrides; default caps at 8 — gzip decode + hashing saturate memory
    bandwidth well before the core count on big hosts)."""
    import os

    env = os.environ.get("STRAINER2_COUNT_THREADS")
    if env is not None:
        return max(1, min(int(env), n_files))
    return max(1, min(os.cpu_count() or 1, 8, n_files))


def count_files_native_pooled(nc, paths: list, num_slots: int):
    """Count ``paths`` with a native panel counter — pooled across cores
    when beneficial, sequential otherwise; returns the per-slot uint32
    counts, or None when ``nc`` is None (caller runs its jit fallback).
    The one dispatch rule shared by background_filter, the multi-strain
    shared background filter, and multi_scrub's union counting."""
    if nc is None:
        return None
    from strainer2_tpu.utils import observability as _obs
    from strainer2_tpu.utils.observability import stage

    counts = np.zeros(num_slots, dtype=np.uint32)
    n_threads = _count_threads(len(paths))
    if len(paths) > 1 and n_threads > 1:
        return _count_files_parallel(nc, counts, paths, n_threads)
    with stage("scrub.panel_lookups"):
        total = 0
        for path in paths:
            total += nc.count_file(counts, path)
    _obs._items["scrub.panel_lookups"] += total
    return counts


def _count_files_parallel(nc, counts_np: np.ndarray, paths: list, n_threads: int):
    """Count panel files concurrently, one native fused scan per worker
    thread (GIL released inside s2_count_file) into PER-THREAD buffers,
    then merge by integer addition — order-independent, so the result is
    byte-identical to the sequential scan (the same property that makes
    the psum mesh merge exact; concurrency shape TSan-verified by
    tools/tsan_stress.sh).  On unreadable files the error of the
    earliest file in list order is raised, as the sequential loop would.
    """
    import concurrent.futures
    import threading

    from strainer2_tpu.utils import observability as _obs
    from strainer2_tpu.utils.observability import stage

    local = threading.local()
    bufs: list[np.ndarray] = []
    bufs_lock = threading.Lock()
    outcomes: list = [None] * len(paths)

    def work(i: int, path: str) -> None:
        buf = getattr(local, "buf", None)
        if buf is None:
            buf = np.zeros_like(counts_np)
            with bufs_lock:
                bufs.append(buf)
            local.buf = buf
        try:
            outcomes[i] = nc.count_file(buf, path)
        except BaseException as e:  # earliest-in-list error re-raised below
            if isinstance(e, OSError) and not getattr(e, "filename", None):
                e.filename = path
            outcomes[i] = e

    with stage("scrub.panel_lookups"):
        with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(lambda a: work(*a), enumerate(paths)))
    for o in outcomes:
        if isinstance(o, BaseException):
            raise o
    for buf in bufs:
        counts_np += buf
    _obs._items["scrub.panel_lookups"] += int(sum(outcomes))
    return counts_np


def run_scrub_count(
    r_file: str,
    a_list: str,
    b_list: str,
    c_list: str | None = None,
    out: IO = None,
    progress: IO | None = None,
    cfg: ScrubCountConfig | None = None,
    index: StrainIndex | None = None,
    checkpoint_dir: str | None = None,
) -> StrainIndex:
    """Full kmer_scrub_count stage; writes the count table to ``out``.

    checkpoint_dir enables restartable counting at panel-file granularity
    (bit-identical to an uninterrupted run).  Returns the strain index
    (reusable by later stages).
    """
    from strainer2_tpu.constants import COL_DRUG, COL_METAGENOME, COL_PANGENOME

    cfg = cfg or ScrubCountConfig()
    out = out if out is not None else sys.stdout
    engine = KmerEngine(cfg.k)

    from strainer2_tpu.utils.observability import stage

    if index is None:
        with stage("scrub.index_build"):
            try:
                index = StrainIndex.from_fasta(r_file, engine, cfg.rows, cfg.row_len)
                index.table  # lazy (round 5); single-strain scrub always
                # needs it — materialize inside the stage timer
            except OSError:
                # reference src/genome_compare.c:986 (no "in", as printed)
                _exit_could_not_read(
                    f"could not read file {r_file} GEN_hash_sequences_set_count_vec()"
                )

    if cfg.mesh is not None:
        from strainer2_tpu.parallel.sharding import ShardedPanelEngine

        engine = ShardedPanelEngine(index, cfg.mesh[0], cfg.mesh[1])

    # multi-host SPMD: with jax.distributed initialized (e.g.
    # JAX_COORDINATOR_ADDRESS in the environment, one process per host),
    # every process builds the same index, counts its deterministic share
    # of each panel list, and integer-merges columns — bit-identical to a
    # single-process run; only process 0 writes the table.  Failure
    # semantics are SPMD-standard: a rank that exits on an unreadable file
    # leaves peers blocked in the merge collective until the distributed
    # runtime's timeout — the launcher (SLURM/job manager) must treat one
    # rank's nonzero exit as job failure, as with any MPI program.
    from strainer2_tpu.parallel.distributed import initialize, merge_across_hosts

    pidx, pcount = initialize()
    partition = (pidx, pcount) if pcount > 1 else None
    if partition is not None and cfg.mesh is not None:
        # the shard_map mesh spans ALL processes' devices under
        # jax.distributed: per-rank divergent file shares would break SPMD
        # (different collective program counts per rank => deadlock)
        print(
            "--mesh and multi-process panel partitioning cannot combine: "
            "run either one process with a device mesh, or one process per "
            "host with per-host partitioning (the default here)",
            file=sys.stderr,
        )
        raise SystemExit(1)

    ckpt = None
    if checkpoint_dir:
        import os

        from strainer2_tpu.pipeline.progress import ScrubCheckpoint

        if pcount > 1:
            # each rank checkpoints ITS partition's running counts — a
            # shared directory would interleave divergent partials and a
            # resume would merge the restored baseline once per rank
            checkpoint_dir = os.path.join(checkpoint_dir, f"rank{pidx}")
        ckpt = ScrubCheckpoint(checkpoint_dir)

    # the djb2 row-order replay needs only the index: overlap it with the
    # panel scans (it's ~0.5s of pure CPU at strain scale; the count pool
    # caps at 8 threads so production hosts have spare cores)
    order_box: list = []
    order_thread = None
    if cfg.reference_order and (pcount == 1 or pidx == 0):
        import threading

        def _order_bg():
            try:
                order_box.append(reference_row_order(index.codes, index.k))
            except BaseException as e:  # surfaced at join
                order_box.append(e)

        order_thread = threading.Thread(target=_order_bg, name="scrub-row-order")
        order_thread.start()

    col_pan = _count_panel(engine, index, a_list, cfg, progress,
                           column=COL_PANGENOME, checkpoint=ckpt,
                           partition=partition)
    col_meta = _count_panel(engine, index, b_list, cfg, progress,
                            column=COL_METAGENOME, checkpoint=ckpt,
                            partition=partition)
    col_drug = (
        _count_panel(engine, index, c_list, cfg, progress, skip_path=r_file,
                     column=COL_DRUG, checkpoint=ckpt, partition=partition)
        if c_list
        else None
    )
    if pcount > 1:
        col_pan = merge_across_hosts(col_pan)
        col_meta = merge_across_hosts(col_meta)
        if col_drug is not None:
            col_drug = merge_across_hosts(col_drug)
        if pidx != 0:
            return index

    order = None
    if order_thread is not None:
        order_thread.join()
        if order_box and isinstance(order_box[0], BaseException):
            raise order_box[0]
        order = order_box[0] if order_box else None

    with stage("scrub.write_table", items=index.num_kmers):
        write_scrub_table(
            out,
            index,
            col_pan,
            col_meta,
            col_drug,
            reference_order=cfg.reference_order,
            order=order,
        )
    return index


def write_scrub_table(
    out: IO,
    index: StrainIndex,
    col_pan: np.ndarray,
    col_meta: np.ndarray,
    col_drug: np.ndarray | None,
    reference_order: bool = True,
    chunk: int = 200_000,
    order: np.ndarray | None = None,
) -> None:
    """Emit the table (reference src/kmer_scrub_count.c:134-156): header is
    always 5 columns; rows have 4 columns without -C, 5 with.  ``order``
    short-circuits the djb2 replay when the caller already computed it."""
    from strainer2_tpu.ops.packing_np import decode_codes_np

    out.write("#kmer\treference_count\tpangenome_count\tmetagenome_count\tdrug_count\n")

    if order is None:
        if reference_order:
            order = reference_row_order(index.codes, index.k)
        else:
            order = np.arange(index.num_kmers, dtype=np.int64)

    codes = index.codes[order]
    c0 = index.genome_counts[order]
    c1 = col_pan[order]
    c2 = col_meta[order]
    c3 = col_drug[order] if col_drug is not None else None

    from strainer2_tpu.native import format_scrub_rows

    raw = getattr(out, "buffer", None)
    if raw is not None:
        out.flush()  # keep the text-layer header ordered before raw writes

    # Writer thread: formatting (native, GIL-released) overlaps the blocking
    # pipe/disk writes — the two are comparable costs at strain scale.
    import queue
    import threading

    wq: queue.Queue = queue.Queue(maxsize=4)
    werr: list[BaseException] = []

    def _drain() -> None:
        while True:
            blob = wq.get()
            if blob is None:
                return
            if werr:
                continue  # keep consuming so the producer never blocks
            try:
                if raw is not None:
                    raw.write(blob)
                else:
                    out.write(blob.decode("ascii"))
            except BaseException as e:  # surfaced after join
                werr.append(e)

    writer = threading.Thread(target=_drain, name="scrub-table-writer")
    writer.start()
    start = 0
    try:
        for start in range(0, codes.shape[0], chunk):
            end = min(start + chunk, codes.shape[0])
            nat = format_scrub_rows(
                codes[start:end],
                c0[start:end],
                c1[start:end],
                c2[start:end],
                c3[start:end] if c3 is not None else None,
                index.k,
            )
            if nat is None:
                break  # native library unavailable: Python fallback below
            if werr:
                break
            wq.put(nat)
        else:
            start = codes.shape[0]
    finally:
        wq.put(None)
        writer.join()
    if werr:
        raise werr[0]
    if start >= codes.shape[0]:
        return

    for start in range(start, codes.shape[0], chunk):
        end = min(start + chunk, codes.shape[0])
        kmers = decode_codes_np(codes[start:end], index.k)
        if c3 is not None:
            rows = [
                f"{s}\t{a}\t{b}\t{c}\t{d}\n"
                for s, a, b, c, d in zip(
                    kmers, c0[start:end], c1[start:end], c2[start:end], c3[start:end]
                )
            ]
        else:
            rows = [
                f"{s}\t{a}\t{b}\t{c}\n"
                for s, a, b, c in zip(kmers, c0[start:end], c1[start:end], c2[start:end])
            ]
        out.write("".join(rows))
