"""Multi-strain shared-panel scrub counting.

Panel counting dominates real kmer_scrub_count runs (16-68 min per strain
in the reference's own notes, src/kmer_scrub_count.c:19-20), and the
reference repeats the whole panel scan for every strain.  But panel
counting is lookup-only: the count of a k-mer in a panel is a property of
the K-MER, not of the strain asking — so S strains can share ONE panel
scan over the union of their k-mer sets, and each strain's table is a
projection of the union counts.  The output tables are byte-identical to
S independent kmer_scrub_count runs while scanning the panels once
(verified in tests/test_multi_scrub.py).

The -C (co-occurring strain) column is per-strain only in that each
strain skips counting its own genome file (reference
src/genome_compare.c:115-146); with shared counting this becomes: total
over all drug files minus the strain's own-file contribution, counted
once per distinct own-file.
"""

from __future__ import annotations

import os
from typing import IO

import numpy as np

from strainer2_tpu.index.build import StrainIndex
from strainer2_tpu.pipeline.engine import KmerEngine
from strainer2_tpu.pipeline.scrub_count import (
    ScrubCountConfig,
    _progress_line,
    count_panel_file,
    read_list_file,
    write_scrub_table,
)

__all__ = [
    "run_multi_scrub",
    "multi_scrub_counts",
    "strain_threads",
    "union_checkpoint_key",
]


def strain_threads(n_strains: int) -> int:
    """Worker count for independent PER-STRAIN work (index builds, filters):
    min(cores, 8, n); STRAINER2_STRAIN_THREADS overrides (1 = sequential).

    Per-strain stages are embarrassingly parallel — each strain reads its
    own genome and writes its own artifacts — and their results merge by
    list position, so parallel execution is byte-identical by
    construction (pinned by tests/test_multi_scrub.py which runs the
    fused pipeline against staged per-strain runs)."""
    env = os.environ.get("STRAINER2_STRAIN_THREADS")
    if env:
        return max(1, int(env))
    return max(1, min(os.cpu_count() or 1, 8, n_strains))


def union_checkpoint_key(union_codes: np.ndarray, k: int) -> str:
    """Identity key for a union-count checkpoint: a content hash of the
    union k-mer set (plus k).  Slot-indexed count buffers are only valid
    against the exact table geometry they were recorded for, and the
    geometry is a pure function of the union codes — so a checkpoint
    recorded for a different strain set (or after a genome edit) hashes
    differently and is discarded instead of silently mixing counts."""
    import hashlib

    h = hashlib.sha256()
    h.update(f"k={k};n={union_codes.shape[0]};".encode())
    h.update(np.ascontiguousarray(union_codes).tobytes())
    return h.hexdigest()


def multi_scrub_counts(
    r_files: list[str],
    a_list: str,
    b_list: str,
    c_list: str | None,
    cfg: ScrubCountConfig,
    progress: IO | None = None,
    strain_indexes: "list[StrainIndex] | None" = None,
    checkpoint_dir: str | None = None,
):
    """ONE shared panel scan over the union of S strains' k-mer sets.

    Returns (strain_indexes, per-strain (col_pan, col_meta, col_drug)
    column triples) with counts identical to S independent scans.

    checkpoint_dir enables restartable UNION counting at panel-file
    granularity (the multi-strain twin of run_scrub_count's checkpoint):
    each completed panel file persists the merged slot-indexed union count
    buffer, keyed by a content hash of the union k-mer set so a checkpoint
    from a different strain set can never mix in (union_checkpoint_key).
    Checkpointed counting is sequential per file (file-granular resume
    needs per-file-complete snapshots); the per-strain own-file -C
    contributions are NOT checkpointed — one genome scan per distinct
    strain file, noise next to the panel scans.  Resumed runs are
    bit-identical to uninterrupted ones (integer accumulation)."""
    import jax.numpy as jnp

    engine = KmerEngine(cfg.k)

    # per-strain indexes (own k-mer sets + genome occurrence counts);
    # independent per strain, so they build across a thread pool (the hot
    # parts — native scan, unique, table build — release the GIL)
    if strain_indexes is None:
        threads = strain_threads(len(r_files))
        if threads > 1 and len(r_files) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(threads) as ex:
                strain_indexes = list(
                    ex.map(
                        lambda r: StrainIndex.from_fasta(
                            r, engine, cfg.rows, cfg.row_len
                        ),
                        r_files,
                    )
                )
        else:
            strain_indexes = [
                StrainIndex.from_fasta(r, engine, cfg.rows, cfg.row_len)
                for r in r_files
            ]
    union_codes = np.unique(np.concatenate([ix.codes for ix in strain_indexes]))
    union = StrainIndex.from_unique_codes(union_codes, k=cfg.k)

    # multi-host SPMD: each rank counts its size-balanced share of every
    # panel list; the per-slot integer merge hands every rank identical
    # union counts (bit-exact), so all ranks project identical columns
    import jax

    pidx, pcount = jax.process_index(), jax.process_count()

    ckpt = None
    if checkpoint_dir:
        from strainer2_tpu.pipeline.progress import ScrubCheckpoint

        if pcount > 1:
            # each rank checkpoints ITS partition's running counts (same
            # contract as run_scrub_count's per-rank subdirectories)
            checkpoint_dir = os.path.join(checkpoint_dir, f"rank{pidx}")
        ckpt = ScrubCheckpoint(
            checkpoint_dir, key=union_checkpoint_key(union_codes, cfg.k)
        )

    def count_list(paths: list[str], column: int):
        if pcount > 1:
            from strainer2_tpu.parallel.distributed import host_file_partition

            paths = host_file_partition(paths, pidx, pcount)
        for path in paths:
            _progress_line(progress, path)
        try:
            return _count_paths(paths, column)
        except OSError as e:
            # reference-exact unreadable-panel diagnostic + exit 1, as the
            # single-strain loop prints (reference src/genome_compare.c:196)
            from strainer2_tpu.pipeline.scrub_count import _exit_could_not_read

            _exit_could_not_read(
                f"could not read file {getattr(e, 'filename', None) or e} "
                "in GEN_calculate_kmer_count()"
            )

    def _count_paths(paths: list[str], column: int):
        from strainer2_tpu.pipeline.scrub_count import (
            _use_native_counting,
            count_files_native_pooled,
        )

        use_native = _use_native_counting(engine)
        if ckpt is not None:
            # sequential with a per-file-complete snapshot after each file
            # — the resume contract; duplicates re-count (multiset), as in
            # scrub_count._count_panel
            from collections import Counter

            done = Counter(ckpt.done_files(column))
            counts_np = ckpt.counts(column)
            todo = []
            for path in paths:
                if done[path] > 0:
                    done[path] -= 1
                    continue
                todo.append(path)
            if use_native:
                if counts_np is None:
                    counts_np = np.zeros(union.table.num_slots, dtype=np.uint32)
                nc = union.native_counter()
                for path in todo:
                    nc.count_file(counts_np, path)
                    ckpt.record(column, path, counts_np)
            else:
                counts = (
                    engine.counts_from_numpy(union, counts_np)
                    if counts_np is not None
                    else jnp.zeros(union.table.num_slots, dtype=jnp.uint32)
                )
                for path in todo:
                    counts = count_panel_file(
                        engine, union, counts, path, cfg.rows, cfg.row_len
                    )
                    counts_np = engine.finalize_counts(counts)
                    ckpt.record(column, path, counts_np)
                counts_np = engine.finalize_counts(counts)
        else:
            nc = union.native_counter() if use_native else None
            counts_np = count_files_native_pooled(nc, paths, union.table.num_slots)
            if counts_np is None:
                counts = jnp.zeros(union.table.num_slots, dtype=jnp.uint32)
                for path in paths:
                    counts = count_panel_file(
                        engine, union, counts, path, cfg.rows, cfg.row_len
                    )
                counts_np = np.asarray(counts)
        if pcount > 1:
            from strainer2_tpu.parallel.distributed import merge_across_hosts

            counts_np = merge_across_hosts(counts_np)
        return union.key_values(counts_np).astype(np.uint32)

    from strainer2_tpu.constants import COL_DRUG, COL_METAGENOME, COL_PANGENOME

    pan_union = count_list(read_list_file(a_list), COL_PANGENOME)
    meta_union = count_list(read_list_file(b_list), COL_METAGENOME)

    drug_union = None
    own_contrib: dict[str, np.ndarray] = {}
    if c_list:
        from collections import Counter

        drug_paths = read_list_file(c_list)
        drug_union = count_list(drug_paths, COL_DRUG)
        listed = Counter(drug_paths)
        # each strain subtracts its own genome's contribution: the reference
        # skips EVERY occurrence of the strain's -r path in the -C list
        # (reference src/genome_compare.c:138-141)
        single: dict[str, np.ndarray] = {}
        for r in set(r_files):
            if listed[r]:
                if r not in single:
                    counts = jnp.zeros(union.table.num_slots, dtype=jnp.uint32)
                    counts = count_panel_file(
                        engine, union, counts, r, cfg.rows, cfg.row_len
                    )
                    single[r] = union.key_values(np.asarray(counts)).astype(np.uint32)
                own_contrib[r] = single[r] * np.uint32(listed[r])
            else:
                own_contrib[r] = np.zeros_like(drug_union)

    # union-position of each strain's keys for count projection
    order = np.argsort(union.codes, kind="stable")
    sorted_codes = union.codes[order]

    columns = []
    for ix, r_file in zip(strain_indexes, r_files):
        pos = order[np.searchsorted(sorted_codes, ix.codes)]
        col_drug = None
        if drug_union is not None:
            col_drug = drug_union[pos] - own_contrib[r_file][pos]
        columns.append((pan_union[pos], meta_union[pos], col_drug))
    return strain_indexes, columns


def run_multi_scrub(
    r_files: list[str],
    a_list: str,
    b_list: str,
    c_list: str | None,
    outs: list[IO],
    cfg: ScrubCountConfig | None = None,
    progress: IO | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Emit one reference-identical scrub-count table per strain from one
    shared scan of the -A/-B (and -C) panels.  checkpoint_dir enables
    panel-file-granular resume of the union counting (bit-identical; see
    multi_scrub_counts)."""
    cfg = cfg or ScrubCountConfig()
    strain_indexes, columns = multi_scrub_counts(
        r_files, a_list, b_list, c_list, cfg, progress,
        checkpoint_dir=checkpoint_dir,
    )
    for ix, (col_pan, col_meta, col_drug), out in zip(strain_indexes, columns, outs):
        write_scrub_table(
            out, ix, col_pan, col_meta, col_drug, reference_order=cfg.reference_order
        )
