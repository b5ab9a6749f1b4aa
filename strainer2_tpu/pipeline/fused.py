"""Fused end-to-end pipeline: scrub count -> filter -> detect -> coverage
in ONE process.

The reference workflow (reference test/example.sh:1-28) runs four
processes wired by gzip'd TSV files; every stage re-parses what the
previous one formatted, and detection re-scans the strain genome the
scrub stage already indexed.  The fused runner keeps everything
in memory instead:

- the strain index is built once and shared by scrub counting and
  detection (the reference builds its hash twice, src/kmer_scrub_count.c:87
  and src/strain_detect.c:137);
- the filter consumes the count columns directly (no 255 MB TSV round
  trip) via an in-memory ScrubTable in the reference's row order, so the
  joint-scrub tie handling is unchanged;
- the kept rows map straight to strain-index keys — the k-mer strings are
  never re-encoded or re-oriented (the -a file parse of
  src/strain_detect.c:668-726 is skipped entirely);
- intermediate artifacts (scrub_kmer_counts.gz, scrubbed_kmers.gz) are
  still written by default — byte-identical to the staged CLIs — so the
  fused run remains drop-in observable and resumable downstream.

Output files land in ``out_dir`` with the reference workflow's names:
<stem>.scrub_kmer_counts.gz, <stem>.scrubbed_kmers.gz, <stem>.kmer_hits.gz,
<stem>.coverage_depth.
"""

from __future__ import annotations

import gzip
import io
import os
import re
import sys
from dataclasses import dataclass

import numpy as np

from strainer2_tpu.index.refhash_order import reference_row_order

__all__ = ["FusedConfig", "run_pipeline", "run_multi_pipeline"]


@dataclass
class FusedConfig:
    min_fraction: float = 0.04  # reference kmer_scrub_filter.py default
    independent: bool = False
    min_kmer_hits: int = 1  # coverage_depth threshold
    write_counts: bool = True
    write_scrubbed: bool = True
    gzip_level: int = 1  # intermediates; reference example uses `gzip --best`


def _stem(path: str) -> str:
    """Genome-file output stem (the one place this naming rule lives —
    the staged CLIs import it too so artifact names can't diverge)."""
    return re.sub(r"\.(fna|fasta|fa)(\.gz)?$", "", os.path.basename(path))


class _NullTextSink:
    """Text sink that discards writes (write_scrubbed=False path)."""

    def write(self, s):
        return len(s)

    def flush(self):
        pass

    def close(self):
        pass


def _filter_in_memory(index, order, col_pan, col_meta, col_drug,
                      scrubbed_path, fcfg, err) -> np.ndarray:
    """Filter one strain's in-memory count table (reference row order);
    returns the informative key indices (first-encounter order).  Writes
    the scrubbed-k-mer artifact when scrubbed_path is given."""
    from strainer2_tpu.pipeline.filter import CodeKeyRows, ScrubTable, run_filter

    keys = CodeKeyRows(index.codes[order], index.k)
    table = ScrubTable(
        keys=keys,
        strain=index.genome_counts[order].astype(np.int64),
        pan=col_pan[order].astype(np.int64),
        meta=col_meta[order].astype(np.int64),
        drug_mask=(col_drug[order] > 0) if col_drug is not None
        else np.zeros(len(keys), dtype=bool),
        has_drug=col_drug is not None,
    )
    if scrubbed_path:
        scrub_out = gzip.open(scrubbed_path, "wt", compresslevel=fcfg.gzip_level)
    else:
        scrub_out = _NullTextSink()  # don't render megabytes just to discard
    try:
        _, kept_idx = run_filter(
            table, min_fraction=fcfg.min_fraction,
            independent=fcfg.independent, out=scrub_out, err=err,
            return_indices=True,
        )
    finally:
        scrub_out.close()
    return order[kept_idx]


def run_pipeline(
    r_file: str,
    a_list: str,
    b_list: str,
    target_list: str,
    out_dir: str,
    c_list: str | None = None,
    background_list: str | None = None,
    coverage_background_list: str | None = None,
    fused_cfg: FusedConfig | None = None,
    progress=None,
    err=None,
    stdout=None,
    checkpoint_dir: str | None = None,
) -> dict:
    """Run all four stages; returns the output paths keyed by stage.

    checkpoint_dir enables resume for the two long stages, bit-identical
    to an uninterrupted run: panel counting at file granularity
    (<dir>/scrub, keyed to the strain's k-mer set so a stale checkpoint
    can't mix) and detection at sample granularity (<dir>/detect).  The
    filter and coverage stages recompute — they are seconds next to the
    scans they sit between."""
    from strainer2_tpu.constants import COL_DRUG, COL_METAGENOME, COL_PANGENOME
    from strainer2_tpu.index.build import StrainIndex
    from strainer2_tpu.pipeline.coverage import run_coverage_depth
    from strainer2_tpu.pipeline.detect import DetectConfig, StrainDetector
    from strainer2_tpu.pipeline.engine import KmerEngine
    from strainer2_tpu.pipeline.scrub_count import (
        ScrubCountConfig,
        _count_panel,
        write_scrub_table,
    )
    from strainer2_tpu.utils.observability import stage

    fcfg = fused_cfg or FusedConfig()
    err = err if err is not None else sys.stderr
    os.makedirs(out_dir, exist_ok=True)
    stem = _stem(r_file)
    paths = {
        "counts": os.path.join(out_dir, stem + ".scrub_kmer_counts.gz"),
        "scrubbed": os.path.join(out_dir, stem + ".scrubbed_kmers.gz"),
        "hits": os.path.join(out_dir, stem + ".kmer_hits.gz"),
        "coverage": os.path.join(out_dir, stem + ".coverage_depth"),
    }

    cfg = ScrubCountConfig()
    engine = KmerEngine(cfg.k)
    with stage("fused.index_build"):
        index = StrainIndex.from_fasta(r_file, engine, cfg.rows, cfg.row_len)

    # overlap the djb2 row-order replay with the panel scans (needs only
    # the index; consumed by the counts writer and the filter)
    import threading

    order_box: list = []

    def _order_bg():
        try:
            order_box.append(reference_row_order(index.codes, index.k))
        except BaseException as e:  # surfaced at join
            order_box.append(e)

    order_thread = threading.Thread(target=_order_bg, name="fused-row-order")
    order_thread.start()

    # ---- stage 1: panel counting (one shared index) ----
    # multi-host SPMD (same contract as run_scrub_count): with
    # jax.distributed initialized, ranks count partitioned shares of each
    # panel list and integer-merge.  The merge hands every rank identical
    # columns, so every rank then derives the same filter result and
    # detector state and the detection phase ALSO partitions across ranks
    # (detect._staged_quantify); rank 0 alone writes artifacts + stdout.
    from strainer2_tpu.parallel.distributed import initialize, merge_across_hosts

    pidx, pcount = initialize()
    partition = (pidx, pcount) if pcount > 1 else None

    ckpt = None
    if checkpoint_dir:
        from strainer2_tpu.pipeline.multi_scrub import union_checkpoint_key
        from strainer2_tpu.pipeline.progress import ScrubCheckpoint

        scrub_dir = os.path.join(checkpoint_dir, "scrub")
        if pcount > 1:
            scrub_dir = os.path.join(scrub_dir, f"rank{pidx}")
        ckpt = ScrubCheckpoint(
            scrub_dir, key=union_checkpoint_key(index.codes, cfg.k)
        )

    col_pan = _count_panel(engine, index, a_list, cfg, progress,
                           column=COL_PANGENOME, partition=partition,
                           checkpoint=ckpt)
    col_meta = _count_panel(engine, index, b_list, cfg, progress,
                            column=COL_METAGENOME, partition=partition,
                            checkpoint=ckpt)
    col_drug = (
        _count_panel(engine, index, c_list, cfg, progress,
                     skip_path=r_file, column=COL_DRUG, partition=partition,
                     checkpoint=ckpt)
        if c_list
        else None
    )
    if pcount > 1:
        col_pan = merge_across_hosts(col_pan)
        col_meta = merge_across_hosts(col_meta)
        if col_drug is not None:
            col_drug = merge_across_hosts(col_drug)
        if pidx != 0:
            # participate in SPMD detection but write no artifacts
            fcfg = FusedConfig(
                min_fraction=fcfg.min_fraction, independent=fcfg.independent,
                min_kmer_hits=fcfg.min_kmer_hits, write_counts=False,
                write_scrubbed=False, gzip_level=fcfg.gzip_level,
            )
            err = _NullTextSink()
            stdout = _NullTextSink()

    order_thread.join()
    if order_box and isinstance(order_box[0], BaseException):
        raise order_box[0]
    order = order_box[0]
    # The counts artifact is observability output — no later fused stage
    # reads it (filter runs on the in-memory columns) — so its gzip write
    # overlaps the filter/detect/coverage stages on a background thread
    # (all inputs are read-only from here; joined before returning).
    counts_writer = None
    counts_write_err: list[BaseException] = []
    if fcfg.write_counts:
        import threading

        def _write_counts_bg():
            try:
                with stage("fused.write_counts"):
                    with gzip.open(
                        paths["counts"], "wt", compresslevel=fcfg.gzip_level
                    ) as f:
                        write_scrub_table(f, index, col_pan, col_meta, col_drug,
                                          order=order)
            except BaseException as e:  # surfaced at join
                counts_write_err.append(e)

        counts_writer = threading.Thread(
            target=_write_counts_bg, name="fused-counts-writer"
        )
        counts_writer.start()
    else:
        paths["counts"] = None

    # ---- stage 2: filter on the in-memory table (reference row order) ----
    with stage("fused.filter"):
        if not fcfg.write_scrubbed:
            paths["scrubbed"] = None
        informative_keys = _filter_in_memory(
            index, order, col_pan, col_meta, col_drug,
            paths["scrubbed"], fcfg, err,
        )

    # ---- stages 3+4: detect on the shared index, then coverage ----
    det = StrainDetector(
        r_file, None, DetectConfig(k=cfg.k),
        stdout=stdout if stdout is not None else sys.stdout,
        index=index, informative_keys=informative_keys,
    )
    if background_list:
        det.background_filter(background_list)
    det.quantify_all(
        paths["hits"], batch_list=target_list,
        checkpoint_dir=(
            os.path.join(checkpoint_dir, "detect") if checkpoint_dir else None
        ),
    )

    if pcount > 1 and pidx != 0:
        return paths  # rank 0 owns the remaining artifacts
    with stage("fused.coverage"), open(paths["coverage"], "w") as f:
        run_coverage_depth(
            paths["hits"], min_kmer_hits=fcfg.min_kmer_hits,
            background_metagenomes_file=coverage_background_list, out=f,
        )
    if counts_writer is not None:
        counts_writer.join()
        if counts_write_err:
            raise counts_write_err[0]
    return paths


def run_multi_pipeline(
    r_files: list,
    a_list: str,
    b_list: str,
    target_list: str,
    out_dir: str,
    c_list: str | None = None,
    background_list: str | None = None,
    coverage_background_list: str | None = None,
    fused_cfg: FusedConfig | None = None,
    progress=None,
    err=None,
    stdout=None,
    checkpoint_dir: str | None = None,
) -> list:
    """Fused pipeline for S strains: ONE shared scan of the -A/-B/-C panels
    (the union-index trick of pipeline/multi_scrub.py), per-strain in-memory
    filters, then multi-strain detection (16 strains per target-stream pass,
    pipeline/multi_detect.py) and per-strain coverage metrics.

    Per-strain outputs are byte-identical to S independent staged runs; the
    panels and the target metagenomes are each read once instead of S times
    — the fused form of the reference's one-Snakemake-job-per-strain fan-out
    (reference test/Snakemake.strain_detect:23-50).

    checkpoint_dir enables resume for the two long stages, bit-identical
    to an uninterrupted run: the shared UNION panel scan at file
    granularity (<dir>/scrub, keyed to a content hash of the union k-mer
    set — multi_scrub.union_checkpoint_key — so a checkpoint from a
    different strain set can never mix in) and each multi-strain detection
    pass at sample granularity (<dir>/detect_<pass>_<identity-hash>,
    where the hash covers the pass's strains, their informative sets, and
    the filter/background configuration).  Per-strain index builds,
    filters, and coverage recompute on resume — they are seconds next to
    the scans.
    """
    from strainer2_tpu.pipeline.coverage import run_coverage_depth
    from strainer2_tpu.pipeline.detect import DetectConfig
    from strainer2_tpu.pipeline.multi_detect import MultiStrainDetector
    from strainer2_tpu.pipeline.multi_scrub import multi_scrub_counts
    from strainer2_tpu.pipeline.scrub_count import ScrubCountConfig, write_scrub_table
    from strainer2_tpu.utils.observability import stage

    fcfg = fused_cfg or FusedConfig()
    err = err if err is not None else sys.stderr
    os.makedirs(out_dir, exist_ok=True)
    cfg = ScrubCountConfig()

    # multi-host SPMD (same contract as run_pipeline): panel counting and
    # detection both partition across jax.distributed ranks; rank 0 alone
    # writes artifacts + stdout
    from strainer2_tpu.parallel.distributed import initialize

    pidx, pcount = initialize()
    if pcount > 1 and pidx != 0:
        fcfg = FusedConfig(
            min_fraction=fcfg.min_fraction, independent=fcfg.independent,
            min_kmer_hits=fcfg.min_kmer_hits, write_counts=False,
            write_scrubbed=False, gzip_level=fcfg.gzip_level,
        )
        err = _NullTextSink()
        stdout = _NullTextSink()

    stems = [_stem(r) for r in r_files]
    if len(set(stems)) != len(stems):
        dup = sorted({s for s in stems if stems.count(s) > 1})
        raise ValueError(
            "strain genomes map to duplicate output stems "
            f"{dup}: outputs would overwrite each other (rename the files "
            "or run them in separate output directories)"
        )

    def out_path(r_file: str, suffix: str):
        return os.path.join(out_dir, _stem(r_file) + suffix)

    with stage("fused.multi_scrub"):
        strain_indexes, columns = multi_scrub_counts(
            r_files, a_list, b_list, c_list, cfg, progress,
            checkpoint_dir=(
                os.path.join(checkpoint_dir, "scrub") if checkpoint_dir else None
            ),
        )

    import io
    import threading

    from strainer2_tpu.pipeline.multi_scrub import strain_threads

    all_paths = []
    counts_writers: list = []
    counts_write_err: list[BaseException] = []
    for r_file in r_files:
        paths = {
            "counts": out_path(r_file, ".scrub_kmer_counts.gz")
            if fcfg.write_counts else None,
            "scrubbed": out_path(r_file, ".scrubbed_kmers.gz")
            if fcfg.write_scrubbed else None,
            "hits": out_path(r_file, ".kmer_hits.gz"),
            "coverage": out_path(r_file, ".coverage_depth"),
        }
        all_paths.append(paths)

    def _prep_strain(arg):
        """Per-strain order replay + counts-write kickoff + filter —
        independent per strain, so strains run across a worker pool; the
        per-strain stderr diagnostics buffer and flush in strain order."""
        r_file, index, (col_pan, col_meta, col_drug), paths = arg
        order = reference_row_order(index.codes, index.k)
        if fcfg.write_counts:
            # observability artifact: overlap with the remaining stages
            # (same pattern as run_pipeline; joined before returning)
            def _write_counts_bg(path=paths["counts"], index=index,
                                 col_pan=col_pan, col_meta=col_meta,
                                 col_drug=col_drug, order=order):
                try:
                    with stage("fused.write_counts"):
                        with gzip.open(
                            path, "wt", compresslevel=fcfg.gzip_level
                        ) as f:
                            write_scrub_table(
                                f, index, col_pan, col_meta, col_drug, order=order
                            )
                except BaseException as e:  # surfaced at join
                    counts_write_err.append(e)

            w = threading.Thread(target=_write_counts_bg, name="fused-counts-writer")
            w.start()
            counts_writers.append(w)
        err_buf = io.StringIO()
        try:
            with stage("fused.filter"):
                informative = _filter_in_memory(
                    index, order, col_pan, col_meta, col_drug,
                    paths["scrubbed"], fcfg, err_buf,
                )
        except BaseException as e:
            # carry the partial diagnostics so the consumer below can flush
            # them in strain order before propagating (the serial contract:
            # earlier strains' stderr first, then the failing strain's —
            # same pattern as MultiStrainDetector._build_one)
            e._s2_err = err_buf.getvalue()  # type: ignore[attr-defined]
            raise
        return (r_file, index, informative), err_buf.getvalue()

    prep_args = list(zip(r_files, strain_indexes, columns, all_paths))
    threads = strain_threads(len(r_files))
    prebuilt: list = []

    def _consume(fu_result):
        """Flush each strain's buffered stderr in strain order as results
        resolve, so diagnostics preceding a failure still reach stderr."""
        try:
            p, err_text = fu_result()
        except BaseException as e:
            err.write(getattr(e, "_s2_err", ""))
            raise
        if err_text:
            err.write(err_text)
        prebuilt.append(p)

    if threads > 1 and len(prep_args) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(threads) as ex:
            futures = [ex.submit(_prep_strain, a) for a in prep_args]
            for fu in futures:  # strain order, as the serial loop wrote
                _consume(fu.result)
    else:
        for a in prep_args:
            _consume(lambda a=a: _prep_strain(a))

    # passes sized by strain count AND the EXACT projected union
    # row-table bytes against the device budget (the indexes are in
    # memory, so the real unions are known)
    from strainer2_tpu.pipeline.multi_detect import plan_strain_passes_from_codes

    def _detect_ckpt_dir(start: int, chunk) -> str | None:
        """Per-pass detect checkpoint directory.  The identity hash covers
        what determines a pass's outputs beyond the (f1, f2, type) keys
        DetectCheckpoint checks per sample: the pass's strain files, each
        strain's informative k-mer SET (a content hash — the filter's
        outcome, so changed panels/filter params change it), and the
        background/filter configuration.  A rerun with anything different
        lands in a different directory instead of replaying stale rows."""
        if not checkpoint_dir:
            return None
        import hashlib

        h = hashlib.sha256()
        h.update(
            f"m={fcfg.min_fraction};i={fcfg.independent};"
            f"g={background_list};".encode()
        )
        for r_file, index, informative in chunk:
            h.update(f"{r_file};{index.num_kmers};".encode())
            h.update(np.ascontiguousarray(index.codes[informative]).tobytes())
        return os.path.join(
            checkpoint_dir, f"detect_{start}_{h.hexdigest()[:16]}"
        )

    # exact union-based pass sizing: the indexes are in memory, so passes
    # cut on the REAL union size — related strains (the common case) share
    # most k-mers and ride one pass where the conservative sum-bound
    # (plan_strain_passes) would split them and re-scan the targets
    for start, end in plan_strain_passes_from_codes(
        [idx.codes for _, idx, _ in prebuilt]
    ):
        chunk = prebuilt[start:end]
        with stage("fused.multi_detect"):
            det = MultiStrainDetector(
                [], DetectConfig(k=cfg.k),
                stdout=stdout if stdout is not None else sys.stdout,
                background_list=background_list, prebuilt=chunk,
            )
            det.quantify_all(
                [p["hits"] for p in all_paths[start:end]], target_list,
                checkpoint_dir=_detect_ckpt_dir(start, chunk),
            )

    if pcount > 1 and pidx != 0:
        return all_paths  # rank 0 owns the remaining artifacts
    with stage("fused.coverage"):
        for paths in all_paths:
            with open(paths["coverage"], "w") as f:
                run_coverage_depth(
                    paths["hits"], min_kmer_hits=fcfg.min_kmer_hits,
                    background_metagenomes_file=coverage_background_list, out=f,
                )
    for w in counts_writers:
        w.join()
    if counts_write_err:
        raise counts_write_err[0]
    return all_paths
