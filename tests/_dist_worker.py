"""Subprocess worker for the real 2-process merge_across_hosts test.

Launched by tests/test_distributed.py with a localhost coordinator: every
process counts its host_file_partition share of the panel files through
the production counting path, merges with merge_across_hosts, and saves
both its local and merged vectors for the parent to compare against a
single-process run over the full file list.
"""

import glob
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    workdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "merge"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from strainer2_tpu.index import StrainIndex
    from strainer2_tpu.parallel.distributed import (
        host_file_partition,
        initialize,
        merge_across_hosts,
    )
    from strainer2_tpu.pipeline.engine import KmerEngine
    from strainer2_tpu.pipeline.scrub_count import count_panel_file

    idx, cnt = initialize(f"127.0.0.1:{port}", nproc, pid)
    assert (idx, cnt) == (pid, nproc), (idx, cnt)

    if mode in ("scrub", "scrub_ckpt"):
        # full run_scrub_count in SPMD mode: every process counts its
        # partition; rank 0 writes the table
        import io
        import time

        from strainer2_tpu.pipeline.scrub_count import run_scrub_count

        t0 = time.time()
        out = io.StringIO()
        run_scrub_count(
            os.path.join(workdir, "genome.fa"),
            os.path.join(workdir, "panels.txt"),
            os.path.join(workdir, "panels.txt"),
            out=out,
            checkpoint_dir=(
                os.path.join(workdir, "ckpt") if mode == "scrub_ckpt" else None
            ),
        )
        with open(os.path.join(workdir, f"table_{pid}.tsv"), "w") as f:
            f.write(out.getvalue())
        with open(os.path.join(workdir, f"time_{pid}.txt"), "w") as f:
            f.write(f"{time.time() - t0}\n")
        return

    if mode in ("detect", "detect_ckpt"):
        # SPMD detection: every rank builds the same detector, scores its
        # sample share, rank 0 writes the gzip hits file + stdout
        import io

        from strainer2_tpu.pipeline.detect import run_detect

        out = io.StringIO()
        run_detect(
            os.path.join(workdir, "genome.fa"),
            os.path.join(workdir, "scrubbed.txt"),
            os.path.join(workdir, f"hits_{pid}.gz"),
            batch_list=os.path.join(workdir, "targets.txt"),
            background_list=(
                os.path.join(workdir, "background.txt")
                if os.path.exists(os.path.join(workdir, "background.txt"))
                else None
            ),
            stdout=out,
            checkpoint_dir=(
                os.path.join(workdir, "dckpt") if mode == "detect_ckpt" else None
            ),
        )
        with open(os.path.join(workdir, f"detect_stdout_{pid}.txt"), "w") as f:
            f.write(out.getvalue())
        return

    if mode == "fused":
        from strainer2_tpu.pipeline.fused import run_pipeline

        run_pipeline(
            os.path.join(workdir, "genome.fa"),
            os.path.join(workdir, "panels.txt"),
            os.path.join(workdir, "panels.txt"),
            os.path.join(workdir, "targets.txt"),
            os.path.join(workdir, f"fused_out_{pid}"),
        )
        return

    if mode in ("multi", "multi_ckpt"):
        # fused MULTI-strain pipeline in SPMD mode: shared panel scan and
        # the multi-strain detection passes both partition across ranks.
        # multi_ckpt adds the checkpoint directory (per-rank scrub subdirs
        # + per-pass detect checkpoints) — byte-identical either way.
        from strainer2_tpu.pipeline.fused import run_multi_pipeline

        run_multi_pipeline(
            [
                os.path.join(workdir, "genome.fa"),
                os.path.join(workdir, "genome2.fa"),
            ],
            os.path.join(workdir, "panels.txt"),
            os.path.join(workdir, "panels.txt"),
            os.path.join(workdir, "targets.txt"),
            os.path.join(workdir, f"multi_out_{pid}"),
            checkpoint_dir=(
                os.path.join(workdir, "mckpt") if mode == "multi_ckpt" else None
            ),
        )
        return

    if mode == "merge_dead":
        # rank-failure contract: every rank > 0 dies BEFORE the collective;
        # rank 0 must produce a timely error (watchdog in
        # parallel/distributed.py) instead of hanging in process_allgather
        if pid != 0:
            return
        local = np.zeros(64, dtype=np.uint32)
        merged = merge_across_hosts(local)  # expected: abort, not return
        np.save(os.path.join(workdir, "merged_dead_0.npy"), merged)
        return

    k = 31
    rows, row_len = 8, 512
    engine = KmerEngine(k)
    index = StrainIndex.from_fasta(
        os.path.join(workdir, "genome.fa"), engine, rows, row_len
    )
    panels = sorted(glob.glob(os.path.join(workdir, "panel_*.fa")))
    mine = host_file_partition(panels, pid, nproc)
    counts = engine.init_counts(index)
    for p in mine:
        counts = count_panel_file(engine, index, counts, p, rows, row_len)
    local = np.asarray(engine.finalize_counts(counts))
    merged = merge_across_hosts(local)
    np.save(os.path.join(workdir, f"local_{pid}.npy"), local)
    np.save(os.path.join(workdir, f"merged_{pid}.npy"), merged)


if __name__ == "__main__":
    main()
