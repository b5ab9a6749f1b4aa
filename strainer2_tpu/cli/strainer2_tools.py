"""CLI for the reference's library-only modes.

The reference keeps these behind commented-out Makefile targets
(strain_track, pangenome_compare, kmer_matrix — reference src/Makefile:12);
here they are first-class subcommands backed by the same TPU engine.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="strainer2_tools",
        description="Auxiliary multi-genome k-mer analyses (TPU engine)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    pg = sub.add_parser("pangenome", help="per-genome k-mer occurrence tracks over a genome panel")
    pg.add_argument("-A", dest="a_list", required=True, help="file listing genome FASTAs")
    pg.add_argument("-r", dest="ref_file", default=None,
                    help="write a track only for this genome (default: all)")
    pg.add_argument("-d", dest="write_dist", action="store_true",
                    help="also write the pangenome count histogram")
    pg.add_argument("-s", dest="seed", type=int, default=31, help="k-mer length")

    km = sub.add_parser("kmer-matrix", help="k-mer x file count matrix")
    km.add_argument("-A", dest="a_list", required=True, help="file listing genome FASTAs")
    km.add_argument("-s", dest="seed", type=int, default=31, help="k-mer length")

    st = sub.add_parser("strain-track", help="unique-k-mer strain abundances in one metagenome")
    st.add_argument("-A", dest="a_list", required=True, help="file listing strain FASTAs")
    st.add_argument("-b", dest="b_file", required=True, help="metagenome file")
    st.add_argument("-n", dest="no_track", action="store_true",
                    help="skip per-strain track files")
    st.add_argument("-m", dest="max_reads", type=int, default=0,
                    help="stop after ~this many metagenome reads (0 = all)")
    st.add_argument("-s", dest="seed", type=int, default=31, help="k-mer length")

    md = sub.add_parser(
        "detect-multi",
        help="score up to 16 strains against shared target metagenomes in ONE "
        "stream pass (outputs identical to per-strain strain_detect runs)",
    )
    md.add_argument("-S", dest="strain_list", required=True,
                    help="file with one `genome<TAB>informative_kmers` pair per line")
    md.add_argument("-B", dest="batch_list", required=True,
                    help="batch file of target metagenomes (PE/SE/PEI rows)")
    md.add_argument("-g", dest="background_list", default=None,
                    help="background metagenome list (shared counting, per-strain thresholds)")
    md.add_argument("-o", dest="out_dir", required=True,
                    help="output directory; one <genome-stem>.kmer_hits.gz per strain")
    md.add_argument("--mesh", default=None,
                    help="DATAxINDEX device mesh for sharded multi-strain "
                    "classification (e.g. 4x2)")

    ms = sub.add_parser(
        "scrub-multi",
        help="kmer_scrub_count for many strains with ONE shared scan of the "
        "-A/-B/-C panels (tables identical to per-strain runs)",
    )
    ms.add_argument("-R", dest="r_list", required=True,
                    help="file listing strain genome FASTAs (one per line)")
    ms.add_argument("-A", dest="a_list", required=True)
    ms.add_argument("-B", dest="b_list", required=True)
    ms.add_argument("-C", dest="c_list", default=None)
    ms.add_argument("-p", dest="p_file", default=None, help="progress output file")
    ms.add_argument("-o", dest="out_dir", required=True,
                    help="output directory; one <genome-stem>.scrub_kmer_counts.tsv per strain")
    ms.add_argument("--checkpoint", dest="checkpoint_dir", default=None,
                    help="checkpoint directory: the shared union panel scan "
                    "resumes at file granularity (bit-identical; keyed to "
                    "the strain set, so a stale checkpoint restarts fresh)")

    fp = sub.add_parser(
        "pipeline",
        help="fused scrub -> filter -> detect -> coverage in one process "
        "(one index build, no TSV round trips; intermediate artifacts "
        "byte-identical to the staged CLIs)",
    )
    fp.add_argument("-r", dest="r_file", required=True, help="strain genome FASTA")
    fp.add_argument("-A", dest="a_list", required=True, help="genome panel list")
    fp.add_argument("-B", dest="b_list", required=True, help="metagenome panel list")
    fp.add_argument("-C", dest="c_list", default=None, help="co-occurring strain list")
    fp.add_argument("-T", dest="target_list", required=True,
                    help="target metagenome batch file (PE/SE/PEI rows)")
    fp.add_argument("-g", dest="background_list", default=None,
                    help="background metagenome list for the detect filter")
    fp.add_argument("-m", dest="min_fraction", type=float, default=0.04,
                    help="filter min_fraction (default 0.04)")
    fp.add_argument("-i", dest="independent", action="store_true",
                    help="independent per-panel scrub")
    fp.add_argument("--min_kmer_hits", type=int, default=1,
                    help="coverage_depth row threshold (default 1)")
    fp.add_argument("--no-intermediates", action="store_true",
                    help="skip writing scrub_kmer_counts.gz / scrubbed_kmers.gz")
    fp.add_argument("-o", dest="out_dir", required=True, help="output directory")
    fp.add_argument("--checkpoint", dest="checkpoint_dir", default=None,
                    help="checkpoint directory: panel counting resumes at "
                    "file granularity, detection at sample granularity "
                    "(bit-identical to an uninterrupted run)")

    fpm = sub.add_parser(
        "pipeline-multi",
        help="fused pipeline for MANY strains: one shared panel scan, "
        "per-strain filters, multi-strain detection (16 strains/pass); "
        "per-strain outputs identical to independent runs",
    )
    fpm.add_argument("-R", dest="r_list", required=True,
                     help="file listing strain genome FASTAs (one per line)")
    fpm.add_argument("-A", dest="a_list", required=True, help="genome panel list")
    fpm.add_argument("-B", dest="b_list", required=True, help="metagenome panel list")
    fpm.add_argument("-C", dest="c_list", default=None, help="co-occurring strain list")
    fpm.add_argument("-T", dest="target_list", required=True,
                     help="target metagenome batch file (PE/SE/PEI rows)")
    fpm.add_argument("-g", dest="background_list", default=None,
                     help="background metagenome list for the detect filter")
    fpm.add_argument("-m", dest="min_fraction", type=float, default=0.04)
    fpm.add_argument("-i", dest="independent", action="store_true")
    fpm.add_argument("--min_kmer_hits", type=int, default=1)
    fpm.add_argument("--no-intermediates", action="store_true")
    fpm.add_argument("-o", dest="out_dir", required=True, help="output directory")
    fpm.add_argument("--checkpoint", dest="checkpoint_dir", default=None,
                     help="checkpoint directory: the shared union panel scan "
                     "resumes at file granularity, each detection pass at "
                     "sample granularity (bit-identical; keyed to the strain "
                     "set and filter config, so stale state restarts fresh)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from strainer2_tpu.pipeline import multi

    if args.cmd == "pangenome":
        multi.run_pangenome(args.a_list, ref_file=args.ref_file,
                            write_dist=args.write_dist, k=args.seed, out=sys.stdout)
    elif args.cmd == "kmer-matrix":
        multi.run_kmer_matrix(args.a_list, k=args.seed, out=sys.stdout)
    elif args.cmd == "strain-track":
        multi.run_strain_track(args.a_list, args.b_file, k=args.seed,
                               print_track=not args.no_track,
                               max_reads=args.max_reads, out=sys.stdout)
    elif args.cmd == "detect-multi":
        import os

        import numpy as np

        from strainer2_tpu.index.build import StrainIndex, scan_file_codes
        from strainer2_tpu.pipeline.engine import KmerEngine
        from strainer2_tpu.pipeline.fused import _stem
        from strainer2_tpu.pipeline.multi_detect import (
            MAX_STRAINS_PER_PASS,
            MultiStrainDetector,
            device_mem_budget,
            projected_rows_bytes,
        )

        strains = []
        with open(args.strain_list) as f:
            for line in f:
                if line.strip() and not line.startswith("#"):
                    r, a = line.rstrip("\n").split("\t")[:2]
                    strains.append((r, a))
        os.makedirs(args.out_dir, exist_ok=True)
        cfg = None
        n_index = 1
        if args.mesh:
            from strainer2_tpu.pipeline.detect import DetectConfig

            d, i = args.mesh.lower().split("x")
            cfg = DetectConfig(mesh=(int(d), int(i)))
            n_index = int(i)
        # passes sized by strain count AND the EXACT union row-table
        # bytes (same greedy cut as multi_detect.plan_strain_passes_from_
        # codes): each genome is scanned ONCE, and the scanned index —
        # table-less until a lookup needs it — is retained and handed to
        # the detector, so planning costs no second read of any genome.
        # Related strains share most k-mers, so the old sum-of-sizes
        # bound split work that fits one pass and re-streamed the targets.
        eng = KmerEngine(31)
        budget = device_mem_budget()
        if budget is not None:
            budget = int(budget) * max(1, n_index)

        def run_pass(chunk, idxs):
            det = MultiStrainDetector(chunk, cfg=cfg,
                                      background_list=args.background_list,
                                      indexes=idxs)
            outs = [
                os.path.join(args.out_dir, _stem(r) + ".kmer_hits.gz")
                for r, _ in chunk
            ]
            det.quantify_all(outs, args.batch_list)

        chunk, idxs, union = [], [], None
        for r, a in strains:
            ix = StrainIndex.from_scan_codes(scan_file_codes(r, eng), k=31)
            cand = (np.unique(ix.codes) if union is None
                    else np.union1d(union, ix.codes))
            if chunk and (
                len(chunk) >= MAX_STRAINS_PER_PASS
                or (budget is not None and projected_rows_bytes(
                    cand.shape[0], len(chunk) + 1) > budget)
            ):
                run_pass(chunk, idxs)
                chunk, idxs = [], []
                cand = np.unique(ix.codes)
            chunk.append((r, a))
            idxs.append(ix)
            union = cand
        if chunk:
            run_pass(chunk, idxs)
    elif args.cmd == "scrub-multi":
        import os

        from strainer2_tpu.pipeline.fused import _stem
        from strainer2_tpu.pipeline.multi_scrub import run_multi_scrub
        from strainer2_tpu.pipeline.scrub_count import read_list_file

        r_files = [p for p in read_list_file(args.r_list) if p]
        os.makedirs(args.out_dir, exist_ok=True)
        progress = open(args.p_file, "w") if args.p_file else None
        if progress:
            progress.write("adding kmer counts for:\n")
        outs = []
        for r in r_files:
            outs.append(open(os.path.join(args.out_dir, _stem(r) + ".scrub_kmer_counts.tsv"), "w"))
        try:
            run_multi_scrub(r_files, args.a_list, args.b_list, args.c_list, outs,
                            progress=progress, checkpoint_dir=args.checkpoint_dir)
        finally:
            for o in outs:
                o.close()
            if progress:
                progress.close()
    elif args.cmd == "pipeline":
        from strainer2_tpu.pipeline.fused import FusedConfig, run_pipeline

        paths = run_pipeline(
            args.r_file, args.a_list, args.b_list, args.target_list,
            args.out_dir, c_list=args.c_list,
            background_list=args.background_list,
            checkpoint_dir=args.checkpoint_dir,
            fused_cfg=FusedConfig(
                min_fraction=args.min_fraction,
                independent=args.independent,
                min_kmer_hits=args.min_kmer_hits,
                write_counts=not args.no_intermediates,
                write_scrubbed=not args.no_intermediates,
            ),
        )
        for k, v in paths.items():
            if v:
                print(f"{k}\t{v}", file=sys.stderr)
    elif args.cmd == "pipeline-multi":
        from strainer2_tpu.pipeline.fused import FusedConfig, run_multi_pipeline
        from strainer2_tpu.pipeline.scrub_count import read_list_file

        r_files = read_list_file(args.r_list)
        if not r_files:
            print(f"error: no strain genomes listed in {args.r_list}", file=sys.stderr)
            return 1
        all_paths = run_multi_pipeline(
            r_files, args.a_list, args.b_list,
            args.target_list, args.out_dir, c_list=args.c_list,
            background_list=args.background_list,
            checkpoint_dir=args.checkpoint_dir,
            fused_cfg=FusedConfig(
                min_fraction=args.min_fraction,
                independent=args.independent,
                min_kmer_hits=args.min_kmer_hits,
                write_counts=not args.no_intermediates,
                write_scrubbed=not args.no_intermediates,
            ),
        )
        for paths in all_paths:
            for k, v in paths.items():
                if v:
                    print(f"{k}\t{v}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
