"""Coverage/depth metrics (coverage_depth equivalent).

Faithful reimplementation of the reference script's semantics (reference
scripts/coverage_depth.py): rows of the strain_detect hits file whose
total k-mer count (PE1+PE2) strictly exceeds min_kmer_hits contribute to
per-metagenome depth (all rows) and coverage (distinct k-mers); the '#'
summary lines provide the denominators.  Output row order follows the
reference's dict-insertion order: metagenomes with hits first (row order),
then zero-hit metagenomes in summary-line order.
"""

from __future__ import annotations

import os
import re
import sys
from typing import IO

from strainer2_tpu.io.fastx import open_maybe_gzip

__all__ = ["run_coverage_depth"]

_HEADER = (
    "strain_name\tspecies_name\tgenus_name\tgenome_num_total_kmers\t"
    "genome_num_informative_kmers\tmetagenome\tnum_metagenomic_reads\t"
    "num_metagenome_kmers\tunique_observed_informative_kmers\t"
    "total_observed_informative_kmers\tkmer_coverage\tkmer_depth\t"
    "kmer_depth_per_20B_kmer\tbackground"
)

KMER_SCALE_CONSTANT = 2_000_000_000  # reference coverage_depth.py:258


def _strain_names(kmer_hits_file: str) -> tuple[str, str, str]:
    strain = re.sub(r".kmer_hits.gz$", "", os.path.basename(kmer_hits_file))
    pieces = strain.split("_")
    species = pieces[0] + "_" + pieces[1] if len(pieces) > 1 else strain
    return strain, species, pieces[0]


def run_coverage_depth(
    kmer_hits_file: str,
    min_kmer_hits: int = 1,
    background_metagenomes_file: str | None = None,
    out: IO | None = None,
) -> None:
    out = out if out is not None else sys.stdout

    depth: dict[str, int] = {}
    coverage: dict[str, int] = {}
    seen_unique: set[str] = set()
    kmer_eval: dict[str, int] = {}
    read_eval: dict[str, int] = {}
    genome_kmer: dict[str, int] = {}
    genome_inf: dict[str, int] = {}

    with open_maybe_gzip(kmer_hits_file) as f:
        for raw in f:
            line = raw.decode()
            if not line.startswith("#"):
                content = line.rstrip("\n").split("\t")
                sample = os.path.basename(content[0])
                total_kmer = int(content[1]) + int(content[3])
                kmer_seq = content[5]
                # strict '>' — reference coverage_depth.py:89
                if total_kmer > min_kmer_hits:
                    uniq = sample + kmer_seq
                    if uniq not in seen_unique:
                        coverage[sample] = coverage.get(sample, 0) + 1
                        seen_unique.add(uniq)
                    depth[sample] = depth.get(sample, 0) + 1
            else:
                pieces = line.rstrip().split("\t")
                sample = re.sub("^#", "", os.path.basename(pieces[0]))
                variable, value = pieces[1], int(pieces[2])
                if variable == "total_kmer_evaluated":
                    kmer_eval[sample] = value
                elif variable == "total_reads_evaluated":
                    read_eval[sample] = value
                elif variable == "total_genome_kmers":
                    genome_kmer[sample] = value
                elif variable == "total_genome_informative_kmers":
                    genome_inf[sample] = value

    # metagenomes with stats but no passing rows get explicit zeros, in
    # stats order (reference coverage_depth.py:121-124)
    for sample in kmer_eval:
        if not depth.get(sample):
            coverage[sample] = 0
            depth[sample] = 0

    background = set()
    if background_metagenomes_file:
        with open(background_metagenomes_file) as f:
            background = {line.rstrip("\n") for line in f}

    strain, species, genus = _strain_names(kmer_hits_file)

    out.write(_HEADER + "\n")
    for sample in depth:
        n_depth = depth.get(sample, -1)
        n_cov = coverage.get(sample, -1)
        n_eval = kmer_eval.get(sample, -1)
        # gated on kmer_eval membership; defaultdict semantics give 0 when
        # the reads line is absent (reference coverage_depth.py:247-248)
        n_reads = read_eval.get(sample, 0) if sample in kmer_eval else -1
        n_gk = genome_kmer.get(sample, -1)
        n_gi = genome_inf.get(sample, -1)

        kmer_coverage = n_cov / float(n_gi)
        kmer_depth = n_depth / float(n_gi)
        if n_eval == 0:
            depth_scale = 0
        else:
            depth_scale = kmer_depth * (KMER_SCALE_CONSTANT / float(n_eval))

        bg = 1 if sample in background else 0
        out.write(
            f"{strain}\t{species}\t{genus}\t{n_gk}\t{n_gi}\t{sample}\t{n_reads}\t"
            f"{n_eval}\t{n_cov}\t{n_depth}\t{kmer_coverage}\t{kmer_depth}\t"
            f"{depth_scale}\t{bg}\n"
        )
