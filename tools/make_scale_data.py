"""Generate the scaled benchmark dataset used by docs/PERFORMANCE.md.

Rebuilds, deterministically, the "20x panel+target scale" workload the
performance tables reference (the reference's real runs are 16-68 minutes
of panel scanning per strain, /root/reference/src/kmer_scrub_count.c:19-20;
the bundled toy example is ~100x smaller than that shape):

  * panel genomes list  = FACTOR copies of the bundled panel genome
  * panel metagenomes   = FACTOR copies of EACH bundled metagenome file
    (3*FACTOR files; at FACTOR=20 the scrub scan covers ~272M valid windows)
  * target batch        = FACTOR copies of the bundled PE+SE samples
    (2*FACTOR samples)
  * optionally, --strains S related strain genomes: the base strain genome
    with per-strain deterministic SNPs (default rate 0.002 — the ~0.1-1%
    divergence of real conspecific strains), so multi-strain unions stay
    mostly shared, like the Snakemake fan-out workloads the multi-pass
    engine replaces (/root/reference/test/Snakemake.strain_detect:23-24)

Files are copied (hardlinked when possible) under distinct names so every
pipeline stage does real per-file I/O work.

Usage:
  python tools/make_scale_data.py --src /tmp/data --dest /tmp/scale20 \
      [--factor 20] [--strains 32] [--snp-rate 0.002]
"""

from __future__ import annotations

import argparse
import gzip
import os
import shutil


STRAIN_A = "Bacteroides_ovatus_1001283st1_B8_1001283B150210_160208"
STRAIN_B = "Bacteroides_ovatus_1001302st1_D4_1001302B_160321"
METAS = [
    "1001099B_150804_B6_s09_tiny_PE1.fasta.gz",
    "1001283B150225_150804_H5_s07_tiny_PE1.fasta.gz",
    "1001283B150225_150804_H5_s07_tiny_PE2.fasta.gz",
]


def _place(src: str, dst: str) -> None:
    if os.path.exists(dst):
        return
    try:
        os.link(src, dst)
    except OSError:
        shutil.copyfile(src, dst)


def _mutate_genome(src: str, dst: str, seed: int, snp_rate: float) -> None:
    """Write a related strain: per-base SNPs at snp_rate, deterministic in
    ``seed``.  Headers and line layout are preserved; only A/C/G/T bases
    mutate (to a different base), so N handling and record structure stay
    identical to the source genome."""
    if os.path.exists(dst):
        return
    import numpy as np

    rng = np.random.default_rng(seed)
    out_lines = []
    with gzip.open(src, "rt") as f:
        for line in f:
            if line.startswith(">"):
                out_lines.append(f">{os.path.basename(dst)}|{line[1:]}")
                continue
            seq = np.frombuffer(line.rstrip("\n").upper().encode(), dtype=np.uint8).copy()
            is_base = np.isin(seq, np.frombuffer(b"ACGT", dtype=np.uint8))
            hit = is_base & (rng.random(seq.size) < snp_rate)
            idx = np.flatnonzero(hit)
            if idx.size:
                lut = np.frombuffer(b"ACGT", dtype=np.uint8)
                cur = seq[idx]
                # shift 1..3 positions in ACGT order: always a different base
                cur_code = np.searchsorted(lut, cur)  # ACGT is sorted
                new_code = (cur_code + rng.integers(1, 4, idx.size)) % 4
                seq[idx] = lut[new_code]
            out_lines.append(seq.tobytes().decode() + "\n")
    with gzip.open(dst, "wt", compresslevel=6) as f:
        f.writelines(out_lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", default="/tmp/data",
                    help="bundled toy dataset (a copy of /root/reference/test)")
    ap.add_argument("--dest", default="/tmp/scale20")
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--strains", type=int, default=0,
                    help="also generate N related strain genomes (SNP variants)")
    ap.add_argument("--snp-rate", type=float, default=0.002)
    args = ap.parse_args()

    src, dest, f = args.src, args.dest, args.factor
    os.makedirs(os.path.join(dest, "metagenomes"), exist_ok=True)
    os.makedirs(os.path.join(dest, "strains"), exist_ok=True)

    for s in (STRAIN_A, STRAIN_B):
        _place(os.path.join(src, "strains", s + ".fna.gz"),
               os.path.join(dest, "strains", s + ".fna.gz"))

    with open(os.path.join(dest, "genomes_to_scrub.txt"), "w") as out:
        for i in range(f):
            name = f"strains/panel_{i:02d}_{STRAIN_B}.fna.gz"
            _place(os.path.join(src, "strains", STRAIN_B + ".fna.gz"),
                   os.path.join(dest, name))
            out.write(name + "\n")

    with open(os.path.join(dest, "metagenomes_to_scrub.txt"), "w") as out:
        for i in range(f):
            for m in METAS:
                name = f"metagenomes/scrub_{i:02d}_{m}"
                _place(os.path.join(src, "metagenomes", m),
                       os.path.join(dest, name))
                out.write(name + "\n")

    with open(os.path.join(dest, "target_metagenomes.txt"), "w") as out:
        for i in range(f):
            pe1 = f"metagenomes/tgt_{i:02d}_{METAS[1]}"
            pe2 = f"metagenomes/tgt_{i:02d}_{METAS[2]}"
            se = f"metagenomes/tgt_{i:02d}_{METAS[0]}"
            _place(os.path.join(src, "metagenomes", METAS[1]),
                   os.path.join(dest, pe1))
            _place(os.path.join(src, "metagenomes", METAS[2]),
                   os.path.join(dest, pe2))
            _place(os.path.join(src, "metagenomes", METAS[0]),
                   os.path.join(dest, se))
            out.write(f"PE\t{pe1}\t{pe2}\n")
            out.write(f"SE\t{se}\n")

    if args.strains:
        base = os.path.join(src, "strains", STRAIN_A + ".fna.gz")
        with open(os.path.join(dest, "strain_genomes.txt"), "w") as out:
            for s in range(args.strains):
                name = f"strains/variant_{s:03d}_{STRAIN_A}.fna.gz"
                print(f"strain variant {s}...", flush=True)
                _mutate_genome(base, os.path.join(dest, name),
                               seed=1000 + s, snp_rate=args.snp_rate)
                out.write(name + "\n")

    print(f"dataset ready under {dest}")


if __name__ == "__main__":
    main()
