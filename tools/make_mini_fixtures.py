#!/usr/bin/env python3
"""Generate the miniature parity fixtures in tests/golden/mini/.

Builds small synthetic FASTA/FASTQ inputs, then (when the reference
binaries are available, e.g. compiled from the read-only reference mount
into a scratch dir) runs the reference pipeline over them and stores the
byte-exact expected outputs.  The fixtures and expected outputs are
committed, so the test suite never needs the reference itself.

Usage:
    python tools/make_mini_fixtures.py [--ref-bin /tmp/ref_build] \
        [--ref-scripts /root/reference/scripts]
"""

import argparse
import gzip
import os
import random
import shutil
import subprocess
import sys

MINI = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "golden", "mini")


def wfa(path, records, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i : i + 70] + "\n")


def wfq(path, records, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for name, seq in records:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def dna(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, seq, rate):
    out = list(seq)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = rng.choice("ACGT")
    return "".join(out)


def reads_from(rng, seq, n, lo=55, hi=90, rc_prob=0.5, n_prob=0.01):
    comp = str.maketrans("ACGTN", "TGCAN")
    out = []
    for i in range(n):
        ln = rng.randint(lo, hi)
        start = rng.randint(0, max(0, len(seq) - ln))
        r = seq[start : start + ln]
        if rng.random() < rc_prob:
            r = r.translate(comp)[::-1]
        if rng.random() < 0.3:
            r = "".join("N" if rng.random() < n_prob else c for c in r)
        out.append((f"read_{i}", r))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-bin", default="/tmp/ref_build")
    ap.add_argument("--ref-scripts", default="/root/reference/scripts")
    args = ap.parse_args()

    data = os.path.join(MINI, "data")
    exp = os.path.join(MINI, "expected")
    shutil.rmtree(MINI, ignore_errors=True)
    os.makedirs(data)
    os.makedirs(exp)

    rng = random.Random(20260817)

    # strain genome: 2 contigs (one with Ns) plus a small 40bp contig.
    # NOTE: contigs shorter than k would crash the *reference*
    # (size_t underflow in GEN_hash_sequences_set_count_vec, reference
    # src/genome_compare.c:1000 — SURVEY.md §2.2), so the golden fixtures
    # avoid them; our engine guards and is tested separately.
    contig1 = dna(rng, 900)
    contig2 = dna(rng, 500)
    contig2 = contig2[:100] + "N" + contig2[101:240] + "NN" + contig2[242:]
    strain = [("c1", contig1), ("c2", contig2), ("small", dna(rng, 40))]
    wfa(f"{data}/strainA.fna.gz", strain, gz=True)

    # panel genomes: share long stretches with the strain
    pan1 = [("p1", mutate(rng, contig1[:600], 0.01) + dna(rng, 200))]
    pan2 = [("p2", contig2[:300] + dna(rng, 400)),
            ("p2b", mutate(rng, contig1[300:700], 0.002))]
    wfa(f"{data}/panel1.fna.gz", pan1, gz=True)
    wfa(f"{data}/panel2.fna", pan2)  # plain file: reader transparency

    # scrub metagenomes: reads drawn from strain + random
    meta1 = reads_from(rng, contig1 + contig2, 120) + reads_from(rng, dna(rng, 2000), 80)
    wfa(f"{data}/scrubmeta1.fasta.gz", meta1, gz=True)

    # drug (co-occurring strain) panel: includes the reference itself (skip
    # logic) and a genome overlapping the strain
    drug1 = [("d1", contig1[200:420] + dna(rng, 100))]
    wfa(f"{data}/drug1.fna.gz", drug1, gz=True)

    # target metagenomes: PE pair (fasta.gz), SE (fastq), PEI (interleaved)
    src = contig1 + "NN" + contig2
    pe1 = reads_from(rng, src, 150) + reads_from(rng, dna(rng, 3000), 100)
    pe2 = reads_from(rng, src, 150) + reads_from(rng, dna(rng, 3000), 100)
    pe2 = [(n, s) for (n, s) in pe2]
    # give some sub-k reads to exercise skip paths (kept at matching indices
    # so PE files stay aligned)
    pe1[10] = ("read_10", dna(rng, 12))
    pe2[20] = ("read_20", dna(rng, 9))
    wfa(f"{data}/target_PE1.fasta.gz", pe1, gz=True)
    wfa(f"{data}/target_PE2.fasta.gz", pe2, gz=True)
    se = reads_from(rng, contig2 + dna(rng, 1500), 120)
    wfq(f"{data}/target_SE.fastq", se)
    pei = []
    for a, b in zip(reads_from(rng, src, 60), reads_from(rng, src, 60)):
        pei.append(a)
        pei.append(b)
    wfa(f"{data}/target_PEI.fasta", pei)
    # background metagenome for -g
    bg = reads_from(rng, contig1, 100)
    wfa(f"{data}/background1.fasta.gz", bg, gz=True)

    with open(f"{data}/genomes.txt", "w") as f:
        f.write("data/panel1.fna.gz\ndata/panel2.fna\n")
    with open(f"{data}/metagenomes.txt", "w") as f:
        f.write("data/scrubmeta1.fasta.gz\n")
    with open(f"{data}/drugs.txt", "w") as f:
        f.write("data/strainA.fna.gz\ndata/drug1.fna.gz\n")
    with open(f"{data}/targets.txt", "w") as f:
        f.write("# comment line\n")
        f.write("PE\tdata/target_PE1.fasta.gz\tdata/target_PE2.fasta.gz\n")
        f.write("SE\tdata/target_SE.fastq\n")
        f.write("PEI\tdata/target_PEI.fasta\n")
        f.write("XX\tdata/target_SE.fastq\n")  # unknown type: skipped w/ message
    with open(f"{data}/background.txt", "w") as f:
        f.write("data/background1.fasta.gz\n")

    # ---- run the reference over the fixtures ----
    rb = args.ref_bin
    if not os.path.exists(os.path.join(rb, "kmer_scrub_count")):
        print("reference binaries not found; fixtures written, no goldens", file=sys.stderr)
        return

    def run(cmd, out=None, cwd=MINI):
        with open(out, "wb") if out else subprocess.DEVNULL as o:
            r = subprocess.run(cmd, cwd=cwd, stdout=o if out else None,
                               stderr=subprocess.PIPE)
        if r.returncode != 0:
            sys.exit(f"FAILED: {cmd}\n{r.stderr.decode()}")
        return r

    ksc = os.path.join(rb, "kmer_scrub_count")
    sd = os.path.join(rb, "strain_detect")
    gc = os.path.join(rb, "genome_compare")

    run([ksc, "-r", "data/strainA.fna.gz", "-A", "data/genomes.txt",
         "-B", "data/metagenomes.txt", "-p", "expected/scrub.progress"],
        out=f"{exp}/scrub_counts.tsv")
    run([ksc, "-r", "data/strainA.fna.gz", "-A", "data/genomes.txt",
         "-B", "data/metagenomes.txt", "-C", "data/drugs.txt"],
        out=f"{exp}/scrub_counts_drug.tsv")

    for name in ("scrub_counts", "scrub_counts_drug"):
        with open(f"{exp}/{name}.tsv", "rb") as i, gzip.open(f"{exp}/{name}.gz", "wb") as o:
            o.write(i.read())

    filt = os.path.join(args.ref_scripts, "kmer_scrub_filter.py")
    run([sys.executable, filt, "-s", f"{exp}/scrub_counts.gz", "-m", "0.05"],
        out=f"{exp}/scrubbed_m05.txt")
    run([sys.executable, filt, "-s", f"{exp}/scrub_counts.gz", "-m", "0.3"],
        out=f"{exp}/scrubbed_m30.txt")
    run([sys.executable, filt, "-s", f"{exp}/scrub_counts_drug.gz", "-m", "0.05"],
        out=f"{exp}/scrubbed_drug_m05.txt")
    run([sys.executable, filt, "-s", f"{exp}/scrub_counts.gz", "-m", "0.05", "-i"],
        out=f"{exp}/scrubbed_indep_m05.txt")

    run([sd, "-r", "data/strainA.fna.gz", "-a", "expected/scrubbed_m05.txt",
         "-B", "data/targets.txt", "-o", "expected/kmer_hits.gz"],
        out=f"{exp}/detect_stdout.txt")
    run([sd, "-r", "data/strainA.fna.gz", "-a", "expected/scrubbed_m05.txt",
         "-B", "data/targets.txt", "-g", "data/background.txt",
         "-o", "expected/kmer_hits_bg.gz"],
        out=f"{exp}/detect_bg_stdout.txt")
    run([sd, "-r", "data/strainA.fna.gz", "-a", "expected/scrubbed_m05.txt",
         "-b", "data/target_PE1.fasta.gz", "-c", "data/target_PE2.fasta.gz",
         "-t", "PE", "-o", "expected/kmer_hits_single.gz"],
        out=f"{exp}/detect_single_stdout.txt")

    # decompress hit files for stable diffing
    for name in ("kmer_hits", "kmer_hits_bg", "kmer_hits_single"):
        with gzip.open(f"{exp}/{name}.gz", "rb") as i, open(f"{exp}/{name}.txt", "wb") as o:
            o.write(i.read())
        os.remove(f"{exp}/{name}.gz")

    cov = os.path.join(args.ref_scripts, "coverage_depth.py")
    os.link(f"{exp}/kmer_hits.txt", f"{MINI}/strainA_x.kmer_hits.txt")
    with open(f"{exp}/kmer_hits_regz.gz", "wb") as _:
        pass
    os.remove(f"{exp}/kmer_hits_regz.gz")
    with open(f"{MINI}/strainA_x.kmer_hits.txt", "rb") as i, gzip.open(
        f"{MINI}/strainA_x.kmer_hits.gz", "wb"
    ) as o:
        o.write(i.read())
    os.remove(f"{MINI}/strainA_x.kmer_hits.txt")
    run([sys.executable, cov, "-k", "strainA_x.kmer_hits.gz"],
        out=f"{exp}/coverage_depth.tsv")
    run([sys.executable, cov, "-k", "strainA_x.kmer_hits.gz", "-m", "5"],
        out=f"{exp}/coverage_depth_m5.tsv")
    run([sys.executable, cov, "-k", "strainA_x.kmer_hits.gz",
         "-b", "data/background.txt"],
        out=f"{exp}/coverage_depth_bg.tsv")
    os.remove(f"{MINI}/strainA_x.kmer_hits.gz")

    # genome_compare goldens (auxiliary tool; variable k, rapid mode)
    with open(f"{data}/compare_list.txt", "w") as f:
        f.write("data/panel1.fna.gz\ndata/panel2.fna\ndata/strainA.fna.gz\n")
    run([gc, "-a", "data/strainA.fna.gz", "-b", "data/panel1.fna.gz", "-H"],
        out=f"{exp}/gc_single.txt")
    run([gc, "-a", "data/strainA.fna.gz", "-B", "data/compare_list.txt",
         "-s", "17"], out=f"{exp}/gc_list_s17.txt")
    run([gc, "-a", "data/strainA.fna.gz", "-B", "data/compare_list.txt",
         "-r", "300", "-t", "0.5"], out=f"{exp}/gc_rapid.txt")
    run([gc, "-a", "data/strainA.fna.gz", "-B", "data/compare_list.txt", "-S"],
        out=f"{exp}/gc_strainmode.txt")

    # scrub progress file contains timestamps -> keep only the path column
    with open(f"{exp}/scrub.progress") as f:
        lines = [l.split("\t")[0] for l in f]
    with open(f"{exp}/scrub.progress", "w") as f:
        f.write("\n".join(lines) + "\n")

    print("fixtures + goldens written to", MINI)


if __name__ == "__main__":
    main()
