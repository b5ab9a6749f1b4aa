#!/usr/bin/env bash
# Full-scale parity verification against the reference implementation.
#
# Builds the reference from its read-only mount into a scratch dir, runs
# the complete 4-stage pipeline with BOTH stacks over the bundled test
# data, and byte-compares every output (gzip outputs compared decompressed).
#
# Usage: tools/verify_parity.sh [reference_root] [scratch_dir]
set -euo pipefail

REF=${1:-/root/reference}
SCRATCH=${2:-/tmp/s2_parity}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# NOTE: PYTHONPATH is set to the repo ONLY (not appended): environments that
# inject a TPU sitecustomize via PYTHONPATH force JAX_PLATFORMS back to their
# platform, and this comparison should run on CPU.
export PYTHONPATH="$REPO"
export JAX_PLATFORMS=${JAX_PLATFORMS_OVERRIDE:-cpu}

STRAIN=Bacteroides_ovatus_1001283st1_B8_1001283B150210_160208

mkdir -p "$SCRATCH/build" "$SCRATCH/run"
cp "$REF"/src/* "$SCRATCH/build/"
make -C "$SCRATCH/build" >/dev/null

cd "$SCRATCH/run"
ln -sfn "$REF/test/strains" strains
ln -sfn "$REF/test/metagenomes" metagenomes
cp "$REF"/test/*.txt .

echo "== reference pipeline =="
"$SCRATCH/build/kmer_scrub_count" -r strains/$STRAIN.fna.gz \
    -A genomes_to_scrub.txt -B metagenomes_to_scrub.txt > ref_counts.tsv
gzip -1 -c ref_counts.tsv > ref_counts.gz
python "$REF/scripts/kmer_scrub_filter.py" -s ref_counts.gz -m 0.01 > ref_scrubbed.txt 2>/dev/null
"$SCRATCH/build/strain_detect" -r strains/$STRAIN.fna.gz -a ref_scrubbed.txt \
    -B target_metagenomes.txt -o ref_hits.gz
cp ref_hits.gz "$STRAIN.kmer_hits.gz"
python "$REF/scripts/coverage_depth.py" -k "$STRAIN.kmer_hits.gz" > ref_coverage.tsv 2>/dev/null
rm "$STRAIN.kmer_hits.gz"

echo "== strainer2-tpu pipeline =="
python -m strainer2_tpu.cli.kmer_scrub_count -r strains/$STRAIN.fna.gz \
    -A genomes_to_scrub.txt -B metagenomes_to_scrub.txt > tpu_counts.tsv 2>/dev/null
gzip -1 -c tpu_counts.tsv > tpu_counts.gz
python -m strainer2_tpu.cli.kmer_scrub_filter -s tpu_counts.gz -m 0.01 > tpu_scrubbed.txt 2>/dev/null
python -m strainer2_tpu.cli.strain_detect -r strains/$STRAIN.fna.gz -a tpu_scrubbed.txt \
    -B target_metagenomes.txt -o tpu_hits.gz 2>/dev/null
cp tpu_hits.gz "$STRAIN.kmer_hits.gz"
python -m strainer2_tpu.cli.coverage_depth -k "$STRAIN.kmer_hits.gz" > tpu_coverage.tsv 2>/dev/null
rm "$STRAIN.kmer_hits.gz"

echo "== strainer2-tpu fused one-process pipeline =="
python -m strainer2_tpu.cli.strainer2_tools pipeline -r strains/$STRAIN.fna.gz \
    -A genomes_to_scrub.txt -B metagenomes_to_scrub.txt \
    -T target_metagenomes.txt -m 0.01 -o fused 2>/dev/null

echo "== comparing =="
cmp ref_counts.tsv tpu_counts.tsv && echo "scrub count table: IDENTICAL"
cmp ref_scrubbed.txt tpu_scrubbed.txt && echo "informative k-mer set: IDENTICAL"
cmp <(zcat ref_hits.gz) <(zcat tpu_hits.gz) && echo "detection hits payload: IDENTICAL"
cmp ref_coverage.tsv tpu_coverage.tsv && echo "coverage/depth metrics: IDENTICAL"
cmp ref_counts.tsv <(zcat "fused/$STRAIN.scrub_kmer_counts.gz") && echo "fused counts: IDENTICAL"
cmp ref_scrubbed.txt <(zcat "fused/$STRAIN.scrubbed_kmers.gz") && echo "fused informative set: IDENTICAL"
cmp <(zcat ref_hits.gz) <(zcat "fused/$STRAIN.kmer_hits.gz") && echo "fused hits payload: IDENTICAL"
cmp ref_coverage.tsv "fused/$STRAIN.coverage_depth" && echo "fused coverage/depth metrics: IDENTICAL"
echo "ALL STAGES BYTE-IDENTICAL"
