#!/usr/bin/env bash
# End-to-end strain-detection example on the bundled reference test data
# (drop-in equivalent of reference test/example.sh, same 4 stages and file
# formats; outputs are byte-identical to the reference binaries').
#
# Usage: ./example.sh <test_data_dir> <output_dir>
#   test_data_dir must contain strains/, metagenomes/ and the three list
#   files (genomes_to_scrub.txt, metagenomes_to_scrub.txt,
#   target_metagenomes.txt) with paths relative to itself.
set -euo pipefail

DATA=${1:?usage: example.sh <test_data_dir> <output_dir>}
OUT=${2:?usage: example.sh <test_data_dir> <output_dir>}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STRAIN=Bacteroides_ovatus_1001283st1_B8_1001283B150210_160208
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$OUT"
cd "$DATA"

echo 'STEP1: kmer_scrub_count (panel k-mer frequencies for the target genome)'
python -m strainer2_tpu.cli.kmer_scrub_count \
    -r strains/$STRAIN.fna.gz \
    -A genomes_to_scrub.txt -B metagenomes_to_scrub.txt \
    -p "$OUT/$STRAIN.progress" \
    --checkpoint "$OUT/$STRAIN.ckpt" \
    | gzip --fast > "$OUT/$STRAIN.scrub_kmer_counts.gz"
echo 'STEP1: complete'

echo 'STEP2: keep the 1% rarest k-mers'
python -m strainer2_tpu.cli.kmer_scrub_filter \
    -s "$OUT/$STRAIN.scrub_kmer_counts.gz" -m 0.01 \
    | gzip --fast > "$OUT/$STRAIN.scrubbed_kmers.gz"
echo 'STEP2: complete'

echo 'STEP3: detect informative k-mers in the target metagenomes'
python -m strainer2_tpu.cli.strain_detect \
    -r strains/$STRAIN.fna.gz \
    -a "$OUT/$STRAIN.scrubbed_kmers.gz" \
    -B target_metagenomes.txt \
    -o "$OUT/$STRAIN.kmer_hits.gz"
echo 'STEP3: complete'

echo 'STEP4: coverage / depth metrics'
python -m strainer2_tpu.cli.coverage_depth \
    -k "$OUT/$STRAIN.kmer_hits.gz" > "$OUT/$STRAIN.coverage_depth"
echo 'STEP4: complete'
cat "$OUT/$STRAIN.coverage_depth"
