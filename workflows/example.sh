#!/usr/bin/env bash
# End-to-end strain-detection example (drop-in equivalent of reference
# test/example.sh: same 4 stages and file formats; outputs byte-identical
# to the reference binaries').
#
# Usage: ./example.sh <test_data_dir> <output_dir> [strain_stem]
#   test_data_dir must contain strains/, metagenomes/ and the three list
#   files (genomes_to_scrub.txt, metagenomes_to_scrub.txt,
#   target_metagenomes.txt) with paths relative to itself.
#   strain_stem defaults to the first strains/*.fna.gz.
set -euo pipefail

DATA=${1:?usage: example.sh <test_data_dir> <output_dir> [strain_stem]}
OUT=${2:?usage: example.sh <test_data_dir> <output_dir> [strain_stem]}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# repo only: TPU sitecustomize injection would override JAX_PLATFORMS;
# set STRAINER2_PLATFORM (and extend PYTHONPATH) to target specific hardware
export PYTHONPATH="$REPO"
export JAX_PLATFORMS="${STRAINER2_PLATFORM:-}"

cd "$DATA"
if [ $# -ge 3 ]; then
    STRAIN=$3
else
    STRAIN=$(basename "$(ls strains/*.fna.gz | head -1)" .fna.gz)
fi
mkdir -p "$OUT"
echo "strain: $STRAIN"

echo 'STEP1: kmer_scrub_count (panel k-mer frequencies for the target genome)'
python -m strainer2_tpu.cli.kmer_scrub_count \
    -r "strains/$STRAIN.fna.gz" \
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
    -r "strains/$STRAIN.fna.gz" \
    -a "$OUT/$STRAIN.scrubbed_kmers.gz" \
    -B target_metagenomes.txt \
    -o "$OUT/$STRAIN.kmer_hits.gz"
echo 'STEP3: complete'

echo 'STEP4: coverage / depth metrics'
cp "$OUT/$STRAIN.kmer_hits.gz" "$OUT/tmp_$STRAIN.kmer_hits.gz"
python -m strainer2_tpu.cli.coverage_depth \
    -k "$OUT/$STRAIN.kmer_hits.gz" > "$OUT/$STRAIN.coverage_depth"
rm -f "$OUT/tmp_$STRAIN.kmer_hits.gz"
echo 'STEP4: complete'
cat "$OUT/$STRAIN.coverage_depth"
