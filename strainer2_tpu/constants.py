"""Global constants for the strainer2-tpu engine.

Mirrors the behavior-defining constants of the reference implementation
(jeremiahfaith/strainer2) while re-architecting the data layout for TPU:

- k-mers are 2-bit packed integers, not strings (the reference's abandoned
  up2bit sketch made primary; see reference src/up2bit.c:53-69).
- Base encoding is A=0, C=1, G=2, T=3 (MSB-first packing) so that numeric
  comparison of packed codes equals lexicographic comparison of the ACGT
  strings the reference compares with strcmp (reference
  src/genome_compare.c:505, 1108-1141).
"""

# Default k-mer length. Hard-coded in the reference pipeline binaries
# (reference src/kmer_scrub_count.c:39, src/strain_detect.c:78).
DEFAULT_K = 31

# Maximum k supported by the 62/64-bit packed representation.
MAX_K = 32

# Base codes. Order chosen so packed-code order == ASCII string order.
BASE_A = 0
BASE_C = 1
BASE_G = 2
BASE_T = 3
# Any character that is not A/C/G/T (case-insensitive) maps to INVALID_BASE.
# This covers 'N' (which the reference rejects per-window via contains_N,
# reference src/genome_compare.c:443-451) and is also used as the padding /
# read-separator code in packed host buffers so that windows crossing a read
# boundary are automatically masked out.
INVALID_BASE = 4

# Number of count columns in the kmer_scrub_count table:
# {reference_count, pangenome_count, metagenome_count, drug_count}
# (reference src/kmer_scrub_count.c:43).
SCRUB_COLUMNS = 4
COL_REFERENCE = 0
COL_PANGENOME = 1
COL_METAGENOME = 2
COL_DRUG = 3

# strain_detect k-mer classes (reference src/strain_detect.c:17-18).
NON_INFORMATIVE_KMER = 1
INFORMATIVE_KMER = 2

# strain_detect pairing modes (reference src/strain_detect.c:19-21).
NOT_PAIRED_END = 0
IS_PAIRED_END = 1
IS_PAIRED_END_INTERLEAVE = 2

# Initial capacity of the reference's open-addressing hash; required to
# replay its output row order exactly (reference src/genome_compare.h:20).
REFERENCE_HASH_INITIAL_CAPACITY = 8_000_000

# Fraction of informative k-mers the background filter tries to demote
# (reference src/strain_detect.c:82).
BACKGROUND_FRACTION_TO_REMOVE = 0.5

ASCII_BY_CODE = "ACGTN"
