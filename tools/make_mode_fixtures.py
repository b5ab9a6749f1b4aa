#!/usr/bin/env python3
"""Regenerate tests/golden/mini/expected/modes/ from the reference library.

The reference ships no binaries for its pangenome / kmer-matrix /
strain-track modes (commented-out Makefile targets), so goldens are
produced by compiling tiny harness mains against the reference's object
files in a scratch build (see tools/make_mini_fixtures.py for the base
fixtures).  Requires the reference objects at --ref-build.

Harness sources (write them next to the objects and compile with
  gcc -O2 -I$REF -o NAME NAME.c $REF/{genome_compare,BIO_sequence,BIO_hash,up2bit}.o -lz -lm):

  pangenome_main.c:  GEN_hash_all_sequences_pangenome(argv[1], 31,
                     argv[2][0]=='-' ? 0 : argv[2], atoi(argv[3]));
  kmermat_main.c:    GEN_hash_all_sequences_kmer_mat(argv[1], 31);
  straintrack_main.c:GEN_hash_all_sequences_set_count_metagenomics(
                     argv[1], argv[2], 31, atoi(argv[3]), atoi(argv[4]));

Invocation recorded for reproducibility (cwd = tests/golden/mini unless noted):
  pangenome_main data/pangenomes.txt data/strainA.fna.gz 0 > expected/modes/pangenome_ref_stdout.txt
  pangenome_main data/pangenomes.txt - 1                  > expected/modes/pangenome_all_stdout.txt
  kmermat_main data/pangenomes.txt                        > expected/modes/kmer_matrix.tsv
  # strain-track runs in a staging dir with local (slash-free) filenames,
  # because the reference builds track paths by naive concatenation:
  straintrack_main strains2.txt scrubmeta1.fasta.gz 1 0   > expected/modes/strain_track_stdout.txt
  straintrack_main strains2.txt scrubmeta1.fasta.gz 0 60  > expected/modes/strain_track_m100_stdout.txt

Note: the strain-track metagenome must not contain reads shorter than k
and strain genomes must not contain contigs shorter than k — those crash
the *reference* (size_t underflow, SURVEY.md §2.2); our engine guards.
"""

if __name__ == "__main__":
    raise SystemExit(__doc__)
