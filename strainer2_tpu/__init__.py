"""strainer2-tpu: a TPU-native k-mer counting and strain-detection engine.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
jeremiahfaith/strainer2: canonical k-mer extraction, panel scrub counting,
informative-k-mer filtering, and metagenome strain detection — with the hot
path (2-bit encode, window packing, membership lookup, count accumulation)
running on TPU and a native C++ host data plane for FASTA/FASTQ(.gz)
streaming and reference-compatible output ordering.
"""

__version__ = "0.1.0"
