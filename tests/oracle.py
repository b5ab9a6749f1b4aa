"""Brute-force NumPy / pure-Python oracles used to validate device kernels.

These intentionally re-state the reference semantics in the most literal
way possible (per-window string building, python dicts) so kernel tests
compare an independent implementation, not the kernel against itself.
"""

import numpy as np

COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def revcomp(s: str) -> str:
    return "".join(COMP.get(c, "N") for c in reversed(s))


def canonical_kmer(s: str) -> str:
    """Reference rule: lexicographically greater of fwd/rc, fwd wins ties
    (reference src/genome_compare.c:1100-1141)."""
    rc = revcomp(s)
    return s if s >= rc else rc


def kmer_to_code(s: str) -> int:
    code = 0
    for c in s:
        code = (code << 2) | CODE[c]
    return code


def code_to_kmer(code: int, k: int) -> str:
    return "".join("ACGT"[(code >> (2 * (k - 1 - i))) & 3] for i in range(k))


def windows_of(seq: str, k: int):
    """Yield (offset, window) for each window of a sequence string."""
    for i in range(len(seq) - k + 1):
        yield i, seq[i : i + k]


def canonical_codes_of_seq(seq: str, k: int):
    """List of (valid, canonical_code) per window; invalid if any non-ACGT."""
    out = []
    for _, w in windows_of(seq, k):
        if any(c not in "ACGT" for c in w):
            out.append((False, 0))
        else:
            out.append((True, kmer_to_code(canonical_kmer(w))))
    return out


def seq_to_base_codes(seq: str) -> np.ndarray:
    return np.array([CODE.get(c, 4) for c in seq], dtype=np.uint8)


def random_dna(rng: np.random.Generator, n: int, n_prob: float = 0.0) -> str:
    bases = rng.choice(list("ACGT"), size=n)
    if n_prob > 0:
        mask = rng.random(n) < n_prob
        bases[mask] = "N"
    return "".join(bases)
