"""Informative-k-mer selection (kmer_scrub_filter equivalent).

Reimplements the reference script's semantics exactly but vectorized
(reference scripts/kmer_scrub_filter.py):

- joint scrub (default): score every strain k-mer by max(pangenome
  frequency, metagenome frequency), sort descending with *stable* tie
  order (= input row order), and remove top scorers while
  (1 - (n_scrubbed+1)/all_kmers) > min_fraction.  Because the score is
  monotone along the sorted order, the removal count is a single
  vectorized comparison.  Survivors print in input row order (the
  reference's dict-insertion order).
- drug scrub: first delete k-mers seen in co-occurring strains
  (drug count > 0), aborting if < 2*min_fraction remain.
- independent scrub: per-panel count thresholds via the reference's
  escalating-threshold loop (including its stderr progress lines).

The stage consumes either the textual scrub-count table (CLI drop-in) or
in-memory arrays straight from the scrub-count stage (no TSV round trip).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import IO, Sequence

import numpy as np

from strainer2_tpu.io.fastx import open_maybe_gzip

__all__ = ["ScrubTable", "parse_scrub_tables", "run_filter"]


@dataclass
class ScrubTable:
    """Parsed scrub-count input in row order."""

    keys: list[bytes]  # k-mer strings, file row order
    strain: np.ndarray  # int64 reference_count per row
    pan: np.ndarray  # pangenome counts (possibly summed over files)
    meta: np.ndarray  # metagenome counts (summed over files)
    drug_mask: np.ndarray  # bool, True where any file had drug_count > 0
    has_drug: bool


def _parse_one(path: str):
    keys: list[bytes] = []
    c1: list[int] = []
    c2: list[int] = []
    c3: list[int] = []
    c4: list[int] = []
    has_drug = False
    with open_maybe_gzip(path) as f:
        for raw in f:
            if raw.startswith(b"#"):
                continue
            parts = raw.rstrip(b"\n").split(b"\t")
            keys.append(parts[0])
            c1.append(int(parts[1]))
            c2.append(int(parts[2]))
            c3.append(int(parts[3]))
            if len(parts) == 5:
                has_drug = True
                c4.append(int(parts[4]))
            else:
                c4.append(0)
    return (
        keys,
        np.asarray(c1, dtype=np.int64),
        np.asarray(c2, dtype=np.int64),
        np.asarray(c3, dtype=np.int64),
        np.asarray(c4, dtype=np.int64),
        has_drug,
    )


def parse_scrub_tables(paths: Sequence[str]) -> ScrubTable:
    """Parse one or more scrub-count tables, accumulating panel counts.

    Multi-file semantics follow the reference: pangenome/metagenome counts
    sum across files; the strain rows must agree between consecutive files
    from the third file onward (reference kmer_scrub_filter.py:168-201,
    including its off-by-one that never compares file 2 against file 1).
    """
    agg_pan: dict[bytes, int] | None = None
    agg_meta: dict[bytes, int] = {}
    agg_drugmask: dict[bytes, bool] = {}
    has_drug = False
    prev_strain: dict[bytes, int] | None = None
    keys: list[bytes] = []
    strain = None

    agg_pan = {}
    for i, path in enumerate(paths):
        if i > 1:
            prev_strain = dict(zip(keys, strain.tolist()))
        keys, c1, c2, c3, c4, hd = _parse_one(path)
        strain = c1
        has_drug = has_drug or hd
        for key, v in zip(keys, c2.tolist()):
            if v > 0:
                agg_pan[key] = agg_pan.get(key, 0) + v
        for key, v in zip(keys, c3.tolist()):
            if v > 0:
                agg_meta[key] = agg_meta.get(key, 0) + v
        if hd:
            for key, m, v in zip(keys, c3.tolist(), c4.tolist()):
                if v > 0:
                    agg_drugmask[key] = True
        if i > 1 and dict(zip(keys, strain.tolist())) != prev_strain:
            sys.exit("error: input files do not have identical hash and strain hash values.")

    pan = np.asarray([agg_pan.get(k, 0) for k in keys], dtype=np.int64)
    meta = np.asarray([agg_meta.get(k, 0) for k in keys], dtype=np.int64)
    drug_mask = np.asarray([agg_drugmask.get(k, False) for k in keys], dtype=bool)
    return ScrubTable(keys, strain, pan, meta, drug_mask, has_drug)


def _fmt(x: float) -> str:
    return str(float(x))


def run_filter(
    table: ScrubTable,
    min_fraction: float = 0.04,
    independent: bool = False,
    out: IO = None,
    err: IO = None,
) -> list[bytes]:
    """Apply the scrub filter; writes the reference-format report + kept
    k-mers to ``out`` and returns the kept k-mers (input row order)."""
    out = out if out is not None else sys.stdout
    err = err if err is not None else sys.stderr

    all_kmers = len(table.keys)
    num_pan = int(np.count_nonzero(table.pan))
    num_meta = int(np.count_nonzero(table.meta))
    out.write(
        "#total kmers in strain:%d,%d pangenome: %d metagenome: %d\n"
        % (all_kmers, all_kmers, num_pan, num_meta)
    )

    alive = np.ones(all_kmers, dtype=bool)
    drug_scrubbed = 0
    if table.has_drug:
        num_drug = int(np.count_nonzero(table.drug_mask))
        out.write("#total kmers cross drug:%d\n" % num_drug)
        alive &= ~table.drug_mask
        remaining = int(np.count_nonzero(alive))
        drug_scrubbed = all_kmers - remaining
        frac_rem = float(remaining / float(all_kmers))
        out.write("#fraction kmers remaining drug post scrub:%s\n" % _fmt(frac_rem))
        out.write("#drug_scrubbed kmers:%d\n" % drug_scrubbed)
        if frac_rem < min_fraction * 2:
            raise RuntimeError(
                "ERROR: too few kmers remain after drug scrub. Are your drug strains too similar?"
            )

    if independent:
        alive = _independent_scrub(table, alive, min_fraction, all_kmers, err)
    else:
        alive = _joint_scrub(table, alive, min_fraction, all_kmers, drug_scrubbed)

    kept = [k for k, a in zip(table.keys, alive) if a]
    out.write("#post scrub kmers %d out of %d\n" % (len(kept), all_kmers))
    for key in kept:
        out.write(key.decode("ascii") + "\n")
    return kept


def _joint_scrub(table, alive, min_fraction, all_kmers, drug_scrubbed):
    pan_sum = float(table.pan.sum())
    meta_sum = float(table.meta.sum())
    # frequencies; a panel with zero total would divide by zero in the
    # reference too (only reachable when no k-mer was ever counted)
    pan_f = table.pan / pan_sum if pan_sum else np.zeros_like(table.pan, dtype=float)
    meta_f = table.meta / meta_sum if meta_sum else np.zeros_like(table.meta, dtype=float)
    score = np.maximum(np.maximum(meta_f, pan_f), 0.0)

    # candidates = still-alive keys, sorted by score desc, ties in row order
    cand = np.flatnonzero(alive)
    order = cand[np.argsort(-score[cand], kind="stable")]
    # remove while (1 - (n+1)/all) > min_fraction, n starting at drug_scrubbed;
    # monotone -> closed form count
    n = drug_scrubbed + np.arange(order.size, dtype=np.float64)
    removed = (1.0 - (n + 1.0) / all_kmers) > min_fraction
    alive = alive.copy()
    alive[order[removed]] = False
    return alive


def _independent_scrub(table, alive, min_fraction, all_kmers, err):
    alive = alive.copy()
    for vals_all in (table.pan, table.meta):
        # the reference iterates the per-panel hash: only keys with count>0
        vals = vals_all[vals_all > 0]
        threshold = _scrub_max_kmers(min_fraction, vals, all_kmers, err)
        alive &= ~(vals_all > threshold)
    return alive


def _scrub_max_kmers(min_frac, vals, total_kmers, err) -> int:
    """Escalating count threshold (reference kmer_scrub_filter.py:30-58),
    including its stderr progress lines."""
    svals = np.sort(vals)
    min_count = -1
    fraction_kept = -1.0
    while fraction_kept < min_frac:
        min_count += 1
        hits = int(vals.size - np.searchsorted(svals, min_count, side="right"))
        fraction_kept = 1 - hits / float(total_kmers)
        err.write("kept " + _fmt(fraction_kept) + " with threshold " + str(min_count) + "\n")
    n_scrub = int(vals.size - np.searchsorted(svals, min_count, side="right"))
    err.write(
        "threshold was %d left with %d out of %s that will be scrubbed\n"
        % (min_count, n_scrub, _fmt(float(total_kmers)))
    )
    return min_count
