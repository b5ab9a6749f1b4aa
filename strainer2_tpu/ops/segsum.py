"""Two-level chunked boundary segment sums for packed strain bits.

The multi-strain classify (pipeline/multi_detect.py) needs, per read, the
number of windows whose gathered meta word has bit 2s set (present for
strain s) and bit 2s+1 set (informative), for all S strains at once.  The
round-1 implementation expanded the packed words to a (Q, S) int32 plane
and ran a full-length cumsum over the window axis Q — exact, but at S=96
the cumsum's multi-pass traffic dominates the step (tools/
bench_multi_variants.py: the gather-only ceiling is ~75 M windows/s while
the full classify runs ~26 M).

This module computes the SAME integer result with two short passes
instead of one Q-long cumsum (classic two-level prefix sum):

  1. chunk sums: reshape the packed words to (Q/c, c), expand and reduce
     over the chunk axis (XLA fuses the bit expand into the reduction, so
     the (Q, S) plane is never materialized), then cumsum over the Q/c
     chunk sums — c times shorter than the production cumsum.
  2. boundary correction: for each read boundary b, gather the single
     chunk containing b (one serialized access per boundary — negligible
     next to the per-window lookup gather) and add the expanded bits at
     in-chunk positions < b % c.

Per-read totals are differences of exact prefixes, so results are
bit-identical to the full-cumsum path (integer math, same order).  The
equivalence is pinned by tests/test_segsum.py and by every multi-strain
parity test that compares against per-strain scalar runs.

Reference context: /root/reference/src/strain_detect.c:386 scores one
strain per pass at ~1e7 lookups/s/core; this path is how one gathered
row's 2S meta bits turn into per-read per-strain totals without paying a
window-length cumsum per strain.
"""

from __future__ import annotations

__all__ = ["boundary_strain_sums", "DEFAULT_CHUNK"]

DEFAULT_CHUNK = 256


def boundary_strain_sums(masked_words, boundaries, n_strains, *, chunk=DEFAULT_CHUNK):
    """Per-read present/informative sums from packed 2-bit-per-strain words.

    masked_words: list of (Q,) uint32 arrays; word j carries strains
        16j..16j+15 (2 bits each: bit 2s = present, 2s+1 = informative),
        already masked to 0 on non-hit windows.
    boundaries: (R+1,) int32 ascending window offsets in [0, Q] (read
        starts; duplicates mean empty reads — the sharded engine also
        passes offsets clipped to its local window range).
    n_strains: total strain count S (last word may be partial).

    Returns (tot, inf): two (R, S) int32 arrays.
    """
    import jax.numpy as jnp

    q = masked_words[0].shape[0]
    n_chunks = -(-q // chunk) if q else 1
    pad = n_chunks * chunk - q

    cidx = boundaries // chunk  # (R+1,)
    coff = boundaries % chunk
    # chunk row gathered for the intra-chunk correction; boundaries[-1] == Q
    # can land one past the last chunk when Q % chunk == 0 — its offset is 0
    # so the (masked) intra sum is 0 regardless of which row is gathered.
    gidx = jnp.minimum(cidx, n_chunks - 1)
    pos = jnp.arange(chunk, dtype=jnp.int32)
    intra_mask = (pos[None, :] < coff[:, None]).astype(jnp.int32)  # (R+1, c)

    tot_parts, inf_parts = [], []
    for j, w in enumerate(masked_words):
        n_j = min(16, n_strains - 16 * j)
        if n_j <= 0:
            break
        shifts = jnp.arange(n_j, dtype=jnp.uint32) * 2
        wp = jnp.pad(w, (0, pad)).reshape(n_chunks, chunk)

        # (n_chunks, c, n_j) bit expand fused into the chunk reduction
        p = ((wp[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.int32)
        i = ((wp[:, :, None] >> (shifts[None, None, :] + 1)) & 1).astype(jnp.int32)
        zero = jnp.zeros((1, n_j), dtype=jnp.int32)
        cum_p = jnp.concatenate([zero, jnp.cumsum(p.sum(axis=1), axis=0)])
        cum_i = jnp.concatenate([zero, jnp.cumsum(i.sum(axis=1), axis=0)])

        bw = wp[gidx]  # (R+1, c): one serialized gather per boundary
        bp = ((bw[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.int32)
        bi = ((bw[:, :, None] >> (shifts[None, None, :] + 1)) & 1).astype(jnp.int32)
        pre_p = cum_p[cidx] + (bp * intra_mask[:, :, None]).sum(axis=1)
        pre_i = cum_i[cidx] + (bi * intra_mask[:, :, None]).sum(axis=1)

        tot_parts.append(pre_p[1:] - pre_p[:-1])
        inf_parts.append(pre_i[1:] - pre_i[:-1])

    if len(tot_parts) == 1:
        return tot_parts[0], inf_parts[0]
    return jnp.concatenate(tot_parts, axis=1), jnp.concatenate(inf_parts, axis=1)
