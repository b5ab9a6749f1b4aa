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

import os

__all__ = ["boundary_strain_sums", "DEFAULT_CHUNK"]

# Chunk length of the two-level prefix.  The boundary-correction term costs
# ~(R+1) x chunk per meta word while the chunk-sum cumsum costs Q / chunk, so
# the optimum shrinks as the read capacity R grows.  Measured on v5e at the
# production detection shape (Q = 1.04M windows, R+1 = 33,025 boundaries —
# tools/bench_boundary_shapes.py, 2026-08-21): 128 beats 256 at every strain
# width (S=256: 36.4 vs 27.6 M windows/s, +32%; S=32: 120 vs 97 M) and ties
# or wins at R+1 = 513 and 8,449 too, so 128 is the flat default.  Results
# are bit-identical for ANY chunk (exact integer prefix algebra, pinned by
# tests/test_segsum.py across chunk sizes).
DEFAULT_CHUNK = 128

# Body selector, captured ONCE at import: jit caches the traced body, so a
# mid-process env flip would otherwise leave a warm cache on the old path and
# an in-process A/B could silently compare SWAR against itself.  Reading the
# env exactly once makes the semantics explicit — the variable must be set
# before the interpreter imports this module.  For an in-process A/B,
# monkeypatch this attribute and jit a fresh callable per setting
# (tests/test_segsum.py does both).
_SEGSUM_EXPAND = os.environ.get("STRAINER2_SEGSUM", "swar") == "expand"


def _field_sums16(x):
    """Per-field sums over the last axis of packed 0/1 2-bit fields (SWAR).

    x: (..., n) uint32, each word holding 16 two-bit fields whose value is
    0 or 1 (a presence plane: `w & 0x5555...` or `(w >> 1) & 0x5555...`).
    Returns (..., 16) int32 — the per-field sum over the last axis.

    Vertical-counter scheme: instead of expanding every field to its own
    int32 lane (16x the elements), fields are summed IN the packed words —
    pairwise tree adds along the axis, widening the field width just
    before it could overflow (2-bit cap 3 -> 4-bit cap 15 -> 8-bit cap 255
    -> 16-bit cap 65535).  Each widening splits even/odd fields into two
    planes with pure mask/shift ops; the halving adds touch n + n/2 + ...
    ~ 2n words total, so the vector work per window is ~10x below the
    expanded form at S=256 (measured: docs/PERFORMANCE.md "Classify
    vector-program ablation").  All-integer and order-independent, hence
    bit-identical to the expanded path (pinned by tests/test_segsum.py).
    """
    import jax.numpy as jnp

    n = x.shape[-1]
    target = 1 << max(1, (n - 1).bit_length())  # pad axis to a power of two
    if target != n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - n)])

    def halve(y):
        m = y.shape[-1] // 2
        return y[..., :m] + y[..., m:]

    # 2-bit fields (values <=1, cap 3): one halving -> <=2
    if x.shape[-1] >= 2:
        x = halve(x)
    # widen to 4-bit slots: even strains in e (s=2j at slot j), odd in o
    e = x & 0x33333333
    o = (x >> 2) & 0x33333333
    for _ in range(2):  # cap 15: <=4 then <=8
        if e.shape[-1] >= 2:
            e, o = halve(e), halve(o)
    # widen to 8-bit slots: plane alpha holds strains s = 4k + alpha
    p0 = e & 0x0F0F0F0F          # alpha 0
    p2 = (e >> 4) & 0x0F0F0F0F   # alpha 2
    p1 = o & 0x0F0F0F0F          # alpha 1
    p3 = (o >> 4) & 0x0F0F0F0F   # alpha 3
    for _ in range(4):  # cap 255: <=16, 32, 64, 128
        if p0.shape[-1] >= 2:
            p0, p1, p2, p3 = halve(p0), halve(p1), halve(p2), halve(p3)
    # widen to 16-bit slots (plane beta holds strains {beta, beta+8}) and
    # fold any remaining axis in uint32: values <=128, length n/128, so the
    # total <= n stays far below the 65535 cap for any realistic chunk
    betas = []
    for p in (p0, p1, p2, p3):  # beta = alpha for lo, alpha + 4 for hi
        betas.append(p & 0x00FF00FF)
    for p in (p0, p1, p2, p3):
        betas.append((p >> 8) & 0x00FF00FF)
    folded = [
        b.sum(axis=-1, dtype=jnp.uint32) if b.shape[-1] > 1 else b[..., 0]
        for b in betas
    ]
    arr8 = jnp.stack(folded, axis=-1)  # (..., 8): strain s at plane s % 8
    lo = (arr8 & 0xFFFF).astype(jnp.int32)  # strains 0..7 (16-bit slot 0)
    hi = (arr8 >> 16).astype(jnp.int32)     # strains 8..15 (slot 1)
    return jnp.concatenate([lo, hi], axis=-1)


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

    chunk must stay < 65536: the SWAR counters widen fields to 16-bit
    slots at most, so a chunk's per-field total (<= chunk) past 65535
    would carry into the neighboring strain's slot and silently corrupt
    counts.  Guarded here so an out-of-range chunk fails loudly.

    STRAINER2_SEGSUM=expand restores the bit-expanded chunk reduction for
    A/B checks (default: the SWAR vertical counters, same integers).
    NOTE: the variable is captured ONCE at module import (_SEGSUM_EXPAND
    above) — changing the env mid-process has no effect, by design; an
    in-process A/B monkeypatches the attribute and jits fresh callables.
    """
    import jax.numpy as jnp

    if not 1 <= chunk < 65536:
        raise ValueError(
            f"chunk must be in [1, 65535] (16-bit SWAR slot cap), got {chunk}"
        )
    swar = not _SEGSUM_EXPAND
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
    intra_bool = pos[None, :] < coff[:, None]  # (R+1, c)
    intra_mask = intra_bool.astype(jnp.int32)

    tot_parts, inf_parts = [], []
    for j, w in enumerate(masked_words):
        n_j = min(16, n_strains - 16 * j)
        if n_j <= 0:
            break
        wp = jnp.pad(w, (0, pad)).reshape(n_chunks, chunk)

        if swar:
            cs_p = _field_sums16(wp & 0x55555555)[:, :n_j]
            cs_i = _field_sums16((wp >> 1) & 0x55555555)[:, :n_j]
        else:
            # (n_chunks, c, n_j) bit expand fused into the chunk reduction
            shifts = jnp.arange(n_j, dtype=jnp.uint32) * 2
            p = ((wp[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.int32)
            i = ((wp[:, :, None] >> (shifts[None, None, :] + 1)) & 1).astype(
                jnp.int32
            )
            cs_p = p.sum(axis=1)
            cs_i = i.sum(axis=1)
        zero = jnp.zeros((1, n_j), dtype=jnp.int32)
        cum_p = jnp.concatenate([zero, jnp.cumsum(cs_p, axis=0)])
        cum_i = jnp.concatenate([zero, jnp.cumsum(cs_i, axis=0)])

        bw = wp[gidx]  # (R+1, c): one serialized gather per boundary
        if swar:
            bm = jnp.where(intra_bool, bw, 0)
            pre_p = cum_p[cidx] + _field_sums16(bm & 0x55555555)[:, :n_j]
            pre_i = cum_i[cidx] + _field_sums16((bm >> 1) & 0x55555555)[:, :n_j]
        else:
            bp = ((bw[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.int32)
            bi = ((bw[:, :, None] >> (shifts[None, None, :] + 1)) & 1).astype(
                jnp.int32
            )
            pre_p = cum_p[cidx] + (bp * intra_mask[:, :, None]).sum(axis=1)
            pre_i = cum_i[cidx] + (bi * intra_mask[:, :, None]).sum(axis=1)

        tot_parts.append(pre_p[1:] - pre_p[:-1])
        inf_parts.append(pre_i[1:] - pre_i[:-1])

    if len(tot_parts) == 1:
        return tot_parts[0], inf_parts[0]
    return jnp.concatenate(tot_parts, axis=1), jnp.concatenate(inf_parts, axis=1)
