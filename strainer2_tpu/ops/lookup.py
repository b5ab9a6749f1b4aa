"""Device membership-lookup kernels — THE hot op of the whole engine.

The reference spends essentially all of its CPU time probing a string hash
once per window (reference src/strain_detect.c:386,478 and
src/genome_compare.c:220).  On TPU, membership of a batch of packed
canonical k-mers is resolved with:

- ``cuckoo_lookup``: exactly two vectorized gathers from the HBM-resident
  cuckoo table (see strainer2_tpu.index.cuckoo) + plane compares.  This is
  the speed-of-light path: ~16 bytes of random HBM traffic per query.
- ``sorted_lookup``: branchless binary search over the sorted key planes
  (ceil(log2 N) gathers); used as a portable fallback and as an
  independent oracle for the cuckoo path in tests.

Both return a *slot id* usable for deterministic count accumulation via
integer scatter-add (order-independent, so bit-identical counts regardless
of batch/device partitioning — the property that makes psum count merging
exact; SURVEY.md §2.5, §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from strainer2_tpu.index.hashing import cuckoo_slots

__all__ = [
    "cuckoo_lookup",
    "bucket_lookup",
    "bucket_lookup_wide",
    "bucket_lookup_words",
    "sorted_lookup",
    "accumulate_counts",
]


def cuckoo_lookup(
    table,  # (t_hi, t_lo): two (2*H,) uint32 planes, or (2*H, 2) array
    h_bits: int,
    salt: int,
    qhi: jax.Array,
    qlo: jax.Array,
):
    """Membership of packed queries in the cuckoo table.

    Returns (found: bool (...,), slot: int32 (...,)).  ``slot`` is the row
    of the matching key (arbitrary where not found; pair with ``found``
    when scattering).

    Performance notes (measured on v5e): table planes must be *separate
    contiguous 1-D arrays passed as jit arguments* — a (2, N) layout or a
    closure-captured constant pushes XLA's gather off the vectorized path
    (ms instead of us for a 2M-query batch).  Queries are flattened before
    the gather for the same reason.
    """
    if isinstance(table, (tuple, list)):
        t_hi, t_lo = table
    else:
        t_hi, t_lo = table[..., 0], table[..., 1]
    shape = qhi.shape
    qhi = qhi.reshape(-1)
    qlo = qlo.reshape(-1)
    h = t_hi.shape[0] // 2
    shi = qhi ^ jnp.uint32(salt) if salt else qhi
    s0 = cuckoo_slots(shi, qlo, h_bits, 0).astype(jnp.int32)
    s1 = cuckoo_slots(shi, qlo, h_bits, 1).astype(jnp.int32) + jnp.int32(h)

    hit0 = (t_hi[s0] == qhi) & (t_lo[s0] == qlo)
    hit1 = (t_hi[s1] == qhi) & (t_lo[s1] == qlo)
    found = hit0 | hit1
    slot = jnp.where(hit0, s0, s1)
    return found.reshape(shape), slot.reshape(shape)


def sorted_lookup(
    keys: jax.Array,  # (N, 2) uint32, sorted by (hi, lo)
    qhi: jax.Array,
    qlo: jax.Array,
):
    """Branchless binary search; returns (found, position-in-sorted-order)."""
    n = keys.shape[0]
    steps = max(1, int(np.ceil(np.log2(n + 1))))
    lo_idx = jnp.zeros(qhi.shape, dtype=jnp.int32)
    hi_idx = jnp.full(qhi.shape, n, dtype=jnp.int32)

    def body(_, carry):
        lo_i, hi_i = carry
        mid = (lo_i + hi_i) >> 1
        row = keys[jnp.clip(mid, 0, n - 1)]
        less = (row[..., 0] < qhi) | ((row[..., 0] == qhi) & (row[..., 1] < qlo))
        lo_i = jnp.where(less, mid + 1, lo_i)
        hi_i = jnp.where(less, hi_i, mid)
        return lo_i, hi_i

    lo_idx, hi_idx = jax.lax.fori_loop(0, steps, body, (lo_idx, hi_idx))
    pos = jnp.clip(lo_idx, 0, n - 1)
    row = keys[pos]
    found = (lo_idx < n) & (row[..., 0] == qhi) & (row[..., 1] == qlo)
    return found, lo_idx.astype(jnp.int32)


def accumulate_counts(
    counts: jax.Array,  # (num_slots,) uint32 (or int32)
    slot: jax.Array,
    hit: jax.Array,  # bool — found & window-valid (& any extra mask)
) -> jax.Array:
    """counts[slot] += hit, deterministically (integer scatter-add).

    Non-hits are routed to an out-of-range slot and dropped, so the
    scatter's update operand is a broadcast constant — XLA's fast scatter
    path (a per-element vector update operand is ~700x slower on v5e).
    """
    tgt = jnp.where(hit, slot, jnp.int32(counts.shape[0])).reshape(-1)
    return counts.at[tgt].add(counts.dtype.type(1), mode="drop")


def _bucket_probe(rows, h_bits: int, salt: int, qhi, qlo):
    """Shared single-gather probe: returns (eq, found, slot, row) on the
    flattened query axis.  One serialized random access per query; all
    comparison/selection work is vectorized over the gathered 64-lane row."""
    shi = qhi ^ jnp.uint32(salt) if salt else qhi
    bucket = cuckoo_slots(shi, qlo, h_bits, 0).astype(jnp.int32)
    row = rows[bucket]  # (Q, 64): the only random access
    eq = (row[:, 0:16] == qhi[:, None]) & (row[:, 16:32] == qlo[:, None])
    found = eq.any(axis=1)
    cell = jnp.argmax(eq, axis=1).astype(jnp.int32)
    slot = bucket * jnp.int32(16) + cell
    return eq, found, slot, row


def _meta_block(eq, row, lanes: slice):
    """Matched key's meta word from one 16-lane block — a masked lane
    reduction, no second gather."""
    return jnp.sum(jnp.where(eq, row[:, lanes], jnp.uint32(0)), axis=1, dtype=jnp.uint32)


def bucket_lookup(
    rows: jax.Array,  # (num_buckets, 64) uint32 — see index/bucket.py layout
    h_bits: int,
    salt: int,
    qhi: jax.Array,
    qlo: jax.Array,
):
    """Single-gather membership via the bucketed row layout.

    One serialized random access per query: the gathered 64-lane row holds
    16 candidate (hi, lo) keys plus their meta lane; comparison, cell
    selection, and meta extraction are pure vector ops.

    Returns (found bool, slot int32, meta uint32) with shapes of qhi.
    """
    shape = qhi.shape
    eq, found, slot, row = _bucket_probe(
        rows, h_bits, salt, qhi.reshape(-1), qlo.reshape(-1)
    )
    meta = _meta_block(eq, row, slice(32, 48))
    return found.reshape(shape), slot.reshape(shape), meta.reshape(shape)


def bucket_lookup_wide(
    rows: jax.Array,  # (num_buckets, 64) uint32 — see index/bucket.py layout
    h_bits: int,
    salt: int,
    qhi: jax.Array,
    qlo: jax.Array,
):
    """bucket_lookup returning BOTH meta blocks of the gathered row.

    The 64-lane row carries two 16-lane meta blocks (lanes 32:48 and
    48:64 — BucketTable.with_meta2), giving 64 meta bits per key from the
    SAME single serialized access; this is how a pass answers 32 strains
    (2 bits each) at the one-gather cost.  Returns (found, slot, meta_lo,
    meta_hi) with shapes of qhi.
    """
    found, slot, words = bucket_lookup_words(rows, h_bits, salt, qhi, qlo, 2)
    return found, slot, words[0], words[1]


def bucket_lookup_words(
    rows: jax.Array,  # (num_buckets, 32 + 16*W) uint32 — index/bucket.py layout
    h_bits: int,
    salt: int,
    qhi: jax.Array,
    qlo: jax.Array,
    n_words: int,
):
    """bucket_lookup returning the first ``n_words`` meta blocks.

    Slice width is nearly free next to the serialized per-index access
    (docs/PERFORMANCE.md), so a wider row trades ~zero extra gather cost
    for 32 more meta bits per key per block — the >32-strain-per-pass
    layout (16 strains of 2 bits per word).  Returns
    (found, slot, [meta_word_0, ...]) with shapes of qhi.
    """
    if n_words > (rows.shape[1] - 32) // 16:
        raise ValueError(
            f"{n_words} meta words > {(rows.shape[1] - 32) // 16} blocks "
            f"in a {rows.shape[1]}-lane row"
        )
    shape = qhi.shape
    eq, found, slot, row = _bucket_probe(
        rows, h_bits, salt, qhi.reshape(-1), qlo.reshape(-1)
    )
    words = [
        _meta_block(eq, row, slice(32 + 16 * j, 48 + 16 * j)).reshape(shape)
        for j in range(n_words)
    ]
    return found.reshape(shape), slot.reshape(shape), words
