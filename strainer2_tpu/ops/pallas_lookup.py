"""Pallas DMA-gather experiments for the bucket-row membership lookup.

Round-1 finding (docs/PERFORMANCE.md): XLA serializes random access per
index at ~13 ns on v5e, flooring the single-gather bucket lookup near
~77 M lookups/s/chip.  The two escape hatches named in VERDICT.md are
tested here against the same bucket layout (index/bucket.py — one hash
selects a 64-lane row carrying 16 candidate keys + meta):

- ``bucket_lookup_pallas_gridmap``: the standard TPU embedding-lookup
  pattern — bucket ids ride as a scalar-prefetch operand and drive
  index-dependent ``BlockSpec`` index maps, so Mosaic's pipeline engine
  double-buffers one HBM->VMEM row DMA per query ref per grid step.
- ``bucket_lookup_pallas_manual``: hand-rolled DMA ring — W row copies
  per group, D groups outstanding (W*D concurrent 256 B DMAs), scalar
  bucket ids read from SMEM, vectorized compare on the landed (W, 64)
  tile.

Both produce the exact (found, slot, meta) contract of
ops.lookup.bucket_lookup (pinned in tests/test_pallas.py); the measured
verdict lives in docs/PERFORMANCE.md and tools/bench_pallas_lookup.py.

Reference hot loop being attacked: src/strain_detect.c:386,478 and
src/genome_compare.c:220 (one string-hash probe per window).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strainer2_tpu.index.hashing import cuckoo_slots

__all__ = [
    "bucket_lookup_pallas_gridmap",
    "bucket_lookup_pallas_manual",
]


def _bucket_ids(qhi, qlo, h_bits: int, salt: int):
    shi = qhi ^ jnp.uint32(salt) if salt else qhi
    return cuckoo_slots(shi, qlo, h_bits, 0).astype(jnp.int32)


def _pad128(rows):
    """Mosaic DMA slices must align to the 128-lane tiling: the 64-lane
    bucket row is padded to a 128-lane row (512 B per DMA) for the Pallas
    path.  Callers may pre-pad to keep the cost out of measured loops."""
    if rows.shape[1] == 64:
        rows = jnp.pad(rows, ((0, 0), (0, 64)))
    elif rows.shape[1] != 128:
        raise ValueError("rows must be 64- or 128-lane")
    return rows


def _resolve(rows, qhi, qlo, bucket):
    """Vector epilogue shared by both kernels: rows (W, 64) against
    column-vector queries (W, 1); returns (found, slot, meta) as (W, 1).
    slot is arbitrary where not found (same contract as bucket_lookup).
    Mosaic has no integer argmax; first-true cell = min over marked lanes."""
    eq = (rows[:, 0:16] == qhi) & (rows[:, 16:32] == qlo)
    found = eq.any(axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 1)
    cell = jnp.min(jnp.where(eq, lane, jnp.int32(16)), axis=1, keepdims=True)
    slot = bucket * jnp.int32(16) + cell
    # Mosaic: no unsigned reductions — sum the single selected lane as
    # int32 and view back (bit-exact: exactly one non-zero addend)
    meta = jnp.sum(
        jnp.where(eq, rows[:, 32:48].astype(jnp.int32), jnp.int32(0)),
        axis=1, keepdims=True, dtype=jnp.int32,
    ).astype(jnp.uint32)
    return found.astype(jnp.int32), slot, meta


# ---------------------------------------------------------------------------
# Variant A: scalar-prefetch + index-dependent BlockSpec (auto pipelining)
# ---------------------------------------------------------------------------

def _gridmap_kernel(idx_ref, qhi_ref, qlo_ref, qb_ref, *refs, g: int):
    # each row ref is a (1, 1, 128) block of the (B, 1, 128)-viewed table
    rows = jnp.concatenate([refs[j][:, 0, :] for j in range(g)], axis=0)  # (G, 128)
    found_ref, slot_ref, meta_ref = refs[g:]
    found, slot, meta = _resolve(rows, qhi_ref[:, :], qlo_ref[:, :], qb_ref[:, :])
    found_ref[:, :] = found
    slot_ref[:, :] = slot
    meta_ref[:, :] = meta


def bucket_lookup_pallas_gridmap(
    rows: jax.Array,  # (num_buckets, 64) uint32 — stays in HBM
    h_bits: int,
    salt: int,
    qhi: jax.Array,
    qlo: jax.Array,
    *,
    group: int = 8,  # rows DMA'd per grid step (one ref each)
    interpret: bool | None = None,
):
    """Index-dependent-BlockSpec gather: grid step i receives ``group``
    (1, 64) table rows selected by the prefetched bucket ids."""
    shape = qhi.shape
    qhi = qhi.reshape(-1)
    qlo = qlo.reshape(-1)
    n = qhi.shape[0]
    if n % group:
        raise ValueError(f"query count {n} must be a multiple of group={group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # (B, 1, 128) view: Mosaic requires block dim -2 to be a multiple of 8
    # OR equal to the array dim — a (1, 1, 128) block of a 3-D view is the
    # only legal single-row index-dependent block
    rows = _pad128(rows)[:, None, :]
    bucket = _bucket_ids(qhi, qlo, h_bits, salt)
    qhi2 = qhi.reshape(-1, 1)
    qlo2 = qlo.reshape(-1, 1)
    qb2 = bucket.reshape(-1, 1)

    steps = n // group
    q_spec = pl.BlockSpec((group, 1), lambda i, idx: (i, 0))

    def row_spec(j):
        return pl.BlockSpec(
            (1, 1, 128), lambda i, idx, j=j: (idx[i * group + j], 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[q_spec, q_spec, q_spec] + [row_spec(j) for j in range(group)],
        out_specs=[q_spec, q_spec, q_spec],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.uint32),
    ]
    found, slot, meta = pl.pallas_call(
        partial(_gridmap_kernel, g=group),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bucket, qhi2, qlo2, qb2, *([rows] * group))
    return (
        (found.reshape(shape) != 0),
        slot.reshape(shape),
        meta.reshape(shape),
    )


# ---------------------------------------------------------------------------
# Variant B: manual DMA ring (W copies per group, D groups in flight)
# ---------------------------------------------------------------------------

def _manual_kernel(
    idx_smem, qhi_ref, qlo_ref, qb_ref, table_ref,
    found_ref, slot_ref, meta_ref,
    scratch, sem,
    *, w: int, d: int, chunk: int,
):
    ng = chunk // w

    def issue(g, slot_id):
        base = g * w
        for j in range(w):
            pltpu.make_async_copy(
                table_ref.at[idx_smem[base + j]],
                scratch.at[slot_id * w + j],
                sem.at[slot_id, j],
            ).start()

    def wait(slot_id):
        for j in range(w):
            pltpu.make_async_copy(
                table_ref.at[0],
                scratch.at[slot_id * w + j],
                sem.at[slot_id, j],
            ).wait()

    for s in range(min(d, ng)):
        issue(s, s)

    def body(g, _):
        slot_id = jax.lax.rem(g, d)
        wait(slot_id)
        off = pl.multiple_of(g * w, w)
        rows = scratch[pl.ds(pl.multiple_of(slot_id * w, w), w), :]
        found, slot, meta = _resolve(
            rows,
            qhi_ref[pl.ds(off, w), :],
            qlo_ref[pl.ds(off, w), :],
            qb_ref[pl.ds(off, w), :],
        )
        found_ref[pl.ds(off, w), :] = found
        slot_ref[pl.ds(off, w), :] = slot
        meta_ref[pl.ds(off, w), :] = meta

        @pl.when(g + d < ng)
        def _():
            issue(g + d, slot_id)

        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def bucket_lookup_pallas_manual(
    rows: jax.Array,  # (num_buckets, 64) uint32 — stays in HBM
    h_bits: int,
    salt: int,
    qhi: jax.Array,
    qlo: jax.Array,
    *,
    w: int = 8,  # rows per group (vector compare width)
    d: int = 4,  # groups in flight (w*d outstanding DMAs)
    chunk: int = 1024,  # queries per grid step
    interpret: bool | None = None,
):
    """Hand-pipelined HBM row gather; semantics of ops.lookup.bucket_lookup."""
    shape = qhi.shape
    qhi = qhi.reshape(-1)
    qlo = qlo.reshape(-1)
    n = qhi.shape[0]
    if chunk % w:
        raise ValueError("chunk must be a multiple of w")
    if n % chunk:
        raise ValueError(f"query count {n} must be a multiple of chunk={chunk}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows = _pad128(rows)
    bucket = _bucket_ids(qhi, qlo, h_bits, salt)
    qhi2 = qhi.reshape(-1, 1)
    qlo2 = qlo.reshape(-1, 1)
    qb2 = bucket.reshape(-1, 1)

    steps = n // chunk
    vspec = pl.BlockSpec((chunk, 1), lambda i: (i, 0))
    out_shape = [
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.int32),
        jax.ShapeDtypeStruct((n, 1), jnp.uint32),
    ]
    found, slot, meta = pl.pallas_call(
        partial(_manual_kernel, w=w, d=d, chunk=chunk),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            vspec,
            vspec,
            vspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec, vspec, vspec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((w * d, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((d, w)),
        ],
        interpret=interpret,
    )(bucket, qhi2, qlo2, qb2, rows)
    return (
        (found.reshape(shape) != 0),
        slot.reshape(shape),
        meta.reshape(shape),
    )
