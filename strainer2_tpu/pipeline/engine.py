"""Jitted device programs shared by all pipeline stages.

One KmerEngine instance = one batch geometry (rows x row_len) and one k.
Every program is compiled once and reused for the whole run — batch shapes
are fixed by the dense packer (strainer2_tpu.io.batches), so there is no
shape-driven recompilation regardless of read-length distribution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from strainer2_tpu.ops.lookup import accumulate_counts, bucket_lookup, cuckoo_lookup
from strainer2_tpu.ops.packing import canonical_windows, merge_code64_np

__all__ = ["KmerEngine", "default_layout"]


def _maybe_enable_compile_cache() -> None:
    """Persistent XLA compilation cache: repeated CLI invocations skip the
    seconds-to-minutes of first-compile per program shape (the dominant
    cold-start cost on TPU).  Defaults to ~/.cache/strainer2_tpu/xla;
    STRAINER2_COMPILE_CACHE overrides the directory, =0/empty disables."""
    import os

    import jax

    cache = os.environ.get("STRAINER2_COMPILE_CACHE")
    if cache is None and jax.default_backend() == "cpu":
        # CPU AOT artifacts embed the compile host's CPU features and can
        # SIGILL when the cache directory moves between machines; CPU
        # compiles are fast enough that the cache only pays on TPU.
        return
    if cache is None:
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "strainer2_tpu", "xla"
        )
        try:
            os.makedirs(cache, exist_ok=True)
        except OSError:
            cache = ""
    if cache and cache != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass


def _pallas_extract_on() -> bool:
    """Pallas extraction for the extraction-only program on TPU
    (tests force-enable this on CPU, where the kernel interprets)."""
    import jax

    return jax.default_backend() == "tpu"


def default_layout() -> str:
    """Bucket rows win on TPU (serialized random access dominates, wide
    slices are free); the cuckoo plane pair wins on CPU where gathers
    vectorize and the 16x row traffic is real cost."""
    import jax

    return "bucket" if jax.default_backend() == "tpu" else "cuckoo"


class KmerEngine:
    """layout='bucket' (default): single-gather bucketed table (the fast
    path on v5e — one serialized random access per query).
    layout='cuckoo': two-probe plane-pair table (used by the sharded
    engine, where the table is split across an index mesh axis)."""

    def __init__(self, k: int, max_reads: int | None = None, layout: str | None = None):
        _maybe_enable_compile_cache()
        self.k = k
        self.max_reads = max_reads
        self.layout = layout or default_layout()
        layout = self.layout
        bucket = layout == "bucket"
        self._extract = jax.jit(partial(_extract, k=k))
        self._count = jax.jit(
            partial(_count_step_bucket if bucket else _count_step, k=k),
            static_argnames=("h_bits", "salt"),
            donate_argnums=(0,),
        )
        self._classify = jax.jit(
            partial(
                _classify_step_bucket if bucket else _classify_step,
                k=k,
                max_reads=max_reads,
            ),
            static_argnames=("h_bits", "salt"),
        )
        self._hits = jax.jit(
            partial(_hit_masks_bucket if bucket else _hit_masks, k=k),
            static_argnames=("h_bits", "salt"),
        )
        self._count_valid = jax.jit(
            partial(_count_valid_step_bucket if bucket else _count_valid_step, k=k),
            static_argnames=("h_bits", "salt"),
            donate_argnums=(0,),
        )
        self._hit_accum = jax.jit(
            partial(_hit_accum_bucket if bucket else _hit_accum, k=k),
            static_argnames=("h_bits", "salt"),
            donate_argnums=(0,),
        )
        self._hit_stats = jax.jit(
            partial(_hit_stats_bucket if bucket else _hit_stats, k=k),
            static_argnames=("h_bits", "salt"),
        )

    # ---- index construction path ----
    def extract_codes(self, bases: np.ndarray) -> np.ndarray:
        """All valid canonical codes of a packed buffer, in scan order.

        On TPU the extraction-only program runs the Pallas tile kernel
        (ops/pallas_kernels.py): every intermediate pack plane stays in
        VMEM, measured 1.45x the fused-jnp formulation (17.2 vs 11.8 G
        windows/s on v5e, bit-identical).  Inside the count/classify
        steps extraction stays jnp: XLA fuses it into the gather program
        where its cost (~0.2 ms/2M windows) vanishes next to the
        serialized gather (~27 ms), so a Pallas split there buys nothing
        and risks the fusion (docs/PERFORMANCE.md primitive table).
        """
        bases = np.asarray(bases)
        if bases.ndim == 2 and bases.shape[0] % 8 == 0 and _pallas_extract_on():
            import jax.numpy as jnp

            from strainer2_tpu.ops.pallas_kernels import canonical_windows_pallas

            hi, lo, valid = canonical_windows_pallas(jnp.asarray(bases), self.k)
            hi, lo = np.asarray(hi), np.asarray(lo)
            mask = np.asarray(valid).reshape(-1) != 0
            return merge_code64_np(
                hi.reshape(-1)[mask].astype(np.uint64),
                lo.reshape(-1)[mask].astype(np.uint64),
                self.k,
            )
        hi, lo, valid = (np.asarray(x) for x in self._extract(bases))
        mask = valid.reshape(-1)
        return merge_code64_np(
            hi.reshape(-1)[mask].astype(np.uint64),
            lo.reshape(-1)[mask].astype(np.uint64),
            self.k,
        )

    # ---- counts lifecycle (polymorphic with the sharded engine) ----
    def table_for(self, index):
        return index.device_table()

    def init_counts(self, index):
        import jax.numpy as jnp

        return jnp.zeros(index.table.num_slots, dtype=jnp.uint32)

    def counts_from_numpy(self, index, counts_np):
        import jax.numpy as jnp

        return jnp.asarray(counts_np)

    def finalize_counts(self, counts) -> np.ndarray:
        return np.asarray(counts)

    # ---- panel counting path (kmer_scrub_count hot loop) ----
    def count_batch(self, counts, table, h_bits: int, salt: int, bases) -> jax.Array:
        """counts[slot] += 1 per hit window; returns updated device counts.

        ``table`` is StrainIndex.device_table(): the (num_buckets, 64) row
        array for the bucket layout, or the (t_hi, t_lo) plane pair for
        cuckoo.
        """
        if self.layout == "bucket":
            return self._count(counts, table, bases, h_bits=h_bits, salt=salt)
        return self._count(counts, table[0], table[1], bases, h_bits=h_bits, salt=salt)

    # ---- detection path: per-read hit aggregation ----
    def classify_batch(self, table, meta, h_bits: int, salt: int, bases, boundaries):
        """Per-read (total_hits, informative_hits) for one packed batch.

        meta: (2H,) uint32 slot-indexed k-mer class
              (NON_INFORMATIVE_KMER / INFORMATIVE_KMER, 0 for empty slots).
        boundaries: (max_reads + 1,) int32 — per-read first-window flat
              indices (PackedBatch.window_starts) padded with the total
              window count.  Reads occupy contiguous flat window spans, so
              per-read sums are differences of one vectorized cumsum at
              these boundaries: no scatter/segment-sum on the hot path.
        Returns device arrays (max_reads,); entries past n_reads are zero.
        """
        if self.layout == "bucket":
            # meta lanes are baked into the row table (BucketTable.with_meta)
            return self._classify(table, bases, boundaries, h_bits=h_bits, salt=salt)
        return self._classify(
            table[0], table[1], meta, bases, boundaries, h_bits=h_bits, salt=salt
        )


    def count_batch_with_valid(self, counts, table, h_bits: int, salt: int, bases):
        """Like count_batch, also returns this batch's valid-window count
        (a device scalar; the caller accumulates across batches)."""
        if self.layout == "bucket":
            return self._count_valid(counts, table, bases, h_bits=h_bits, salt=salt)
        return self._count_valid(
            counts, table[0], table[1], bases, h_bits=h_bits, salt=salt
        )

    # ---- containment scoring path (genome_compare) ----
    def hit_masks(self, table, h_bits: int, salt: int, bases):
        """Per-window (hit, valid) masks in scan order."""
        if self.layout == "bucket":
            return self._hits(table, bases, h_bits=h_bits, salt=salt)
        return self._hits(table[0], table[1], bases, h_bits=h_bits, salt=salt)

    def hit_accumulate(self, acc, table, h_bits: int, salt: int, bases):
        """acc (2,) int32 device (hits, evaluated) += this batch's tallies.

        Fullmap scoring path: the accumulator lives on device across the
        stream and is read back only at spill points — no per-batch
        device->host traffic (docs/PERFORMANCE.md measurement caveat #2:
        bulk D2H over the remote-attached transport is pathological)."""
        if self.layout == "bucket":
            return self._hit_accum(acc, table, bases, h_bits=h_bits, salt=salt)
        return self._hit_accum(acc, table[0], table[1], bases, h_bits=h_bits, salt=salt)

    def hit_stats(self, table, h_bits: int, salt: int, bases, remaining):
        """Rapid-mode batch stats, all reduced on device: returns device
        scalars (batch_hits, batch_evaluated, hits_at_crossing, cross_pos)
        where cross_pos is the flat index of the ``remaining``-th valid
        window of this batch (-1 if the batch ends first) and
        hits_at_crossing the inclusive hit prefix there — exactly the
        reference's stop-and-test point (reference
        src/genome_compare.c:327-340).  Only these four scalars cross to
        host per undecided batch."""
        if self.layout == "bucket":
            return self._hit_stats(table, bases, remaining, h_bits=h_bits, salt=salt)
        return self._hit_stats(
            table[0], table[1], bases, remaining, h_bits=h_bits, salt=salt
        )


def _hit_masks(t_hi, t_lo, bases, *, k, h_bits, salt):
    win = canonical_windows(jnp.asarray(bases), k)
    found, _ = cuckoo_lookup((t_hi, t_lo), h_bits, salt, win.hi, win.lo)
    return found & win.valid, win.valid


def _accum_from_masks(acc, hit, valid):
    # int32 lanes (jax x64 is off); a batch adds <= rows*width ~ 1M, so the
    # caller spills to host python ints every ~1k batches to stay exact on
    # arbitrarily large files (pipeline/compare.py _ACC_SPILL_BATCHES)
    return acc + jnp.stack(
        [jnp.sum(hit, dtype=jnp.int32), jnp.sum(valid, dtype=jnp.int32)]
    )


def _stats_from_masks(hit, valid, remaining):
    hit_i = hit.reshape(-1).astype(jnp.int32)
    valid_i = valid.reshape(-1).astype(jnp.int32)
    cum_hit = jnp.cumsum(hit_i)
    cum_valid = jnp.cumsum(valid_i)
    q = cum_valid.shape[0]
    # first flat index whose inclusive valid prefix reaches `remaining`
    pos = jnp.searchsorted(cum_valid, remaining.astype(jnp.int32))
    crossed = pos < q
    hits_at = jnp.where(crossed, cum_hit[jnp.minimum(pos, q - 1)], 0)
    return (
        cum_hit[q - 1],
        cum_valid[q - 1],
        hits_at,
        jnp.where(crossed, pos, -1),
    )


def _hit_accum(acc, t_hi, t_lo, bases, *, k, h_bits, salt):
    hit, valid = _hit_masks(t_hi, t_lo, bases, k=k, h_bits=h_bits, salt=salt)
    return _accum_from_masks(acc, hit, valid)


def _hit_stats(t_hi, t_lo, bases, remaining, *, k, h_bits, salt):
    hit, valid = _hit_masks(t_hi, t_lo, bases, k=k, h_bits=h_bits, salt=salt)
    return _stats_from_masks(hit, valid, remaining)


def _extract(bases, *, k):
    win = canonical_windows(jnp.asarray(bases), k)
    return win.hi, win.lo, win.valid


def _count_valid_step(counts, t_hi, t_lo, bases, *, k, h_bits, salt):
    win = canonical_windows(jnp.asarray(bases), k)
    found, slot = cuckoo_lookup((t_hi, t_lo), h_bits, salt, win.hi, win.lo)
    counts = accumulate_counts(counts, slot, found & win.valid)
    return counts, jnp.sum(win.valid, dtype=jnp.int32)


def _count_step(counts, t_hi, t_lo, bases, *, k, h_bits, salt):
    win = canonical_windows(jnp.asarray(bases), k)
    found, slot = cuckoo_lookup((t_hi, t_lo), h_bits, salt, win.hi, win.lo)
    return accumulate_counts(counts, slot, found & win.valid)


def _classify_step(t_hi, t_lo, meta, bases, boundaries, *, k, h_bits, salt, max_reads):
    win = canonical_windows(jnp.asarray(bases), k)
    found, slot = cuckoo_lookup((t_hi, t_lo), h_bits, salt, win.hi, win.lo)
    hit = (found & win.valid).reshape(-1)
    slot_flat = jnp.where(hit, slot.reshape(-1), 0)
    informative = hit & (meta[slot_flat] == 2)

    zero = jnp.zeros(1, dtype=jnp.int32)
    cum_hit = jnp.concatenate([zero, jnp.cumsum(hit.astype(jnp.int32))])
    cum_inf = jnp.concatenate([zero, jnp.cumsum(informative.astype(jnp.int32))])
    b0 = boundaries[:-1]
    b1 = boundaries[1:]
    return cum_hit[b1] - cum_hit[b0], cum_inf[b1] - cum_inf[b0]


# ---- bucket-layout variants: one serialized random access per query ----

def _count_step_bucket(counts, rows, bases, *, k, h_bits, salt):
    win = canonical_windows(jnp.asarray(bases), k)
    found, slot, _ = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
    return accumulate_counts(counts, slot, found & win.valid)


def _count_valid_step_bucket(counts, rows, bases, *, k, h_bits, salt):
    win = canonical_windows(jnp.asarray(bases), k)
    found, slot, _ = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
    counts = accumulate_counts(counts, slot, found & win.valid)
    return counts, jnp.sum(win.valid, dtype=jnp.int32)


def _hit_masks_bucket(rows, bases, *, k, h_bits, salt):
    win = canonical_windows(jnp.asarray(bases), k)
    found, _, _ = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
    return found & win.valid, win.valid


def _hit_accum_bucket(acc, rows, bases, *, k, h_bits, salt):
    hit, valid = _hit_masks_bucket(rows, bases, k=k, h_bits=h_bits, salt=salt)
    return _accum_from_masks(acc, hit, valid)


def _hit_stats_bucket(rows, bases, remaining, *, k, h_bits, salt):
    hit, valid = _hit_masks_bucket(rows, bases, k=k, h_bits=h_bits, salt=salt)
    return _stats_from_masks(hit, valid, remaining)


def _classify_step_bucket(rows, bases, boundaries, *, k, h_bits, salt, max_reads):
    win = canonical_windows(jnp.asarray(bases), k)
    found, _, meta = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
    hit = (found & win.valid).reshape(-1)
    informative = hit & (meta.reshape(-1) == 2)

    zero = jnp.zeros(1, dtype=jnp.int32)
    cum_hit = jnp.concatenate([zero, jnp.cumsum(hit.astype(jnp.int32))])
    cum_inf = jnp.concatenate([zero, jnp.cumsum(informative.astype(jnp.int32))])
    b0 = boundaries[:-1]
    b1 = boundaries[1:]
    return cum_hit[b1] - cum_hit[b0], cum_inf[b1] - cum_inf[b0]
