"""Multi-chip sharding: data-parallel reads x index-parallel cuckoo table.

TPU-first scaling design (SURVEY.md §2.7):

- **data axis**: packed read buffers are sharded by row across chips; each
  chip canonicalizes and looks up only its rows.  The reference's analogue
  is "run files sequentially on one core".
- **index axis**: the cuckoo table (and its slot-indexed count buffer) is
  sharded contiguously by row — "tensor parallelism for the membership
  table", needed when pangenome-scale indexes outgrow one chip's HBM.
  Each shard answers membership only for slots it owns; since a key lives
  in exactly one slot, a psum over the index axis reconstructs full
  lookup results where a global answer is needed (detection's per-window
  class), while count accumulation needs *no* collectives at all: every
  (data, index) device pair scatter-adds into its private count shard and
  the merge is a single reduction at finalize time.  Integer adds make the
  merged counts bit-identical to the single-chip result regardless of
  device count.

Everything is expressed with shard_map over a (data, index) Mesh so XLA
schedules the collectives over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from strainer2_tpu.index.hashing import cuckoo_slots
from strainer2_tpu.ops.packing import canonical_windows

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_mesh", "ShardedKmerEngine", "ShardedPanelEngine"]


def make_mesh(data: int, index: int = 1, devices=None) -> Mesh:
    """Build a (data, index) device mesh; data*index must equal #devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data * index != devices.size:
        raise ValueError(f"mesh {data}x{index} != {devices.size} devices")
    return Mesh(devices.reshape(data, index), ("data", "index"))


def _local_lookup(t_hi_loc, t_lo_loc, qhi, qlo, h_bits, salt, shard_rows):
    """Membership restricted to this index shard's slot range.

    Returns (hit, local_slot): hit is True only where the key's owning
    slot lies in this shard.  Flat 1-D plane gathers keep XLA on its
    vectorized gather path (see ops/lookup.py performance notes).
    """
    shape = qhi.shape
    qhi = qhi.reshape(-1)
    qlo = qlo.reshape(-1)
    h = 1 << h_bits
    shi = qhi ^ jnp.uint32(salt) if salt else qhi
    s0 = cuckoo_slots(shi, qlo, h_bits, 0).astype(jnp.int32)
    s1 = cuckoo_slots(shi, qlo, h_bits, 1).astype(jnp.int32) + jnp.int32(h)

    offset = jax.lax.axis_index("index") * shard_rows
    hit = jnp.zeros(qhi.shape, dtype=bool)
    slot_loc = jnp.zeros(qhi.shape, dtype=jnp.int32)
    for s in (s0, s1):
        local = s - offset
        mine = (local >= 0) & (local < shard_rows)
        safe = jnp.where(mine, local, 0)
        match = mine & (t_hi_loc[safe] == qhi) & (t_lo_loc[safe] == qlo)
        hit = hit | match
        slot_loc = jnp.where(match, safe, slot_loc)
    return hit.reshape(shape), slot_loc.reshape(shape)


class ShardedKmerEngine:
    """Sharded twins of the KmerEngine device programs.

    counts layout: (n_data, num_slots) int32/uint32, sharded P('data',
    'index') — each device owns a private (1, slots/n_index) tile; merge
    with :meth:`merge_counts`.
    """

    def __init__(self, k: int, mesh: Mesh, h_bits: int, salt: int, num_slots: int,
                 max_reads: int | None = None, layout: str = "cuckoo"):
        self.k = k
        self.mesh = mesh
        self.h_bits = h_bits
        self.salt = salt
        self.num_slots = num_slots
        self.layout = layout
        self.n_data = mesh.shape["data"]
        self.n_index = mesh.shape["index"]
        if num_slots % self.n_index:
            raise ValueError("num_slots must divide evenly across the index axis")
        self.shard_rows = num_slots // self.n_index
        self.max_reads = max_reads
        bucket = layout == "bucket"
        # bucket layout: shard over whole buckets (16 slots each)
        self.shard_buckets = self.shard_rows // 16 if bucket else None

        if bucket:
            count_body = partial(
                self._count_body_bucket, k=k, h_bits=h_bits, salt=salt,
                shard_buckets=self.shard_buckets,
            )
            count_specs = (P("data", "index"), P("index", None), P("data", None))
        else:
            count_body = partial(
                self._count_body, k=k, h_bits=h_bits, salt=salt,
                shard_rows=self.shard_rows,
            )
            count_specs = (P("data", "index"), P("index"), P("index"), P("data", None))
        self._count = jax.jit(
            shard_map(count_body, mesh=mesh, in_specs=count_specs,
                      out_specs=P("data", "index")),
            donate_argnums=(0,),
        )
        self._merge = jax.jit(
            lambda counts: jnp.sum(counts, axis=0, dtype=counts.dtype)
        )
        if max_reads is not None:
            if bucket:
                self._classify = jax.jit(
                    shard_map(
                        partial(
                            self._classify_body_bucket, k=k, h_bits=h_bits,
                            salt=salt, shard_buckets=self.shard_buckets,
                            max_reads=max_reads,
                        ),
                        mesh=mesh,
                        in_specs=(P("index", None), P("data", None), P(None)),
                        out_specs=(P("data"), P("data")),
                    )
                )
            else:
                self._classify = jax.jit(
                    shard_map(
                        partial(
                            self._classify_body,
                            k=k,
                            h_bits=h_bits,
                            salt=salt,
                            shard_rows=self.shard_rows,
                            max_reads=max_reads,
                            n_data=self.n_data,
                        ),
                        mesh=mesh,
                        in_specs=(
                            P("index"),
                            P("index"),
                            P("index"),
                            P("data", None),
                            P("data", None),
                        ),
                        out_specs=(P("data"), P("data")),
                    )
                )

    # ---- device programs ----
    @staticmethod
    def _count_body(counts_loc, t_hi_loc, t_lo_loc, bases_loc, *, k, h_bits, salt,
                    shard_rows):
        win = canonical_windows(bases_loc, k)
        hit, slot_loc = _local_lookup(
            t_hi_loc, t_lo_loc, win.hi, win.lo, h_bits, salt, shard_rows
        )
        hit = hit & win.valid
        # constant-update scatter with out-of-range drop: XLA's fast path
        tgt = jnp.where(hit, slot_loc, jnp.int32(shard_rows)).reshape(-1)
        return counts_loc.at[0, tgt].add(counts_loc.dtype.type(1), mode="drop")

    @staticmethod
    def _classify_body(t_hi_loc, t_lo_loc, meta_loc, bases_loc, read_id_loc, *, k,
                       h_bits, salt, shard_rows, max_reads, n_data):
        win = canonical_windows(bases_loc, k)
        hit, slot_loc = _local_lookup(
            t_hi_loc, t_lo_loc, win.hi, win.lo, h_bits, salt, shard_rows
        )
        hit = hit & win.valid
        # exactly one index shard owns a hit k-mer -> psum reconstructs the
        # global hit/class planes
        kmer_class = jnp.where(
            hit, meta_loc[jnp.where(hit, slot_loc, 0).reshape(-1)].reshape(hit.shape), 0
        )
        hit_g = jax.lax.psum(hit.astype(jnp.int32), "index")
        class_g = jax.lax.psum(kmer_class.astype(jnp.int32), "index")

        win_read = read_id_loc[..., : win.hi.shape[-1]]
        seg = jnp.where(hit_g > 0, win_read, max_reads).reshape(-1)
        local_reads = max_reads  # read ids are batch-global; buckets replicated
        total = jax.ops.segment_sum(
            (hit_g > 0).reshape(-1).astype(jnp.int32), seg, num_segments=local_reads + 1
        )
        informative = jax.ops.segment_sum(
            (class_g == 2).reshape(-1).astype(jnp.int32), seg, num_segments=local_reads + 1
        )
        # rows of one read never span data shards (packer invariant), so a
        # psum over 'data' yields the per-read totals replicated everywhere;
        # keep them sharded instead: each data shard holds its own partial.
        return total[None, :], informative[None, :]

    @staticmethod
    def _bucket_local_lookup(rows_loc, qhi, qlo, h_bits, salt, shard_buckets):
        """Bucket-row membership restricted to this index shard.

        Returns (mine&match hit, local slot, meta) — meta is the matched
        key's 32-bit lane (0 where this shard does not own the key).
        """
        from strainer2_tpu.index.hashing import cuckoo_slots as _slots

        shi = qhi ^ jnp.uint32(salt) if salt else qhi
        bucket = _slots(shi, qlo, h_bits, 0).astype(jnp.int32)
        offset = jax.lax.axis_index("index") * shard_buckets
        local = bucket - offset
        mine = (local >= 0) & (local < shard_buckets)
        row = rows_loc[jnp.where(mine, local, 0)]
        eq = (row[:, 0:16] == qhi[:, None]) & (row[:, 16:32] == qlo[:, None])
        hit = mine & eq.any(axis=1)
        cell = jnp.argmax(eq, axis=1).astype(jnp.int32)
        slot_loc = jnp.where(mine, local, 0) * jnp.int32(16) + cell
        meta = jnp.where(
            hit,
            jnp.sum(jnp.where(eq, row[:, 32:48], jnp.uint32(0)), axis=1,
                    dtype=jnp.uint32),
            0,
        )
        return hit, slot_loc, meta

    @staticmethod
    def _bucket_local_lookup_words(rows_loc, qhi, qlo, h_bits, salt,
                                   shard_buckets, n_words):
        """_bucket_local_lookup returning the first n_words 16-lane meta
        blocks (32 bits/key each — the >16-strain-per-pass layouts,
        BucketTable.with_meta_words)."""
        from strainer2_tpu.index.hashing import cuckoo_slots as _slots

        shi = qhi ^ jnp.uint32(salt) if salt else qhi
        bucket = _slots(shi, qlo, h_bits, 0).astype(jnp.int32)
        offset = jax.lax.axis_index("index") * shard_buckets
        local = bucket - offset
        mine = (local >= 0) & (local < shard_buckets)
        row = rows_loc[jnp.where(mine, local, 0)]
        eq = (row[:, 0:16] == qhi[:, None]) & (row[:, 16:32] == qlo[:, None])
        hit = mine & eq.any(axis=1)
        words = [
            jnp.where(
                hit,
                jnp.sum(
                    jnp.where(eq, row[:, 32 + 16 * j : 48 + 16 * j], jnp.uint32(0)),
                    axis=1, dtype=jnp.uint32,
                ),
                0,
            )
            for j in range(n_words)
        ]
        return hit, words

    @staticmethod
    def _classify_multi_body_bucket(rows_loc, bases_loc, boundaries, *, k, h_bits,
                                    salt, shard_buckets, n_strains):
        """Sharded twin of multi_detect._classify_multi: per-read per-strain
        (total, informative) partials from packed 2-bit-per-strain meta.
        Each key is owned by exactly one index shard, so a psum over 'index'
        reconstructs the global meta word; per-read sums come from the
        boundary cumsum restricted to this data shard's window range."""
        from strainer2_tpu.ops.segsum import boundary_strain_sums

        win = canonical_windows(bases_loc, k)
        qhi = win.hi.reshape(-1)
        qlo = win.lo.reshape(-1)
        valid = win.valid.reshape(-1)
        if n_strains > 16:
            n_words = -(-n_strains // 16)
            hit, words = ShardedKmerEngine._bucket_local_lookup_words(
                rows_loc, qhi, qlo, h_bits, salt, shard_buckets, n_words
            )
            keep = hit & valid
            # exactly one shard owns each key: psum reconstructs globals
            masked = [jax.lax.psum(jnp.where(keep, w, 0), "index") for w in words]
        else:
            hit, _, meta = ShardedKmerEngine._bucket_local_lookup(
                rows_loc, qhi, qlo, h_bits, salt, shard_buckets
            )
            m = jnp.where(hit & valid, meta, 0)
            masked = [jax.lax.psum(m, "index")]  # one shard owns each key

        # per-read partials restricted to this data shard's window range:
        # clipped boundary offsets are monotone in [0, n_local], which is
        # all the two-level prefix needs (ops/segsum.py; bit-exact vs the
        # full cumsum, tests/test_segsum.py)
        n_local = masked[0].shape[0]
        off = jax.lax.axis_index("data") * n_local
        b = jnp.clip(boundaries - off, 0, n_local)
        tot, inf = boundary_strain_sums(masked, b, n_strains)
        return tot[None], inf[None]

    @staticmethod
    def _count_body_bucket(counts_loc, rows_loc, bases_loc, *, k, h_bits, salt,
                           shard_buckets):
        win = canonical_windows(bases_loc, k)
        qhi = win.hi.reshape(-1)
        qlo = win.lo.reshape(-1)
        hit, slot_loc, _ = ShardedKmerEngine._bucket_local_lookup(
            rows_loc, qhi, qlo, h_bits, salt, shard_buckets
        )
        hit = hit & win.valid.reshape(-1)
        tgt = jnp.where(hit, slot_loc, jnp.int32(shard_buckets * 16))
        return counts_loc.at[0, tgt].add(counts_loc.dtype.type(1), mode="drop")

    @staticmethod
    def _classify_body_bucket(rows_loc, bases_loc, boundaries, *, k, h_bits, salt,
                              shard_buckets, max_reads):
        win = canonical_windows(bases_loc, k)
        qhi = win.hi.reshape(-1)
        qlo = win.lo.reshape(-1)
        hit, _, meta = ShardedKmerEngine._bucket_local_lookup(
            rows_loc, qhi, qlo, h_bits, salt, shard_buckets
        )
        hit = hit & win.valid.reshape(-1)
        meta = jnp.where(hit, meta, 0)
        # exactly one index shard owns each key: psum reconstructs globals
        hit_g = jax.lax.psum(hit.astype(jnp.int32), "index")
        inf_g = jax.lax.psum((meta == 2).astype(jnp.int32), "index")

        # per-read totals via boundary cumsum, restricted to this data
        # shard's window range; partials sum across 'data' on the host
        n_local = hit_g.shape[0]
        off = jax.lax.axis_index("data") * n_local
        zero = jnp.zeros(1, dtype=jnp.int32)
        cum_hit = jnp.concatenate([zero, jnp.cumsum(hit_g)])
        cum_inf = jnp.concatenate([zero, jnp.cumsum(inf_g)])
        b = jnp.clip(boundaries - off, 0, n_local)
        tot = cum_hit[b[1:]] - cum_hit[b[:-1]]
        inf = cum_inf[b[1:]] - cum_inf[b[:-1]]
        return tot[None, :], inf[None, :]

    # ---- host API ----
    def init_counts(self, dtype=jnp.uint32):
        return jax.device_put(
            jnp.zeros((self.n_data, self.num_slots), dtype=dtype),
            jax.sharding.NamedSharding(self.mesh, P("data", "index")),
        )

    def count_batch(self, counts, table, bases):
        """``table``: sharded (num_buckets, 64) rows for bucket layout, or
        the sharded (t_hi, t_lo) plane pair for cuckoo."""
        if self.layout == "bucket":
            return self._count(counts, table, bases)
        return self._count(counts, table[0], table[1], bases)

    def merge_counts(self, counts) -> np.ndarray:
        """Collapse the data axis; bit-identical to single-chip counting."""
        return np.asarray(self._merge(counts))

    def classify_batch(self, table, meta, bases, read_id_or_boundaries):
        """Returns per-data-shard (total, informative) partials; sum over
        axis 0 for per-read counts.  bucket layout: pass the with-meta row
        table and the (max_reads+1,) window boundaries; cuckoo: pass the
        plane pair, the slot-meta array, and the read-id plane."""
        if self.layout == "bucket":
            return self._classify(table, bases, read_id_or_boundaries)
        return self._classify(table[0], table[1], meta, bases, read_id_or_boundaries)

    def classify_multi_batch(self, table, bases, boundaries, n_strains: int):
        """Multi-strain (EP) sharded classification, bucket layout only:
        per-data-shard (n_data, max_reads, n_strains) partials of per-read
        total / informative hits, decoded from the 2-bit-per-strain meta
        lanes (multi_detect's union-table packing).  Sum over axis 0 for
        the per-read matrices — bit-identical to the single-device
        _classify_multi (tests/test_parallel.py)."""
        if self.layout != "bucket":
            raise ValueError("classify_multi_batch requires the bucket layout")
        cache = getattr(self, "_classify_multi_cache", None)
        if cache is None:
            cache = self._classify_multi_cache = {}
        fn = cache.get(n_strains)
        if fn is None:
            fn = jax.jit(
                shard_map(
                    partial(
                        self._classify_multi_body_bucket, k=self.k,
                        h_bits=self.h_bits, salt=self.salt,
                        shard_buckets=self.shard_buckets, n_strains=n_strains,
                    ),
                    mesh=self.mesh,
                    in_specs=(P("index", None), P("data", None), P(None)),
                    out_specs=(P("data", None, None), P("data", None, None)),
                )
            )
            cache[n_strains] = fn
        return fn(table, bases, boundaries)


class ShardedPanelEngine:
    """KmerEngine-compatible facade for sharded panel counting, so the
    scrub pipeline runs unchanged over a (data x index) device mesh.

    Bit-identical to single-device runs (integer count merge).
    """

    def __init__(self, index, n_data: int, n_index: int, devices=None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.k = index.k
        self.layout = index.layout
        self.mesh = make_mesh(n_data, n_index, devices=devices)
        t = index.table
        self._engine = ShardedKmerEngine(
            index.k, self.mesh, t.h_bits, t.salt, t.num_slots, layout=index.layout
        )
        if index.layout == "bucket":
            spec = NamedSharding(self.mesh, P("index", None))
            self._table = jax.device_put(jnp.asarray(t.table), spec)
        else:
            spec = NamedSharding(self.mesh, P("index"))
            self._table = (
                jax.device_put(
                    jnp.asarray(np.ascontiguousarray(t.table[:, 0])), spec
                ),
                jax.device_put(
                    jnp.asarray(np.ascontiguousarray(t.table[:, 1])), spec
                ),
            )
        self.n_data = n_data

    def table_for(self, index):
        return self._table

    def init_counts(self, index):
        return self._engine.init_counts()

    def counts_from_numpy(self, index, counts_np):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        full = np.zeros((self.n_data, counts_np.shape[0]), dtype=counts_np.dtype)
        full[0] = counts_np
        return jax.device_put(
            jnp.asarray(full), NamedSharding(self.mesh, P("data", "index"))
        )

    def finalize_counts(self, counts) -> np.ndarray:
        return self._engine.merge_counts(counts)

    def count_batch(self, counts, table, h_bits, salt, bases):
        # pad rows to a multiple of the data axis
        r = bases.shape[0]
        pad = (-r) % self.n_data
        if pad:
            bases = np.concatenate(
                [bases, np.full((pad, bases.shape[1]), 4, dtype=bases.dtype)]
            )
        return self._engine.count_batch(counts, table, bases)
