"""Strain k-mer index: canonical-code set + cuckoo table + encounter order.

Replaces the reference's in-process BIO_hash of k-mer strings (reference
src/genome_compare.c:967-1030 builds it; every other stage queries it) with:

- ``codes``: the distinct canonical k-mers of the strain genome as packed
  uint64, in FIRST-ENCOUNTER order — the reference's hash insertion order,
  which (together with the djb2 replay in strainer2_tpu.index.refhash_order)
  lets outputs reproduce the reference row order bit-for-bit (SURVEY.md §2.5).
- ``genome_counts``: occurrences of each k-mer in the genome scan (column 0
  of the kmer_scrub_count table).
- ``table``: the device-side cuckoo membership table; ``slot_of_key`` links
  each code to its table row so slot-indexed device count/meta arrays can be
  gathered back into key order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import numpy as np

from strainer2_tpu.constants import DEFAULT_K
from strainer2_tpu.index.bucket import BucketTable, build_bucket_table
from strainer2_tpu.index.cuckoo import CuckooTable, build_cuckoo
from strainer2_tpu.io.batches import DEFAULT_ROW_LEN, DEFAULT_ROWS, pack_stream
from strainer2_tpu.io.fastx import read_fastx
from strainer2_tpu.ops.packing_np import split_code64_np

__all__ = ["StrainIndex", "scan_file_codes"]


def scan_file_codes(
    path: str,
    engine,
    rows: int = DEFAULT_ROWS,
    row_len: int = DEFAULT_ROW_LEN,
    device: bool = False,
) -> np.ndarray:
    """All valid canonical codes of a FASTA/FASTQ file in genome-scan order.

    Index construction is the cold path and its output (every window code)
    must land on host anyway, so the default extractor is the vectorized
    NumPy twin of the device kernel — bulk device->host readback is the
    wrong direction for this stage (and is pathologically slow over
    remote-attached TPU transports).  Pass device=True to use the TPU
    extraction kernel instead.
    """
    if device:
        chunks = []
        seqs = (rec.seq for rec in read_fastx(path))
        for batch in pack_stream(seqs, engine.k, rows=rows, row_len=row_len):
            chunks.append(engine.extract_codes(batch.bases))
        if not chunks:
            return np.empty(0, dtype=np.uint64)
        return np.concatenate(chunks)

    from strainer2_tpu.native import scan_file_codes_native

    native = scan_file_codes_native(path, engine.k)
    if native is not None:
        return native

    from strainer2_tpu.ops.packing_np import canonical_codes_np, encode_ascii_np

    chunks = []
    for rec in read_fastx(path):
        codes = encode_ascii_np(np.frombuffer(rec.seq, dtype=np.uint8))
        ccodes, valid = canonical_codes_np(codes, engine.k)
        if ccodes.size:
            chunks.append(ccodes[valid])
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(chunks)


@dataclass
class StrainIndex:
    k: int
    codes: np.ndarray  # (N,) uint64, first-encounter order
    genome_counts: np.ndarray  # (N,) uint32
    # membership table, built LAZILY on first .table access: the
    # multi-strain pipelines consume only codes/genome_counts per strain
    # (lookups go through the UNION table), so S strains no longer pay
    # S table builds (~0.3-0.5 s and hundreds of MB each) they never use
    table_: object = field(default=None, repr=False)
    layout_: "str | None" = field(default=None, repr=False)

    _device_table: object = field(default=None, repr=False)

    @property
    def table(self):
        if self.table_ is None:
            if self.layout == "bucket":
                self.table_ = build_bucket_table(self.codes, self.k)
            else:
                self.table_ = build_cuckoo(self.codes, self.k)
        return self.table_

    @classmethod
    def from_scan_codes(cls, scan_codes: np.ndarray, k: int = DEFAULT_K,
                        layout: str | None = None) -> "StrainIndex":
        """Build from the full (with duplicates) genome-scan code stream.

        layout='bucket' (single-gather lookup; TPU default) or 'cuckoo'
        (plane pair; CPU default, and used by the index-sharded
        multi-chip engine).  None picks per backend.
        """
        if layout is None:
            from strainer2_tpu.pipeline.engine import default_layout

            layout = default_layout()
        if scan_codes.size == 0:
            raise ValueError("no valid k-mers found in genome")
        from strainer2_tpu.native import unique_encounter_native

        native = unique_encounter_native(scan_codes)
        if native is not None:
            codes, genome_counts = native
        else:
            uniq, first_idx, counts = np.unique(
                scan_codes, return_index=True, return_counts=True
            )
            order = np.argsort(first_idx, kind="stable")
            codes = uniq[order]
            genome_counts = counts[order].astype(np.uint32)
        return cls(k=k, codes=codes, genome_counts=genome_counts, layout_=layout)

    @classmethod
    def from_unique_codes(cls, codes: np.ndarray, k: int = DEFAULT_K,
                          layout: str | None = None) -> "StrainIndex":
        """Build from codes already known to be distinct (e.g. a union of
        per-strain key sets) — skips the first-encounter unique pass."""
        if layout is None:
            from strainer2_tpu.pipeline.engine import default_layout

            layout = default_layout()
        codes = np.asarray(codes, dtype=np.uint64)
        if codes.size == 0:
            raise ValueError("no valid k-mers found in genome")
        return cls(k=k, codes=codes,
                   genome_counts=np.ones(codes.shape[0], dtype=np.uint32),
                   layout_=layout)

    @classmethod
    def from_fasta(cls, path: str, engine, rows: int = DEFAULT_ROWS,
                   row_len: int = DEFAULT_ROW_LEN) -> "StrainIndex":
        return cls.from_scan_codes(
            scan_file_codes(path, engine, rows, row_len), k=engine.k,
            layout=getattr(engine, "layout", None),
        )

    @property
    def layout(self) -> str:
        if self.table_ is not None:
            return getattr(self.table_, "layout", "cuckoo")
        if self.layout_ is None:
            from strainer2_tpu.pipeline.engine import default_layout

            self.layout_ = default_layout()
        return self.layout_

    # ---- derived views ----
    @property
    def num_kmers(self) -> int:
        return self.codes.shape[0]

    def native_counter(self):
        """Host-side fused panel counter over this index (cached); None
        when the native library is unavailable."""
        if not hasattr(self, "_native_counter"):
            try:
                from strainer2_tpu.native import NativePanelCounter

                self._native_counter = NativePanelCounter(
                    self.codes, self.table.slot_of_key, self.k
                )
            except (RuntimeError, MemoryError):
                self._native_counter = None
        return self._native_counter

    def device_table(self):
        """Device-resident membership table (uploaded once, cached).

        bucket layout: the (num_buckets, 64) row array.
        cuckoo layout: two contiguous 1-D (hi, lo) planes — separate
        arrays keep XLA's gather on its vectorized path (see
        ops/lookup.py performance notes).
        """
        if self._device_table is None:
            import jax.numpy as jnp
            import numpy as _np

            if self.layout == "bucket":
                self._device_table = jnp.asarray(self.table.table)
            else:
                self._device_table = (
                    jnp.asarray(_np.ascontiguousarray(self.table.table[:, 0])),
                    jnp.asarray(_np.ascontiguousarray(self.table.table[:, 1])),
                )
        return self._device_table

    def key_planes(self) -> tuple[np.ndarray, np.ndarray]:
        return split_code64_np(self.codes, self.k)

    def slot_values(self, per_key: np.ndarray, fill=0) -> np.ndarray:
        """Scatter a per-key array into a (num_slots,) slot-indexed array."""
        out = np.full(self.table.num_slots, fill, dtype=np.asarray(per_key).dtype)
        out[self.table.slot_of_key] = per_key
        return out

    def key_values(self, per_slot: np.ndarray) -> np.ndarray:
        """Gather a slot-indexed (device result) array back to key order."""
        return np.asarray(per_slot)[self.table.slot_of_key]

    # ---- persistence (checkpoint / resume at stage granularity) ----
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            k=self.k,
            codes=self.codes,
            genome_counts=self.genome_counts,
            table=self.table.table,
            slot_of_key=self.table.slot_of_key,
            h_bits=self.table.h_bits,
            salt=self.table.salt,
            layout=self.layout,
        )

    @classmethod
    def load(cls, path: str) -> "StrainIndex":
        z = np.load(path)
        layout = str(z["layout"]) if "layout" in z else "cuckoo"
        cls_table = BucketTable if layout == "bucket" else CuckooTable
        table = cls_table(
            z["table"], z["slot_of_key"], int(z["h_bits"]), int(z["salt"])
        )
        return cls(
            k=int(z["k"]),
            codes=z["codes"],
            genome_counts=z["genome_counts"],
            table_=table,
        )
