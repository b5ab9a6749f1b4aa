"""Multi-strain single-pass detection — the framework's EP axis.

The reference scores one strain per process and re-reads every target
metagenome once per strain (Snakemake fan-out, SURVEY.md §2.7).  Here up
to 256 strains share one union membership table: two bits per strain
(present, informative) pack across the bucket row's 16-lane meta blocks
(16 strains per block, ceil(S/16) blocks per row, all resolved by the
same single gather — ops.lookup.bucket_lookup_words), so a single stream
pass over the targets yields every strain's per-read total/informative
counts — the target data is read and canonicalized once instead of S
times.

Outputs are per-strain kmer_hits files byte-identical to running the
single-strain detector per strain (verified in tests/test_multi_detect.py).
Strains beyond MAX_STRAINS_PER_PASS are processed in chunks by the caller.
"""

from __future__ import annotations

import gzip
import os
import sys
from dataclasses import dataclass
from functools import partial
from typing import IO

import numpy as np

from strainer2_tpu.constants import INFORMATIVE_KMER, IS_PAIRED_END, NOT_PAIRED_END
from strainer2_tpu.index.build import StrainIndex
from strainer2_tpu.index.bucket import build_bucket_table
from strainer2_tpu.io.batches import (
    batch_read_grouping,
    max_reads_capacity,
    read_codes_from_batch,
)
from strainer2_tpu.ops.packing import canonical_codes_np, decode_codes_np
from strainer2_tpu.pipeline.detect import DetectConfig, StrainDetector
from strainer2_tpu.pipeline.engine import KmerEngine

__all__ = [
    "MultiStrainDetector",
    "MAX_STRAINS_PER_PASS",
    "plan_strain_passes",
    "plan_strain_passes_from_codes",
    "projected_rows_bytes",
    "device_mem_budget",
    "estimate_genome_kmers",
]

MAX_STRAINS_PER_PASS = 256  # 2 meta bits per strain, 16 strains per 16-lane
# meta block; a 256-strain pass uses 288-lane rows (16 meta blocks, 512 meta
# bits/key; ops.lookup.bucket_lookup_words) — the same single gathered row
# answers all 256 strains, because slice width is nearly free next to the
# serialized per-index access (docs/PERFORMANCE.md).  The cap is set by the
# measured v5e sweep (docs/PERFORMANCE.md "Classify vector-program
# ablation": effective strain-lookups/s climbs 5.1G@96 -> 7.5G@256 but
# only +5.7% more by 384) — past 256 the gain no longer pays for the
# linear growth in per-pass HBM (rows leave the ~1 KiB regime) and union
# build cost.
#
# The count cap alone cannot bound device memory: the union row table
# costs num_buckets x row_width x 4 bytes (projected_rows_bytes), and 256
# mostly-DISJOINT ~6.7M-k-mer strains union to ~1.7B keys — hundreds of
# GiB of rows vs 16 GiB of v5e HBM.  Passes are therefore also sized by
# projected bytes against the per-device budget (plan_strain_passes /
# device_mem_budget, override with STRAINER2_DEVICE_MEM_BUDGET), and the
# detector itself refuses an over-budget union with a clear error instead
# of an opaque device OOM.

DEVICE_MEM_BUDGET_ENV = "STRAINER2_DEVICE_MEM_BUDGET"


def projected_rows_bytes(union_keys: int, n_strains: int) -> int:
    """Projected bucket row-table bytes for a union of ``union_keys``
    distinct k-mers carrying ``n_strains`` strains' meta bits.

    Mirrors the build exactly (index/bucket.py build_bucket_table +
    MultiStrainDetector row layout): row_width = 32 key lanes + 16 lanes
    per meta block, ceil(S/16) blocks (min 2); num_buckets = 2**h_bits
    with h_bits = ceil(log2(union/3.3)) (mean bucket load <= 3.3); 4
    bytes per lane."""
    n_words = max(2, -(-int(n_strains) // 16))
    row_width = 32 + 16 * n_words
    h_bits = max(4, int(np.ceil(np.log2(max(int(union_keys), 1) / 3.3))))
    return (1 << h_bits) * row_width * 4


def device_mem_budget() -> int | None:
    """Per-device byte budget for the multi-strain row table, or None for
    unbounded.  STRAINER2_DEVICE_MEM_BUDGET (bytes; float forms like 2e9
    accepted) overrides; otherwise the CPU backend is unbounded (host RAM,
    and the native classifier path never ships rows to a device) and
    device backends use 75% of the reported HBM limit, falling back to
    12 GiB (v5e carries 16 GiB)."""
    env = os.environ.get(DEVICE_MEM_BUDGET_ENV)
    if env:
        return int(float(env))
    import jax

    if jax.default_backend() == "cpu":
        return None
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit") or 0)
        if limit:
            return int(limit * 0.75)
    except Exception:
        pass
    return 12 * 2**30


_UNSET = object()


def plan_strain_passes(kmer_counts, *, max_strains=MAX_STRAINS_PER_PASS,
                       budget=_UNSET, index_shards: int = 1):
    """Split strains into contiguous passes bounded by BOTH the strain
    count cap and the projected union row-table bytes.

    kmer_counts: per-strain distinct-k-mer counts or upper bounds (e.g.
    estimate_genome_kmers).  The union of a pass is bounded above by the
    sum of its strains' counts, so sizing by the sum is conservative:
    related strains share most k-mers and come in well under budget;
    disjoint strains hit the bound exactly.  The production callers (the
    fused pipeline and the detect-multi CLI) size passes on the EXACT
    union instead — plan_strain_passes_from_codes below; this sum-bound
    form remains for callers that only have counts.

    budget: per-device bytes (default device_mem_budget()); None disables
    the byte bound.  index_shards: table shards on an index-sharded mesh —
    the per-device share is bytes/index_shards, so the effective budget
    multiplies.  Returns a list of (start, end) slice bounds covering
    range(len(kmer_counts)).  A single strain projected over budget still
    gets its own pass — the detector's hard check reports it with the
    actual union size."""
    if budget is _UNSET:
        budget = device_mem_budget()
    if budget is not None:
        budget = int(budget) * max(1, int(index_shards))
    passes = []
    start = 0
    n = len(kmer_counts)
    while start < n:
        end = start + 1
        total = int(kmer_counts[start])
        while end < n and end - start < max_strains:
            t = total + int(kmer_counts[end])
            if budget is not None and projected_rows_bytes(t, end - start + 1) > budget:
                break
            total = t
            end += 1
        passes.append((start, end))
        start = end
    return passes


def _gzip_total_uncompressed(path: str) -> int | None:
    """Exact total uncompressed length of a (possibly multi-member) gzip
    file: streaming decode of every member, counting bytes, storing
    nothing.  Stops cleanly at trailing non-gzip bytes after a complete
    member (bgzip pads, archive padding).  None on a decode error — the
    caller falls back to the trailer heuristic and the real scan will
    surface the reference-exact diagnostic later."""
    import zlib

    total = 0
    d = zlib.decompressobj(wbits=31)
    try:
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                while chunk:
                    total += len(d.decompress(chunk))
                    if not d.eof:
                        break
                    # member finished mid-chunk: the remainder is either
                    # the next member or trailing junk
                    chunk = d.unused_data
                    if not chunk.startswith(b"\x1f\x8b"):
                        return total
                    d = zlib.decompressobj(wbits=31)
    except zlib.error:
        return None
    if not d.eof:
        return None  # truncated final member: trailer is untrustworthy too
    return total


def plan_strain_passes_from_codes(codes_list, *, max_strains=MAX_STRAINS_PER_PASS,
                                  budget=_UNSET, index_shards: int = 1):
    """Exact pass planning from per-strain canonical-code arrays.

    plan_strain_passes bounds a pass's union by the SUM of its strains'
    k-mer counts — safe, but wildly conservative for the common case of
    RELATED strains (conspecific variants share most k-mers: 32 strains
    at 0.2% divergence union to ~1.1x one genome, not 32x), so it splits
    work that would fit one pass and every extra pass re-scans the
    targets.  When the per-strain code arrays are available (the fused
    pipeline has them; the detect-multi CLI scans genomes first — seconds
    per genome, amortized against the target scan each avoided pass
    saves), the union can be sized EXACTLY: merge codes strain by strain
    and cut the pass when the projected row-table bytes exceed the
    budget.  Same return shape as plan_strain_passes.

    codes_list entries may be arrays or zero-arg callables returning
    arrays (lazy scanning: only the running union and one genome's codes
    stay in memory; the genome at a pass boundary is fetched twice —
    one extra scan per pass, noise against the target scan it saves)."""
    if budget is _UNSET:
        budget = device_mem_budget()
    if budget is not None:
        budget = int(budget) * max(1, int(index_shards))

    def get(i):
        c = codes_list[i]
        return np.asarray(c() if callable(c) else c, dtype=np.uint64)

    passes = []
    start = 0
    n = len(codes_list)
    while start < n:
        union = np.unique(get(start))
        end = start + 1
        while end < n and end - start < max_strains:
            cand = np.union1d(union, get(end))
            if budget is not None and projected_rows_bytes(
                cand.shape[0], end - start + 1
            ) > budget:
                break
            union = cand
            end += 1
        passes.append((start, end))
        start = end
    return passes


def estimate_genome_kmers(path: str) -> int:
    """Upper-bound estimate of a genome's distinct canonical k-mers for
    pass planning, without a k-mer scan: the uncompressed byte size
    (>= bases >= windows >= distinct k-mers).

    For .gz the exact length comes from one streaming decode over all
    members (_gzip_total_uncompressed) — the ISIZE trailer alone reports
    only the LAST member, so a multi-member file (cat of .gz parts, bgzip
    — common for genomes) would undersize the bound and the planner would
    over-pack passes.  The decode is milliseconds per genome, noise next
    to the panel/target scans the plan governs.  On a corrupt stream the
    trailer (then the compressed size) remains the fallback."""
    size = os.path.getsize(path)
    if path.endswith(".gz") and size >= 20:
        total = _gzip_total_uncompressed(path)
        if total:
            return total
        with open(path, "rb") as f:
            f.seek(-4, 2)
            isize = int.from_bytes(f.read(4), "little")
        if isize:
            return isize
    return size


@dataclass
class _StrainState:
    r_file: str
    a_file: str
    codes_sorted: np.ndarray
    types_sorted: np.ndarray  # aligned with codes_sorted
    total_kmers: int
    total_informative: int
    num_marked: int = 0  # informative lines marked from the -a file


class _UnionIndexView:
    """Minimal StrainIndex-like facade over a BucketTable for panel
    counting (count_panel_file only touches .table/.device_table())."""

    def __init__(self, table, k):
        self.table = table
        self.k = k
        self._dev = None

    def device_table(self):
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = jnp.asarray(self.table.table)
        return self._dev


class MultiStrainDetector:
    """Score several strains against shared target streams in one pass."""

    def __init__(self, strains: list[tuple[str, str]], cfg: DetectConfig | None = None,
                 stdout: IO | None = None, background_list: str | None = None,
                 prebuilt: "list[tuple[str, object, np.ndarray]] | None" = None,
                 indexes: "list | None" = None):
        """strains: (genome, scrubbed-kmer-file) pairs.  The fused
        multi-strain pipeline instead passes ``prebuilt`` — (genome,
        StrainIndex, informative key indices) triples — skipping the
        genome re-scans and the scrubbed-file round trips.  ``indexes``
        (exclusive with prebuilt) supplies per-strain StrainIndex objects
        while keeping the scrubbed-file (-a) marking: the detect-multi
        CLI retains the indexes its exact pass planner already scanned,
        so each genome is read once, not twice."""
        if prebuilt is not None:
            strains = [(r, None) for r, _, _ in prebuilt]
        if not 1 <= len(strains) <= MAX_STRAINS_PER_PASS:
            raise ValueError(f"1..{MAX_STRAINS_PER_PASS} strains per pass")
        self.cfg = cfg or DetectConfig()
        self.stdout = stdout if stdout is not None else sys.stdout
        k = self.cfg.k
        self.max_reads = max_reads_capacity(k, self.cfg.rows, self.cfg.row_len)
        # borrowed single-strain stream plumbing (native or Python packer)
        self.engine = KmerEngine(k, self.max_reads)
        self._read_stream = StrainDetector._read_stream.__get__(self)

        # per-strain state via the single-strain constructor (reuses the
        # scrubbed-k-mer marking incl. its diagnostics).  Strains are
        # independent (each scans its own genome + scrubbed file), so they
        # build across a worker pool; each strain's stdout diagnostics
        # buffer and flush in strain order — exactly the serial contract.
        import io

        def _build_one(s):
            r_file, a_file = strains[s]
            buf = io.StringIO()
            try:
                det = StrainDetector(
                    r_file, a_file, self.cfg, stdout=buf,
                    index=(
                        prebuilt[s][1] if prebuilt is not None
                        else indexes[s] if indexes is not None
                        else None
                    ),
                    informative_keys=(
                        prebuilt[s][2] if prebuilt is not None else None
                    ),
                )
            except BaseException as e:
                # carry the partial diagnostics so the consumer can flush
                # them in strain order before propagating
                e._s2_stdout = buf.getvalue()  # type: ignore[attr-defined]
                raise
            order = np.argsort(det.index.codes, kind="stable")
            state = _StrainState(
                r_file=r_file,
                a_file=a_file,
                codes_sorted=det.index.codes[order],
                types_sorted=det.kmer_type[order],
                total_kmers=det.index.num_kmers,
                total_informative=int(
                    np.count_nonzero(det.kmer_type == INFORMATIVE_KMER)
                ),
                num_marked=det.num_informative_marked,
            )
            return state, det.index.codes, det.kmer_type, buf

        from strainer2_tpu.pipeline.multi_scrub import strain_threads

        threads = strain_threads(len(strains))
        self.states: list[_StrainState] = []
        per_strain_codes: list[np.ndarray] = []
        per_strain_types: list[np.ndarray] = []
        if threads > 1 and len(strains) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(threads) as ex:
                futures = [ex.submit(_build_one, s) for s in range(len(strains))]
                for fu in futures:
                    try:
                        state, codes, types, buf = fu.result()
                    except BaseException as e:
                        # futures resolve in strain order here, so earlier
                        # strains' diagnostics are already flushed; flush
                        # the failing strain's before propagating — the
                        # serial contract
                        self.stdout.write(getattr(e, "_s2_stdout", ""))
                        raise
                    self.stdout.write(buf.getvalue())
                    self.states.append(state)
                    per_strain_codes.append(codes)
                    per_strain_types.append(types)
        else:
            for s in range(len(strains)):
                try:
                    state, codes, types, buf = _build_one(s)
                except BaseException as e:
                    self.stdout.write(getattr(e, "_s2_stdout", ""))
                    raise
                self.stdout.write(buf.getvalue())
                self.states.append(state)
                per_strain_codes.append(codes)
                per_strain_types.append(types)

        union = np.unique(np.concatenate(per_strain_codes))
        # 16 strains (2 bits each) per 32-bit meta word; the row carries
        # ceil(S/16) meta blocks (min 2 = the default 64-lane row), all
        # resolved by the same single serialized gather
        self._n_words = max(2, -(-len(strains) // 16))
        # refuse an over-budget union with a clear, actionable error
        # instead of an opaque device OOM (the count cap alone cannot
        # bound memory — see the note at MAX_STRAINS_PER_PASS)
        budget = device_mem_budget()
        shards = self.cfg.mesh[1] if self.cfg.mesh else 1
        if budget is not None:
            needed = projected_rows_bytes(union.shape[0], len(strains))
            if needed > budget * shards:
                raise RuntimeError(
                    f"multi-strain union row table needs "
                    f"{needed / 2**30:.2f} GiB ({union.shape[0]:,} union "
                    f"keys, {len(strains)} strains) but the device memory "
                    f"budget is {budget / 2**30:.2f} GiB"
                    + (f" x {shards} index shards" if shards > 1 else "")
                    + "; run fewer strains per pass "
                    "(plan_strain_passes sizes passes from per-strain "
                    "k-mer counts), shard the index over a larger mesh "
                    f"(--mesh DxI), or raise {DEVICE_MEM_BUDGET_ENV}"
                )
        self.table = build_bucket_table(
            union, k, row_width=32 + 16 * self._n_words
        )
        if budget is not None:
            # re-check the BUILT table: build_bucket_table grows h_bits when
            # a bucket overflows (index/bucket.py "pathological key set"),
            # so a key set that trips the growth path can exceed the
            # pre-build projection — fail loudly here rather than OOM later
            actual = self.table.table.nbytes
            if actual > budget * shards:
                raise RuntimeError(
                    f"multi-strain union row table BUILT to "
                    f"{actual / 2**30:.2f} GiB "
                    f"(2**{self.table.h_bits} buckets x "
                    f"{self.table.table.shape[1]} lanes; the build grew the "
                    "bucket space beyond the pre-build projection for this "
                    "key distribution) but the device memory budget is "
                    f"{budget / 2**30:.2f} GiB"
                    + (f" x {shards} index shards" if shards > 1 else "")
                    + "; run fewer strains per pass, shard the index over a "
                    f"larger mesh (--mesh DxI), or raise {DEVICE_MEM_BUDGET_ENV}"
                )

        if background_list:
            # shared background counting: ONE panel scan over the union,
            # per-strain projection, then each strain's reference threshold
            # logic (byte-identical to per-strain -g runs)
            self._background_filter_shared(
                union, per_strain_codes, per_strain_types, background_list
            )
            # refresh per-strain sorted type views after demotion
            for st, codes, types in zip(self.states, per_strain_codes, per_strain_types):
                order = np.argsort(codes, kind="stable")
                st.types_sorted = types[order]
                st.total_informative = int(
                    np.count_nonzero(types == INFORMATIVE_KMER)
                )

        # union table meta words: word s//16 bit 2*(s%16) = strain s has
        # this k-mer, bit 2*(s%16)+1 = informative for strain s
        meta_words = np.zeros((self._n_words, union.shape[0]), dtype=np.uint32)
        for s, (codes, types) in enumerate(zip(per_strain_codes, per_strain_types)):
            pos = np.searchsorted(union, codes)
            w, sh = s // 16, np.uint32(2 * (s % 16))
            meta_words[w, pos] |= np.uint32(1) << sh
            inf = types == INFORMATIVE_KMER
            meta_words[w, pos[inf]] |= np.uint32(1) << (sh + np.uint32(1))
        slot_words = np.zeros(
            (self._n_words, self.table.num_slots), dtype=np.uint32
        )
        slot_words[:, self.table.slot_of_key] = meta_words
        self._union_codes = union  # native classifier inputs (CPU fast path)
        self._union_meta_words = meta_words

        import jax
        import jax.numpy as jnp

        self._rows_dev = jnp.asarray(self.table.with_meta_words(list(slot_words)))
        self._classify = jax.jit(
            partial(
                _classify_multi,
                k=k,
                max_reads=self.max_reads,
                n_strains=len(strains),
            ),
            static_argnames=("h_bits", "salt"),
        )
        self._passing_any = jax.jit(
            partial(
                _passing_any_pairs,
                min_t=self.cfg.min_hits_for_good_match,
                min_i=self.cfg.min_hits_for_informative_read,
            ),
            static_argnames=("paired",),
        )
        self._gather_passing = jax.jit(
            _gather_passing_rows, static_argnames=("paired",)
        )
        self._sharded = None
        if self.cfg.mesh is not None:
            # EP x (data, index) mesh: the union table (and its packed
            # per-strain meta lanes) shards over 'index', read batches over
            # 'data'; per-read matrices stay bit-identical (test_parallel.py)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from strainer2_tpu.parallel.sharding import ShardedKmerEngine, make_mesh

            d, i = self.cfg.mesh
            mesh = make_mesh(d, i)
            self._sharded = ShardedKmerEngine(
                k, mesh, self.table.h_bits, self.table.salt,
                self.table.num_slots, max_reads=self.max_reads, layout="bucket",
            )
            self._rows_dev = jax.device_put(
                self._rows_dev, NamedSharding(mesh, P("index", None))
            )

    def _native_multi_classifier(self):
        """Fused native multi-strain classifier (CPU fast path); values are
        the packed per-strain meta words.  None on device backends."""
        if not hasattr(self, "_native_cls"):
            self._native_cls = None
            from strainer2_tpu.pipeline.scrub_count import _use_native_counting

            if self._sharded is None and _use_native_counting(self.engine):
                try:
                    from strainer2_tpu.native import NativeClassifier

                    n_strains = len(self.states)
                    words = self._union_meta_words
                    self._native_cls = NativeClassifier(
                        self._union_codes,
                        words[0].view(np.int32),
                        self.cfg.k,
                        values_hi=(
                            words[1].view(np.int32) if n_strains > 16 else None
                        ),
                        extra_words=(
                            [w.view(np.int32) for w in words[2:]]
                            if n_strains > 32
                            else None
                        ),
                    )
                except (RuntimeError, MemoryError):
                    self._native_cls = None
        return self._native_cls

    def _quantify_sample_native(self, nc, f1: str, f2: str | None, ftype: int,
                                outs: list[IO]) -> None:
        """Native twin of _quantify_sample: per-read (n, S) rows from one
        fused pass; pairing, thresholds, emission, and summaries unchanged."""
        from strainer2_tpu.constants import IS_PAIRED_END_INTERLEAVE
        from strainer2_tpu.native import (
            NativeClassifyStream,
            NativeReadExtractor,
        )
        from strainer2_tpu.pipeline.detect import (
            _aggregate_classify_chunk,
            _exit_unreadable_sample,
        )

        cfg = self.cfg
        k = cfg.k
        paired = ftype != NOT_PAIRED_END
        mode = (1 if ftype == IS_PAIRED_END
                else 2 if ftype == IS_PAIRED_END_INTERLEAVE else 0)
        try:
            stream = nc.open_multi_stream(f1, f2, mode, len(self.states))
        except OSError as e:
            _exit_unreadable_sample(e, f1, f2)

        total_kmers_evaluated = 0
        total_reads_evaluated = 0
        odd_interleave = False
        base = 0
        ex1 = ex2 = None
        for lens, tot, inf in stream:
            n = lens.size
            if n % 2 and paired and ftype == IS_PAIRED_END_INTERLEAVE:
                odd_interleave = True
            ke, re_, pe1, t1, i1, t2, i2 = _aggregate_classify_chunk(
                lens, tot, inf, paired, k
            )
            total_kmers_evaluated += ke
            total_reads_evaluated += re_

            passing = ((t1 + t2) >= cfg.min_hits_for_good_match) & (
                (i1 + i2) >= cfg.min_hits_for_informative_read
            )  # (pairs, S)
            if passing.any():
                pair_idx, strain_idx = np.nonzero(passing)
                if ex1 is None:
                    ex1 = NativeReadExtractor(f1)
                    if ftype == IS_PAIRED_END:
                        ex2 = NativeReadExtractor(f2)
                for j in np.unique(pair_idx):
                    r1 = base + int(pe1[j])
                    if ftype == IS_PAIRED_END:
                        reads = [
                            ex1.read(r1 // 2, int(lens[pe1[j]])),
                            ex2.read(r1 // 2, int(lens[pe1[j] + 1])),
                        ]
                    else:
                        reads = [ex1.read(r1, int(lens[pe1[j]]))]
                        if paired:  # PEI: mate is next in the same file
                            reads.append(ex1.read(r1 + 1, int(lens[pe1[j] + 1])))
                    canons = [self._canonical_read(codes) for codes in reads]
                    for s in strain_idx[pair_idx == j]:
                        prefix = (
                            f"{f1}\t{t1[j, s]}\t{i1[j, s]}\t{t2[j, s]}\t{i2[j, s]}\t"
                        )
                        for canon in canons:
                            self._emit_rows(outs[s], self.states[s], prefix, canon)
            base += n
        pe2_early = stream.state == NativeClassifyStream.PE2_ENDED_EARLY
        for h in (ex1, ex2):
            if h is not None:
                h.close()
        stream.close()
        if pe2_early or odd_interleave:
            f2_name = f2 if ftype == IS_PAIRED_END else f1
            print(
                f"reached end of PE2 ({f2_name}) before end of PE1 ({f1}), "
                "check that file names are correct",
                file=sys.stderr,
            )
            raise SystemExit(1)

        for s, st in enumerate(self.states):
            outs[s].write("#%s\ttotal_kmer_evaluated\t%d\n" % (f1, total_kmers_evaluated))
            outs[s].write("#%s\ttotal_reads_evaluated\t%d\n" % (f1, total_reads_evaluated))
            outs[s].write("#%s\ttotal_genome_kmers\t%d\n" % (f1, st.total_kmers))
            outs[s].write(
                "#%s\ttotal_genome_informative_kmers\t%d\n" % (f1, st.total_informative)
            )

    def _background_filter_shared(self, union, per_strain_codes, per_strain_types,
                                  background_list: str) -> None:
        import jax.numpy as jnp

        from strainer2_tpu.pipeline.detect import background_demote
        from strainer2_tpu.pipeline.scrub_count import count_panel_file, read_list_file

        from strainer2_tpu.pipeline.scrub_count import (
            _use_native_counting,
            count_files_native_pooled,
        )

        cfg = self.cfg
        eng = KmerEngine(cfg.k, layout="bucket")
        union_index = _UnionIndexView(self.table, cfg.k)
        paths = read_list_file(background_list)
        import jax

        pcount = jax.process_count()
        if pcount > 1:
            # SPMD: each rank counts its share; per-slot integer merge
            # below makes every rank's demotions identical (bit-exact)
            from strainer2_tpu.parallel.distributed import host_file_partition

            paths = host_file_partition(paths, jax.process_index(), pcount)
        nc = None
        if _use_native_counting(eng):
            try:
                from strainer2_tpu.native import NativePanelCounter

                nc = NativePanelCounter(union, self.table.slot_of_key, cfg.k)
            except (RuntimeError, MemoryError):
                nc = None
        per_slot = count_files_native_pooled(nc, paths, self.table.num_slots)
        if per_slot is None:
            counts = jnp.zeros(self.table.num_slots, dtype=jnp.uint32)
            for path in paths:
                counts = count_panel_file(
                    eng, union_index, counts, path, cfg.rows, cfg.row_len
                )
            per_slot = np.asarray(counts)
        if pcount > 1:
            from strainer2_tpu.parallel.distributed import merge_across_hosts

            per_slot = merge_across_hosts(per_slot)
        bg_union = per_slot[self.table.slot_of_key].astype(np.int64)  # union order
        for st, codes, types in zip(self.states, per_strain_codes, per_strain_types):
            pos = np.searchsorted(union, codes)
            background_demote(
                types, bg_union[pos], st.num_marked,
                cfg.fraction_background_to_remove, background_list, self.stdout,
            )

    def quantify_all(self, out_paths: list[str], batch_list: str,
                     checkpoint_dir: str | None = None) -> None:
        """One pass over every sample in the batch file; writes one
        kmer_hits gz file per strain.

        Multi-process SPMD and/or sample-granular resume run through the
        same staged machinery as the single-strain detector
        (detect._staged_quantify); each sample's payload is its S
        per-strain texts."""
        from strainer2_tpu.pipeline.detect import (
            _detect_threads,
            _parse_batch_entries,
            _run_sample_pool,
            _staged_quantify,
        )

        import jax

        pidx, pcount = jax.process_index(), jax.process_count()
        if pcount > 1 and self.cfg.mesh is not None:
            # Why refused (the current largest-scale boundary): this
            # framework's multi-process mode partitions WORK (samples /
            # panel files) per rank — each rank runs its own independent
            # device program, so ranks execute different program counts and
            # cannot share one SPMD mesh (divergent collectives deadlock).
            # An over-HBM union that also needs multiple HOSTS would require
            # the opposite decomposition: one global mesh over all hosts'
            # devices with every rank feeding identical batches
            # (sample-partitioning disabled).  Until that path exists, the
            # routable deployments are (a) one process + --mesh DxI sharding
            # the union over one host's devices (executes over-budget
            # unions: tests/test_multi_detect.py
            # test_over_budget_union_executes_sharded_to_identical_output),
            # or (b) multi-process sample partitioning with per-device-
            # budget pass sizing (plan_strain_passes).  README "Multi-strain
            # scaling" records this boundary.  Reference analogue: the one
            # in-process table, /root/reference/src/strain_detect.c:137-139.
            print(
                "mesh sharding and multi-process sample partitioning cannot "
                "combine: run either one process with a device mesh, or one "
                "process per host (the default here)",
                file=sys.stderr,
            )
            raise SystemExit(1)
        if pcount > 1 or checkpoint_dir:
            import io

            entries = _parse_batch_entries(batch_list)
            nc = self._native_multi_classifier()
            n_strains = len(self.states)
            if nc is not None:
                run_one = lambda args, sinks: self._quantify_sample_native(
                    nc, *args, sinks
                )
            else:
                run_one = lambda args, sinks: self._quantify_sample(*args, sinks)
            outs = (
                [gzip.open(p, "wt", compresslevel=9) for p in out_paths]
                if pidx == 0
                else None
            )

            def emit(payloads):
                if outs is not None:
                    for o, p in zip(outs, payloads):
                        o.write(p)

            try:
                _staged_quantify(
                    entries, run_one,
                    lambda: [io.StringIO() for _ in range(n_strains)],
                    lambda sinks: [b.getvalue() for b in sinks],
                    emit, self.stdout, checkpoint_dir=checkpoint_dir,
                    pool_ok=nc is not None,
                )
            finally:
                if outs is not None:
                    for o in outs:
                        o.close()
            return

        outs = [gzip.open(p, "wt", compresslevel=9) for p in out_paths]
        try:
            entries = _parse_batch_entries(batch_list)
            n_samples = sum(1 for kind, _ in entries if kind == "sample")
            nc = self._native_multi_classifier()
            threads = _detect_threads(n_samples)
            if nc is not None and n_samples > 1 and threads > 1:
                # shared pool (detect._run_sample_pool): workers fill S
                # per-strain buffers; the main thread writes them to the S
                # gzip streams in list order — byte-identical, incl. the
                # sequential error-run semantics
                import io

                n_strains = len(self.states)

                def emit(payloads):
                    for o, payload in zip(outs, payloads):
                        o.write(payload)

                _run_sample_pool(
                    entries, threads,
                    lambda: [io.StringIO() for _ in range(n_strains)],
                    lambda args, bufs: self._quantify_sample_native(
                        nc, *args, bufs
                    ),
                    lambda bufs: [b.getvalue() for b in bufs],
                    emit, self.stdout,
                )
            else:
                for kind, val in entries:
                    if kind == "msg":
                        self.stdout.write(val)
                    else:
                        self._quantify_sample(*val, outs)
        finally:
            for o in outs:
                o.close()

    def _quantify_sample(self, f1: str, f2: str | None, ftype: int, outs: list[IO]) -> None:
        cfg = self.cfg
        k = cfg.k
        paired = ftype != NOT_PAIRED_END
        t = self.table
        n_windows = cfg.rows * (cfg.row_len - k + 1)
        n_strains = len(self.states)

        total_kmers_evaluated = 0
        total_reads_evaluated = 0

        nc = self._native_multi_classifier()
        if nc is not None:
            return self._quantify_sample_native(nc, f1, f2, ftype, outs)

        # reuse the single-strain stream builder (native or Python packer)
        # and its error contract (unreadable file / PE2-ended-early)
        from strainer2_tpu.native import Pe2EndedEarlyError
        from strainer2_tpu.pipeline.detect import _exit_unreadable_sample

        from strainer2_tpu.utils.prefetch import prefetch

        stream_builder = StrainDetector._batch_stream
        # prefetch: the next batch decodes+packs on a background thread
        # while the device classifies the current one (the single-strain
        # path has done this since round 2; the multi path's host pack is
        # the same measured binding stage — docs/PERFORMANCE.md "Sustained
        # DEVICE-FED detection")
        try:
            stream = iter(prefetch(stream_builder(self, f1, f2, ftype)))
        except OSError as e:
            _exit_unreadable_sample(e, f1, f2)
        while True:
            try:
                batch = next(stream)
            except StopIteration:
                break
            except Pe2EndedEarlyError:
                print(
                    f"reached end of PE2 ({f2}) before end of PE1 ({f1}), "
                    "check that file names are correct",
                    file=sys.stderr,
                )
                raise SystemExit(1)
            except OSError as e:
                _exit_unreadable_sample(e, f1, f2)
            n = batch.n_reads
            boundaries = np.full(self.max_reads + 1, n_windows, dtype=np.int32)
            boundaries[:n] = batch.window_starts
            # `sel` maps the rows of t1/i1/t2/i2 back to pair ordinals
            # (None = one row per pair, the full-matrix route)
            sel = None
            skip_batch = False
            if self._sharded is not None:
                bases = batch.bases
                pad = (-bases.shape[0]) % self._sharded.n_data
                if pad:
                    bases = np.concatenate(
                        [bases, np.full((pad, bases.shape[1]), 4, dtype=bases.dtype)]
                    )
                tot_d, inf_d = self._sharded.classify_multi_batch(
                    self._rows_dev, bases, boundaries, n_strains
                )
                tot = np.asarray(tot_d).sum(axis=0)[:n]  # (n, S)
                inf = np.asarray(inf_d).sum(axis=0)[:n]
            else:
                tot_d, inf_d = self._classify(
                    self._rows_dev, batch.bases, boundaries,
                    h_bits=t.h_bits, salt=t.salt,
                )
                # D2H gate: the (max_reads, S) tot/inf matrices are
                # megabytes per batch, and over a remote-attached
                # transport their readback dominates the whole detection
                # wall (docs/PERFORMANCE.md "detect-multi CLI wall-clock
                # at 20x").  Instead: read back a (pairs,) any-strain-
                # passes bool (KB; exact host threshold rule, on device),
                # then gather ONLY the passing pairs' rows — a batch with
                # no passing pair transfers nothing at all, and a hit-
                # dense batch transfers (n_pass_padded, S) x 4 instead of
                # the full matrices.  Byte-identical by construction: the
                # emission block sees the same integers either way.
                any_d = self._passing_any(tot_d, inf_d, paired=paired)
                n_pairs = (n - (n % 2)) // 2 if paired else n
                anyp = np.asarray(any_d)[:n_pairs]
                sel = np.flatnonzero(anyp)
                if sel.size == 0:
                    skip_batch = True
                else:
                    import jax.numpy as jnp

                    # pad to a power-of-two bucket: a handful of compiled
                    # gather shapes covers every batch
                    cap = 1 << max(6, int(np.ceil(np.log2(sel.size))))
                    idx = np.full(cap, -1, dtype=np.int32)
                    idx[: sel.size] = sel
                    t1_d, i1_d, t2_d, i2_d = self._gather_passing(
                        tot_d, inf_d, jnp.asarray(idx), paired=paired
                    )
                    t1 = np.asarray(t1_d)[: sel.size]
                    i1 = np.asarray(i1_d)[: sel.size]
                    t2 = np.asarray(t2_d)[: sel.size]
                    i2 = np.asarray(i2_d)[: sel.size]
            lens = batch.read_lengths
            wins = np.maximum(lens - k + 1, 0) * (lens >= k)
            total_kmers_evaluated += int(wins.sum())
            if paired:
                pe1 = np.arange(0, n - (n % 2), 2)
                total_reads_evaluated += int(np.count_nonzero(lens[pe1] >= k))
            else:
                total_reads_evaluated += int(np.count_nonzero(lens >= k))
                pe1 = np.arange(n)
            if skip_batch:
                continue  # device-checked: no pair passes in this batch
            if sel is None:  # full-matrix route (sharded mesh)
                if paired:
                    t1, i1 = tot[pe1], inf[pe1]
                    t2, i2 = tot[pe1 + 1], inf[pe1 + 1]
                else:
                    t1, i1 = tot, inf
                    t2 = np.zeros_like(t1)
                    i2 = np.zeros_like(i1)
                sel = np.arange(t1.shape[0])

            passing = ((t1 + t2) >= cfg.min_hits_for_good_match) & (
                (i1 + i2) >= cfg.min_hits_for_informative_read
            )  # (rows, S); rows map to pair ordinals via sel
            if passing.any():
                grouping = batch_read_grouping(batch)
                pair_idx, strain_idx = np.nonzero(passing)
                # emit in (strain-major within a pair? reference runs strains
                # independently, so each strain's file sees its own pairs in
                # stream order) -> iterate pairs outer to preserve order per
                # file (sel is ascending, so compacted rows keep pair order)
                for j in np.unique(pair_idx):
                    r1 = int(pe1[sel[j]])
                    reads = [read_codes_from_batch(batch, r1, k, grouping)]
                    if paired:
                        reads.append(read_codes_from_batch(batch, r1 + 1, k, grouping))
                    canons = [self._canonical_read(codes) for codes in reads]
                    for s in strain_idx[pair_idx == j]:
                        prefix = (
                            f"{f1}\t{t1[j, s]}\t{i1[j, s]}\t{t2[j, s]}\t{i2[j, s]}\t"
                        )
                        for canon in canons:
                            self._emit_rows(outs[s], self.states[s], prefix, canon)

        for s, st in enumerate(self.states):
            outs[s].write("#%s\ttotal_kmer_evaluated\t%d\n" % (f1, total_kmers_evaluated))
            outs[s].write("#%s\ttotal_reads_evaluated\t%d\n" % (f1, total_reads_evaluated))
            outs[s].write("#%s\ttotal_genome_kmers\t%d\n" % (f1, st.total_kmers))
            outs[s].write(
                "#%s\ttotal_genome_informative_kmers\t%d\n" % (f1, st.total_informative)
            )

    def _canonical_read(self, codes: np.ndarray):
        """Per-read canonical windows, computed ONCE per read: a passing
        pair usually passes for MANY related strains, and the windows are
        a property of the read, not of the strain emitting it."""
        return canonical_codes_np(codes, self.cfg.k)

    def _emit_rows(self, out: IO, st: _StrainState, prefix: str,
                   canon: "tuple[np.ndarray, np.ndarray]") -> None:
        ccodes, valid = canon
        if ccodes.size == 0:
            return
        pos = np.searchsorted(st.codes_sorted, ccodes)
        pos = np.clip(pos, 0, st.codes_sorted.size - 1)
        found = valid & (st.codes_sorted[pos] == ccodes)
        informative = found & (st.types_sorted[pos] == INFORMATIVE_KMER)
        hits = np.flatnonzero(informative)
        if hits.size:
            for s in decode_codes_np(ccodes[hits], self.cfg.k):
                out.write(prefix + s + "\n")


def _expand_strain_bits(m, n, jnp):
    """(Q,) packed 2-bit-per-strain word -> (Q, n) present / informative.

    Kept for the ablation tools (tools/bench_wide_row.py); the production
    classify no longer materializes the (Q, n) planes — it goes through
    ops/segsum.boundary_strain_sums.
    """
    shifts = jnp.arange(n, dtype=jnp.uint32) * 2
    present = ((m[:, None] >> shifts[None, :]) & 1).astype(jnp.int32)
    informative = ((m[:, None] >> (shifts[None, :] + 1)) & 1).astype(jnp.int32)
    return present, informative


def _passing_any_pairs(tot, inf, *, paired, min_t, min_i):
    """(max_reads, S) per-read tot/inf -> (pairs,) bool: does ANY strain
    pass the reference's two-threshold rule for this read pair (reference
    src/strain_detect.c:403,406,547)?  Mirrors the host rule exactly;
    rows past n_reads are zero so padded pairs cannot pass (with the
    default thresholds >= 1).  Stays on device: the caller reads back
    these few KB instead of the megabyte matrices when nothing passes."""
    import jax.numpy as jnp

    if paired:
        t1, i1 = tot[0::2, :], inf[0::2, :]
        t2, i2 = tot[1::2, :], inf[1::2, :]
        passing = ((t1 + t2) >= min_t) & ((i1 + i2) >= min_i)
    else:
        passing = (tot >= min_t) & (inf >= min_i)
    return jnp.any(passing, axis=1)


def _gather_passing_rows(tot, inf, idx, *, paired):
    """Compact fetch for the D2H gate: gather only the PASSING pairs'
    (t1, i1, t2, i2) rows (idx = pair ordinals, -1-padded to a static
    bucket size so a handful of compiled shapes covers every batch).
    Readback shrinks from the full (max_reads, S) matrices to
    (n_pass_padded, S) x 4 — the emission block needs nothing else."""
    import jax.numpy as jnp

    ii = jnp.maximum(idx, 0)
    if paired:
        return tot[2 * ii], inf[2 * ii], tot[2 * ii + 1], inf[2 * ii + 1]
    zero = jnp.zeros((idx.shape[0], tot.shape[1]), dtype=tot.dtype)
    return tot[ii], inf[ii], zero, zero


def _classify_multi(rows, bases, boundaries, *, k, h_bits, salt, max_reads, n_strains):
    import jax.numpy as jnp

    from strainer2_tpu.ops.lookup import bucket_lookup, bucket_lookup_words
    from strainer2_tpu.ops.packing import canonical_windows
    from strainer2_tpu.ops.segsum import boundary_strain_sums

    win = canonical_windows(jnp.asarray(bases), k)
    if n_strains > 16:
        # one serialized gather answers ceil(S/16) meta words of 16
        # strains each (ops.lookup.bucket_lookup_words; slice width ~free)
        n_words = -(-n_strains // 16)
        found, _, words = bucket_lookup_words(
            rows, h_bits, salt, win.hi, win.lo, n_words
        )
        hit = (found & win.valid).reshape(-1)
        masked = [jnp.where(hit, w.reshape(-1), 0) for w in words]
    else:
        found, _, meta = bucket_lookup(rows, h_bits, salt, win.hi, win.lo)
        hit = (found & win.valid).reshape(-1)
        masked = [jnp.where(hit, meta.reshape(-1), 0)]  # (Q,) packed bits

    # per-read present/informative totals for all S strains without a
    # Q-long cumsum: two-level chunked prefix (ops/segsum.py), bit-exact
    # vs the full-cumsum path (tests/test_segsum.py)
    return boundary_strain_sums(masked, boundaries, n_strains)
