"""strain_detect stage: score target metagenomes against informative k-mers.

Pipeline equivalent of the reference binary (reference src/strain_detect.c):

1. index every canonical k-mer of the strain genome (type NON_INFORMATIVE),
2. mark the scrubbed (informative) set from the -a file (re-orienting each
   line; reference src/strain_detect.c:668-726),
3. optional background filter: count informative k-mers across background
   metagenomes and demote the most frequent ~half (reference 160-240),
4. for each target sample (SE / PE / PEI), count per-read total and
   informative k-mer hits; read-pairs with >=1 total and >=1 informative
   hit emit one row per informative-k-mer occurrence, then per-file summary
   comment lines (reference 387-663).

TPU mapping: the per-read counting loop — all the CPU time in the
reference ("this is where we spend most of the CPU time", reference
src/strain_detect.c:386) — is a single jitted program per packed batch:
canonicalize -> cuckoo lookup -> gather k-mer class -> one cumsum whose
differences at the packer's per-read window boundaries give every read's
total/informative hit counts (reads are contiguous window spans; no
scatter on the hot path).  Only reads that pass the thresholds (rare) are
re-scanned on host to emit their rows.

Deliberate divergence from the reference: reads shorter than k reset the
pair's hit counters to zero instead of reusing the previous read's
(uninitialized-state artifact of the C loop, SURVEY.md §2.2/§7); outputs
on well-formed data are bit-identical.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import IO, Iterator

import numpy as np

from strainer2_tpu.constants import (
    BACKGROUND_FRACTION_TO_REMOVE,
    DEFAULT_K,
    INFORMATIVE_KMER,
    IS_PAIRED_END,
    IS_PAIRED_END_INTERLEAVE,
    NON_INFORMATIVE_KMER,
    NOT_PAIRED_END,
)
from strainer2_tpu.index.build import StrainIndex
from strainer2_tpu.io.batches import max_reads_capacity, pack_stream
from strainer2_tpu.io.fastx import open_maybe_gzip, read_fastx
from strainer2_tpu.ops.packing import (
    canonical_codes_np,
    decode_codes_np,
    encode_ascii_np,
)
from strainer2_tpu.pipeline.engine import KmerEngine
from strainer2_tpu.pipeline.scrub_count import count_panel_file, read_list_file

__all__ = ["DetectConfig", "StrainDetector", "run_detect", "get_file_type"]


@dataclass
class DetectConfig:
    k: int = DEFAULT_K
    rows: int = 256
    row_len: int = 4096
    min_hits_for_good_match: int = 1  # reference src/strain_detect.c:406
    min_hits_for_informative_read: int = 1  # reference src/strain_detect.c:403
    fraction_background_to_remove: float = BACKGROUND_FRACTION_TO_REMOVE
    # (data, index) device mesh for sharded classification; None = single
    # device. Results are bit-identical either way.
    mesh: tuple[int, int] | None = None


def get_file_type(token: str) -> int:
    """Batch-file sample type tokens (reference src/strain_detect.c:728-747)."""
    t = token
    if t in ("SE", "se"):
        return NOT_PAIRED_END
    if t in ("PE", "pe"):
        return IS_PAIRED_END
    if t in ("PEI", "pei", "IPE", "ipe"):
        return IS_PAIRED_END_INTERLEAVE
    return -1


def _exit_unreadable_sample(exc: OSError, f1: str, f2: str | None) -> None:
    """Reference exits on unreadable target files with a (read1)/(read2)
    message (reference src/strain_detect.c:418-431); mirror it for both
    the jit and native detection paths."""
    import os

    path = getattr(exc, "filename", None)
    which = getattr(exc, "s2_which_read", None)
    if which is None and path is not None:
        which = 2 if (f2 is not None and path == f2) else 1
    if path is None:
        if f2 is not None and os.path.exists(f1) and not os.path.exists(f2):
            which, path = 2, f2
        else:
            which, path = 1, f1
    reason = getattr(exc, "strerror", None)
    if not reason:
        try:  # recover the OS-level reason the way the reference's strerror does
            open(path, "rb").close()
            reason = str(exc)
        except OSError as probe:
            reason = probe.strerror or str(probe)
    print(
        "could not read file (read%d) %s in quantify_hits_PE() (error: %s)"
        % (which, path, reason),
        file=sys.stderr,
    )
    raise SystemExit(1)


def _evaluated_totals(lens, paired: bool, k: int):
    """The per-batch summary tallies — a pure function of read LENGTHS
    (reference src/strain_detect.c:444,497), shared so the gated path
    (which may skip fetching tot/inf entirely) cannot drift from the
    aggregation path."""
    wins = np.maximum(lens - k + 1, 0) * (lens >= k)
    kmers_evaluated = int(wins.sum())
    n = lens.shape[0]
    if paired:
        pe1 = np.arange(0, n - (n % 2), 2)
        reads_evaluated = int(np.count_nonzero(lens[pe1] >= k))
    else:
        pe1 = np.arange(n)
        reads_evaluated = int(np.count_nonzero(lens >= k))
    return kmers_evaluated, reads_evaluated, pe1


def _aggregate_classify_chunk(lens, tot, inf, paired: bool, k: int):
    """Pair-split one chunk of per-read (length, total, informative) rows.

    Shared by the jit and native quantify paths so the parity-critical
    aggregation (window totals, evaluated-read rule, PE1/PE2 split) cannot
    drift between them.  Returns (kmers_evaluated, reads_evaluated, pe1,
    t1, i1, t2, i2)."""
    kmers_evaluated, reads_evaluated, pe1 = _evaluated_totals(lens, paired, k)
    if paired:
        return (kmers_evaluated, reads_evaluated, pe1,
                tot[pe1], inf[pe1], tot[pe1 + 1], inf[pe1 + 1])
    zero = np.zeros_like(tot)
    return kmers_evaluated, reads_evaluated, pe1, tot, inf, zero, zero


def _passing_any_1d(tot, inf, *, paired, min_t, min_i):
    """Device-side any-pair-passes mask for the single-strain classify
    (the multi-strain twin lives in pipeline/multi_detect.py): exact host
    threshold rule (reference src/strain_detect.c:403,406,547); rows past
    n_reads are zero so padded pairs cannot pass with thresholds >= 1."""
    if paired:
        return ((tot[0::2] + tot[1::2]) >= min_t) & (
            (inf[0::2] + inf[1::2]) >= min_i
        )
    return (tot >= min_t) & (inf >= min_i)


def _parse_batch_entries(batch_list: str) -> list:
    """Batch-list lines as ordered entries: ("sample", (f1, f2, ftype)) or
    ("msg", stdout_text) for malformed lines — preserving the reference's
    interleaving of warnings with sample processing."""
    entries: list = []
    with open(batch_list) as f:
        for raw in f:
            line = raw.rstrip("\n")
            fields = [t for t in line.split("\t") if t != ""]
            token = fields[0] if fields else line
            ftype = get_file_type(token)
            if ftype < 0:
                entries.append(("msg", "unknown file type skipping line (%s)\n" % token))
                continue
            if len(fields) < 2:
                entries.append(("msg", "ERROR: no first file specified for %s\n" % token))
                continue
            if ftype == IS_PAIRED_END and len(fields) < 3:
                entries.append(
                    ("msg", "ERROR: no second file specified for PE: %s\n" % token)
                )
                continue
            f2 = fields[2] if ftype == IS_PAIRED_END else None
            entries.append(("sample", (fields[1], f2, ftype)))
    return entries


def _run_sample_pool(entries, threads: int, new_sink, run_one, payload_of,
                     emit, stdout) -> None:
    """Concurrent sample scoring with sequential observable behavior.

    entries come from _parse_batch_entries; samples run on a worker pool
    (``run_one(sample_args, sink)`` writes into a pool-created ``sink``;
    the shared classify table is read-only — TSan-verified shape, see
    tools/tsan_stress.py scenario 5) while the main thread consumes
    entries IN ORDER: stdout messages emit at their list position,
    payloads (``payload_of(sink)``) emit via ``emit``.  Per-thread stderr
    capture keeps error runs exact: a failing sample's PARTIAL output and
    diagnostics emit after every earlier sample's output — just like the
    sequential loop, which writes rows to the stream before raising —
    nothing after it emits (later warnings included), and the run exits 1.
    Byte-for-byte on every stream, success or failure.
    """
    import concurrent.futures
    from collections import deque

    tee = _ThreadStderrTee(sys.stderr)
    samples = [val for kind, val in entries if kind == "sample"]

    def work(args):
        sink = new_sink()
        ebuf = tee.capture()
        outcome = None
        try:
            run_one(args, sink)
        except SystemExit as e:
            outcome = e.code if e.code is not None else 0
        except BaseException as e:  # re-raised in list order below
            outcome = e
        finally:
            tee.uncapture()
        # extract even on failure: the sequential path has already written
        # the failing sample's rows to the stream when it raises
        return payload_of(sink), ebuf.getvalue(), outcome

    old_stderr = sys.stderr
    sys.stderr = tee
    try:
        with concurrent.futures.ThreadPoolExecutor(threads) as ex:
            futs: deque = deque()
            idx = 0
            try:
                for kind, val in entries:
                    if kind == "msg":
                        stdout.write(val)
                        continue
                    while idx < len(samples) and len(futs) < threads + 2:
                        futs.append(ex.submit(work, samples[idx]))
                        idx += 1
                    payload, errtxt, outcome = futs.popleft().result()
                    emit(payload)
                    if errtxt:
                        old_stderr.write(errtxt)
                    if outcome is not None:
                        if isinstance(outcome, BaseException):
                            raise outcome
                        raise SystemExit(outcome)
            finally:
                ex.shutdown(wait=True, cancel_futures=True)
    finally:
        sys.stderr = old_stderr


def _staged_quantify(entries, run_one, new_sink, payload_of, emit, stdout,
                     checkpoint_dir: str | None = None, pool_ok: bool = True) -> None:
    """Sample-granular staged scoring: SPMD detection + detect resume.

    Used (instead of the streaming loop) when jax.distributed spans >1
    process and/or a checkpoint directory is given.  Samples are scored
    into in-memory sinks — each rank takes a deterministic size-balanced
    share (partition_by_size over target file sizes; the whole list on a
    single process), with the usual intra-rank thread pool when ``pool_ok``
    — then payloads are allgathered (parallel/distributed.gather_blobs)
    and replayed in batch-list order on rank 0.  Output bytes, stdout
    warning interleaving, and failure position are byte-identical to the
    sequential single-process loop: a failing sample's partial payload is
    emitted, everything after it is not, and every rank exits nonzero
    (the reference's per-sample loop is src/strain_detect.c:263-384).

    With ``checkpoint_dir``, each completed sample's payload persists
    (DetectCheckpoint; per-rank subdirectories under SPMD so shares can't
    interleave) and a resumed run replays stored payloads instead of
    rescoring — byte-identical because the payload IS the output.
    """
    import concurrent.futures
    import os
    from collections import deque

    import jax

    from strainer2_tpu.pipeline.progress import DetectCheckpoint

    pidx, pcount = jax.process_index(), jax.process_count()
    samples = [val for kind, val in entries if kind == "sample"]

    if pcount > 1:
        from strainer2_tpu.parallel.distributed import partition_by_size

        sizes = []
        for f1, f2, _ftype in samples:
            s = 0
            for p in (f1, f2):
                if p:
                    try:
                        s += os.path.getsize(p)
                    except OSError:
                        pass
            sizes.append(s)
        mine = partition_by_size(sizes, pidx, pcount)
    else:
        mine = list(range(len(samples)))

    ckpt = None
    if checkpoint_dir:
        d = (
            os.path.join(checkpoint_dir, f"rank{pidx}")
            if pcount > 1
            else checkpoint_dir
        )
        ckpt = DetectCheckpoint(d)

    results: dict[int, tuple[list, tuple]] = {}
    local_exc: dict[int, BaseException] = {}
    todo: list[tuple[int, str | None]] = []
    for o in mine:
        key = DetectCheckpoint.sample_key(*samples[o]) if ckpt else None
        stored = ckpt.get(o, key) if ckpt else None
        if stored is not None:
            results[o] = (stored, ("ok",))
        else:
            todo.append((o, key))

    tee = None

    def work(o, args):
        sink = new_sink()
        token = ("ok",)
        ebuf = tee.capture() if tee is not None else None
        try:
            run_one(args, sink)
        except SystemExit as e:
            code = e.code if e.code is not None else 0
            token = ("exit", code if isinstance(code, int) else 1)
        except BaseException as e:  # re-raised at its batch position below
            local_exc[o] = e  # unique key per task: no lock needed
            token = ("exc", 1)
        finally:
            if tee is not None:
                tee.uncapture()
        # payload extracted even on failure: the sequential loop has already
        # written the failing sample's rows to the stream when it raises
        return payload_of(sink), token, (ebuf.getvalue() if ebuf else "")

    from strainer2_tpu.utils.observability import stage

    threads = _detect_threads(len(todo)) if pool_ok else 1
    if threads > 1 and len(todo) > 1:
        tee = _ThreadStderrTee(sys.stderr)
        old_stderr = sys.stderr
        sys.stderr = tee
        try:
            with stage("detect.score_samples"), \
                    concurrent.futures.ThreadPoolExecutor(threads) as ex:
                futs: deque = deque()
                idx = 0
                try:
                    for _pos in range(len(todo)):
                        while idx < len(todo) and len(futs) < threads + 2:
                            o, key = todo[idx]
                            futs.append((o, key, ex.submit(work, o, samples[o])))
                            idx += 1
                        o, key, fut = futs.popleft()
                        payloads, token, errtxt = fut.result()
                        results[o] = (payloads, token)
                        if errtxt:
                            old_stderr.write(errtxt)
                        if token != ("ok",):
                            break  # later ordinals never replayed (see below)
                        if ckpt is not None:
                            ckpt.record(o, key, payloads)
                finally:
                    ex.shutdown(wait=True, cancel_futures=True)
        finally:
            sys.stderr = old_stderr
    else:
        with stage("detect.score_samples"):
            for o, key in todo:
                payloads, token, _ = work(o, samples[o])
                results[o] = (payloads, token)
                if token != ("ok",):
                    break
                if ckpt is not None:
                    ckpt.record(o, key, payloads)

    if pcount > 1:
        import json
        import zlib

        from strainer2_tpu.parallel.distributed import gather_blobs

        gather_ctx = stage("detect.gather_payloads")
        gather_ctx.__enter__()
        ordinals = sorted(results.keys())
        raws: list[bytes] = []
        lengths: list[list[int]] = []
        tokens: list[list] = []
        for o in ordinals:
            payloads, token = results[o]
            rs = [p.encode("utf-8") for p in payloads]
            raws.extend(rs)
            lengths.append([len(r) for r in rs])
            tokens.append(list(token))
        header = json.dumps({"o": ordinals, "t": tokens, "l": lengths}).encode()
        blob = header + b"\0" + zlib.compress(b"".join(raws), 1)
        merged: dict[int, tuple[list, tuple]] = {}
        for b in gather_blobs(blob):
            head, _, comp = b.partition(b"\0")
            h = json.loads(head.decode())
            raw = zlib.decompress(comp)
            off = 0
            for o, tok, lens in zip(h["o"], h["t"], h["l"]):
                ps = []
                for n in lens:
                    ps.append(raw[off : off + n].decode("utf-8"))
                    off += n
                merged[o] = (ps, tuple(tok))
        results = merged
        gather_ctx.__exit__(None, None, None)

    # replay in batch-list order; rank 0 owns the observable streams
    si = 0
    for kind, val in entries:
        if kind == "msg":
            if pidx == 0:
                stdout.write(val)
            continue
        if si not in results:
            # every sample before the globally-first failure is present by
            # construction (ranks stop scoring only after their own failure)
            raise RuntimeError(
                f"staged detection: sample {si} missing from gathered results"
            )
        payloads, token = results[si]
        if pidx == 0:
            emit(payloads)
        if token[0] != "ok":
            exc = local_exc.get(si)
            if exc is not None:
                raise exc  # this rank scored it: surface the real exception
            raise SystemExit(token[1])
        si += 1


def _detect_threads(n_samples: int) -> int:
    """Worker count for sample-parallel detection (STRAINER2_DETECT_THREADS
    overrides; default caps at 8).  Each in-flight sample buffers its
    uncompressed output — set to 1 for strictly-streaming memory use."""
    import os

    env = os.environ.get("STRAINER2_DETECT_THREADS")
    if env is not None:
        return max(1, min(int(env), n_samples))
    return max(1, min(os.cpu_count() or 1, 8, n_samples))


class _ThreadStderrTee:
    """sys.stderr proxy routing each worker thread's writes to a private
    buffer (captured per sample) while other threads pass through."""

    def __init__(self, real):
        import threading

        self.real = real
        self._local = threading.local()

    def capture(self):
        import io

        buf = io.StringIO()
        self._local.buf = buf
        return buf

    def uncapture(self):
        self._local.buf = None

    def write(self, s):
        buf = getattr(self._local, "buf", None)
        return (buf if buf is not None else self.real).write(s)

    def flush(self):
        buf = getattr(self._local, "buf", None)
        if buf is None:
            self.real.flush()


def _load_or_build_index(r_file, engine, cfg, index_cache):
    """Build the strain index, or reuse a cached one (StrainIndex.save)."""
    import os

    if index_cache and os.path.exists(index_cache):
        idx = StrainIndex.load(index_cache)
        if idx.k == cfg.k and idx.layout == engine.layout:
            return idx
    idx = StrainIndex.from_fasta(r_file, engine, cfg.rows, cfg.row_len)
    if index_cache:
        idx.save(index_cache)
    return idx


class StrainDetector:
    """Holds the indexed strain state shared across target samples."""

    def __init__(self, r_file: str, a_file: str | None, cfg: DetectConfig | None = None,
                 stdout: IO | None = None, index_cache: str | None = None,
                 index: "StrainIndex | None" = None,
                 informative_keys: np.ndarray | None = None):
        """a_file marks informative k-mers from the scrubbed-k-mer file.
        The fused pipeline instead passes a prebuilt ``index`` plus
        ``informative_keys`` (key indices in first-encounter order),
        skipping the genome re-scan and the k-mer string round trip."""
        self.cfg = cfg or DetectConfig()
        self.stdout = stdout if stdout is not None else sys.stdout
        from strainer2_tpu.utils.observability import stage

        self.engine = KmerEngine(
            self.cfg.k, max_reads_capacity(self.cfg.k, self.cfg.rows, self.cfg.row_len)
        )
        if index is not None:
            self.index = index
        else:
            with stage("detect.index_build"):
                self.index = _load_or_build_index(
                    r_file, self.engine, self.cfg, index_cache
                )
        # per-key k-mer class; genome k-mers start NON_INFORMATIVE
        self.kmer_type = np.full(self.index.num_kmers, NON_INFORMATIVE_KMER, np.uint32)
        self._sorted_order = np.argsort(self.index.codes, kind="stable")
        self._sorted_codes = self.index.codes[self._sorted_order]
        if informative_keys is not None:
            keys = np.asarray(informative_keys, dtype=np.int64)
            self.kmer_type[keys] = INFORMATIVE_KMER
            self.num_informative_marked = int(keys.size)
        else:
            if a_file is None:
                raise ValueError("either a_file or informative_keys is required")
            self.num_informative_marked = self._mark_scrubbed(a_file)
        self._meta_dev = None

    # ---- stage 2: mark informative k-mers ----
    def _key_pos(self, codes: np.ndarray) -> np.ndarray:
        """Map codes to key indices (first-encounter order), -1 if absent."""
        pos = np.searchsorted(self._sorted_codes, codes)
        pos = np.clip(pos, 0, self._sorted_codes.size - 1)
        ok = self._sorted_codes[pos] == codes
        out = np.where(ok, self._sorted_order[pos], -1)
        return out.astype(np.int64)

    def _mark_scrubbed(self, a_file: str) -> int:
        """Mark the -a file's k-mers informative (vectorized over all
        lines; diagnostics stay in line order as the reference prints them,
        reference src/strain_detect.c:687-716)."""
        k = self.cfg.k
        lines: list[bytes] = []
        with open_maybe_gzip(a_file) as f:
            for raw in f:
                if not raw.startswith(b"#"):
                    lines.append(raw.rstrip(b"\n"))
        good = [ln for ln in lines if len(ln) == k]
        idx = np.full(len(good), -1, dtype=np.int64)
        if good:
            mat = encode_ascii_np(
                np.frombuffer(b"".join(good), dtype=np.uint8)
            ).reshape(len(good), k)
            valid = (mat < 4).all(axis=1)
            weights = np.uint64(4) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
            two = (mat & np.uint8(3)).astype(np.uint64)
            fwd = (two * weights).sum(axis=1, dtype=np.uint64)
            rc = ((np.uint64(3) - two)[:, ::-1] * weights).sum(axis=1, dtype=np.uint64)
            ccodes = np.where(fwd >= rc, fwd, rc)
            found = self._key_pos(ccodes)
            idx = np.where(valid, found, -1)

        n_marked = 0
        gi = 0
        for ln in lines:
            if len(ln) != k:
                self.stdout.write(
                    "error string length in the scrubbed kmer file (%s) must be the "
                    "same size as the kmer length (scrubbed kmer, scrubbed kmer len, "
                    "seed len): %s, %d, %d\n"
                    % (a_file, ln.decode("ascii", "replace"), len(ln), k)
                )
                continue
            key = idx[gi]
            gi += 1
            if key >= 0:
                self.kmer_type[key] = INFORMATIVE_KMER
                n_marked += 1
            else:
                self.stdout.write(
                    "error could not find informative kmer %s in the total kmer list\n"
                    % ln.decode("ascii", "replace")
                )
        return n_marked

    # ---- stage 3: background filter ----
    def background_filter(self, background_list: str) -> None:
        """Demote informative k-mers frequent in background metagenomes
        (reference src/strain_detect.c:160-240; stats lines go to stdout).

        Under jax.distributed (>1 process) each rank counts its
        size-balanced share of the background list and the per-slot counts
        integer-merge (bit-identical; every rank ends with the same
        demotions, which SPMD detection requires)."""
        import jax
        import jax.numpy as jnp

        from strainer2_tpu.pipeline.scrub_count import (
            _use_native_counting,
            count_files_native_pooled,
        )

        cfg = self.cfg
        paths = read_list_file(background_list)
        pcount = jax.process_count()
        if pcount > 1:
            from strainer2_tpu.parallel.distributed import host_file_partition

            paths = host_file_partition(paths, jax.process_index(), pcount)
        nc = (
            self.index.native_counter()
            if _use_native_counting(self.engine)
            else None
        )
        counts_np = count_files_native_pooled(nc, paths, self.index.table.num_slots)
        if counts_np is None:
            counts = jnp.zeros(self.index.table.num_slots, dtype=jnp.uint32)
            for path in paths:
                counts = count_panel_file(
                    self.engine, self.index, counts, path, cfg.rows, cfg.row_len
                )
            counts_np = np.asarray(counts)
        if pcount > 1:
            from strainer2_tpu.parallel.distributed import merge_across_hosts

            counts_np = merge_across_hosts(counts_np)
        bg_counts = self.index.key_values(counts_np).astype(np.int64)
        background_demote(
            self.kmer_type, bg_counts, self.num_informative_marked,
            cfg.fraction_background_to_remove, background_list, self.stdout,
        )

    # ---- stage 4: quantify ----
    def _passing_any(self, tot_d, inf_d, paired: bool):
        """Jitted any-pair-passes mask (cached per paired flag)."""
        import jax

        from functools import partial

        fn = self.__dict__.get("_passing_any_jit")
        if fn is None:
            fn = jax.jit(
                partial(
                    _passing_any_1d,
                    min_t=self.cfg.min_hits_for_good_match,
                    min_i=self.cfg.min_hits_for_informative_read,
                ),
                static_argnames=("paired",),
            )
            self._passing_any_jit = fn
        return fn(tot_d, inf_d, paired=paired)

    def _finalize_meta(self):
        self._type_sorted = self.kmer_type[self._sorted_order]
        import jax.numpy as jnp

        self._sharded = None
        if self.cfg.mesh is not None:
            self._finalize_meta_sharded()
            return
        if self.index.layout == "bucket":
            # bake the k-mer class into the bucket rows: classification
            # then needs a single gather per window
            self._classify_table = jnp.asarray(
                self.index.table.with_meta(self.index.slot_values(self.kmer_type))
            )
            self._meta_dev = None
        else:
            self._classify_table = self.index.device_table()
            self._meta_dev = jnp.asarray(self.index.slot_values(self.kmer_type))
        self.total_genome_kmers = self.index.num_kmers
        self.total_genome_informative = int(
            np.count_nonzero(self.kmer_type == INFORMATIVE_KMER)
        )

    def _finalize_meta_sharded(self):
        """Shard the classification table over a (data, index) device mesh
        (bit-identical to single-device; the per-read partial sums from the
        data shards are summed on host)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from strainer2_tpu.parallel.sharding import ShardedKmerEngine, make_mesh

        d, i = self.cfg.mesh
        t = self.index.table
        mesh = make_mesh(d, i)
        self._sharded = ShardedKmerEngine(
            self.cfg.k, mesh, t.h_bits, t.salt, t.num_slots,
            max_reads=self.engine.max_reads, layout=self.index.layout,
        )
        if self.index.layout == "bucket":
            spec = NamedSharding(mesh, P("index", None))
            self._classify_table = jax.device_put(
                jnp.asarray(t.with_meta(self.index.slot_values(self.kmer_type))),
                spec,
            )
            self._meta_dev = None
        else:
            spec = NamedSharding(mesh, P("index"))
            self._classify_table = (
                jax.device_put(
                    jnp.asarray(np.ascontiguousarray(t.table[:, 0])), spec
                ),
                jax.device_put(
                    jnp.asarray(np.ascontiguousarray(t.table[:, 1])), spec
                ),
            )
            self._meta_dev = jax.device_put(
                jnp.asarray(self.index.slot_values(self.kmer_type)), spec
            )
        self.total_genome_kmers = self.index.num_kmers
        self.total_genome_informative = int(
            np.count_nonzero(self.kmer_type == INFORMATIVE_KMER)
        )

    def quantify_all(
        self,
        out_path: str,
        batch_list: str | None = None,
        b_file: str | None = None,
        b_file2: str | None = None,
        file_type: int = NOT_PAIRED_END,
        checkpoint_dir: str | None = None,
        gzip_output: bool = True,
    ) -> None:
        """Process all target samples and write the gzip hits file.

        With jax.distributed spanning >1 process, batch-list samples are
        scored SPMD across ranks (deterministic size-balanced shares) and
        rank 0 writes the output in batch order — byte-identical to a
        single-process run.  checkpoint_dir enables sample-granular
        resume (DetectCheckpoint), usable with or without SPMD.
        gzip_output=False writes plain TSV (the reference's NO_GZIP_OUTPUT
        compile-time toggle, src/strain_detect.c:23,292-304, as a runtime
        flag); row bytes are identical either way."""
        import gzip

        import jax

        def _open_hits(path):
            return (
                gzip.open(path, "wt", compresslevel=9)
                if gzip_output
                else open(path, "w")
            )

        self._finalize_meta()
        pidx, pcount = jax.process_index(), jax.process_count()
        if pcount > 1 and self.cfg.mesh is not None:
            # same constraint as scrub counting: the shard_map mesh spans
            # ALL processes' devices under jax.distributed, so per-rank
            # divergent sample shares would break SPMD
            print(
                "mesh sharding and multi-process sample partitioning cannot "
                "combine: run either one process with a device mesh, or one "
                "process per host (the default here)",
                file=sys.stderr,
            )
            raise SystemExit(1)
        if batch_list is not None and (pcount > 1 or checkpoint_dir):
            import io

            entries = _parse_batch_entries(batch_list)
            nc = self._native_classifier()
            if nc is not None:
                run_one = lambda args, sink: self._quantify_sample_native(
                    nc, *args, sink
                )
            else:
                run_one = lambda args, sink: self._quantify_sample(*args, sink)
            out = _open_hits(out_path) if pidx == 0 else None
            try:
                _staged_quantify(
                    entries, run_one, io.StringIO,
                    lambda s: [s.getvalue()],
                    (lambda ps: out.write(ps[0]))
                    if out is not None
                    else (lambda ps: None),
                    self.stdout, checkpoint_dir=checkpoint_dir,
                    pool_ok=nc is not None,
                )
            finally:
                if out is not None:
                    out.close()
            return
        if pcount > 1 and pidx != 0:
            return  # single-sample mode: rank 0 owns the only sample
        from strainer2_tpu.utils.observability import stage

        with _open_hits(out_path) as out:
            if batch_list is not None:
                entries = _parse_batch_entries(batch_list)
                n_samples = sum(1 for kind, _ in entries if kind == "sample")
                nc = self._native_classifier()
                threads = _detect_threads(n_samples)
                if nc is not None and n_samples > 1 and threads > 1:
                    import io

                    with stage("detect.score_samples"):
                        _run_sample_pool(
                            entries, threads,
                            io.StringIO,
                            lambda args, buf: self._quantify_sample_native(
                                nc, *args, buf
                            ),
                            lambda buf: buf.getvalue(),
                            out.write, self.stdout,
                        )
                else:
                    # stdout warnings interleave with samples exactly as the
                    # reference's streaming loop emits them (an error run
                    # never reaches later lines' warnings)
                    with stage("detect.score_samples"):
                        for kind, val in entries:
                            if kind == "msg":
                                self.stdout.write(val)
                            else:
                                self._quantify_sample(*val, out)
            else:
                self._quantify_sample(b_file, b_file2, file_type, out)


    # ---- per-sample hot loop ----
    def _read_stream(self, f1: str, f2: str | None, ftype: int) -> Iterator[bytes]:
        if ftype == IS_PAIRED_END:
            it1, it2 = read_fastx(f1), read_fastx(f2)
            for rec1 in it1:
                try:
                    rec2 = next(it2)
                except StopIteration:
                    print(
                        f"reached end of PE2 ({f2}) before end of PE1 ({f1}), "
                        "check that file names are correct",
                        file=sys.stderr,
                    )
                    raise SystemExit(1)
                yield rec1.seq
                yield rec2.seq
        else:
            for rec in read_fastx(f1):
                yield rec.seq

    def _batch_stream(self, f1: str, f2: str | None, ftype: int):
        """Packed batches for one sample: native C++ reader/packer when
        built, Python twin otherwise."""
        from strainer2_tpu import native

        cfg = self.cfg
        group = 2 if ftype != NOT_PAIRED_END else 1
        if native.available():
            if ftype == IS_PAIRED_END:
                paths, mode = [f1, f2], 1
            else:
                paths, mode = [f1], 0
            return native.NativePackStream(
                paths, cfg.k, cfg.rows, cfg.row_len, mode=mode,
                with_read_ids=True, group_size=group,
                max_reads=self.engine.max_reads,
            )
        seqs = (
            encode_ascii_np(np.frombuffer(s, dtype=np.uint8))
            for s in self._read_stream(f1, f2, ftype)
        )
        return pack_stream(
            seqs, cfg.k, rows=cfg.rows, row_len=cfg.row_len,
            with_read_ids=True, group_size=group,
        )

    def _native_classifier(self):
        """Fused native per-read classifier (CPU fast path); None when the
        jit engine should run (TPU backend, sharded mesh, or opt-out)."""
        if not hasattr(self, "_native_cls"):
            self._native_cls = None
            from strainer2_tpu.pipeline.scrub_count import _use_native_counting

            if self._sharded is None and _use_native_counting(self.engine):
                try:
                    from strainer2_tpu.native import NativeClassifier

                    self._native_cls = NativeClassifier(
                        self.index.codes, self.kmer_type, self.cfg.k
                    )
                except (RuntimeError, MemoryError):
                    self._native_cls = None
        return self._native_cls

    def _quantify_sample_native(self, nc, f1: str, f2: str | None, ftype: int,
                                out: IO) -> None:
        """Native-classifier twin of _quantify_sample: same pair thresholds,
        statistics, and emission — per-read rows come from one fused native
        pass instead of packed jit batches."""
        from strainer2_tpu.native import NativeClassifyStream, NativeReadExtractor

        cfg = self.cfg
        k = cfg.k
        paired = ftype != NOT_PAIRED_END
        mode = (1 if ftype == IS_PAIRED_END
                else 2 if ftype == IS_PAIRED_END_INTERLEAVE else 0)
        try:
            stream = nc.open_stream(f1, f2, mode)
        except OSError as e:
            _exit_unreadable_sample(e, f1, f2)

        total_kmers_evaluated = 0
        total_reads_evaluated = 0
        odd_interleave = False
        pe2_early = False
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
            )
            emit_items = []
            for j in np.flatnonzero(passing):
                r1 = base + int(pe1[j])
                prefix = f"{f1}\t{t1[j]}\t{i1[j]}\t{t2[j]}\t{i2[j]}\t"
                if ex1 is None:
                    ex1 = NativeReadExtractor(f1)
                    if ftype == IS_PAIRED_END:
                        ex2 = NativeReadExtractor(f2)
                if ftype == IS_PAIRED_END:
                    emit_items.append(
                        (prefix, ex1.read(r1 // 2, int(lens[pe1[j]])))
                    )
                    emit_items.append(
                        (prefix, ex2.read(r1 // 2, int(lens[pe1[j] + 1])))
                    )
                else:
                    emit_items.append((prefix, ex1.read(r1, int(lens[pe1[j]]))))
                    if paired:  # PEI: mate is the next read in the same file
                        emit_items.append(
                            (prefix, ex1.read(r1 + 1, int(lens[pe1[j] + 1])))
                        )
            self._emit_rows_batch(out, emit_items)
            base += n
        if stream.state == NativeClassifyStream.PE2_ENDED_EARLY:
            pe2_early = True
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

        out.write("#%s\ttotal_kmer_evaluated\t%d\n" % (f1, total_kmers_evaluated))
        out.write("#%s\ttotal_reads_evaluated\t%d\n" % (f1, total_reads_evaluated))
        out.write("#%s\ttotal_genome_kmers\t%d\n" % (f1, self.total_genome_kmers))
        out.write(
            "#%s\ttotal_genome_informative_kmers\t%d\n" % (f1, self.total_genome_informative)
        )

    def _quantify_sample(self, f1: str, f2: str | None, ftype: int, out: IO) -> None:
        from strainer2_tpu.io.batches import batch_read_grouping, read_codes_from_batch

        nc = self._native_classifier()
        if nc is not None:
            return self._quantify_sample_native(nc, f1, f2, ftype, out)

        cfg = self.cfg
        k = cfg.k
        paired = ftype != NOT_PAIRED_END
        t = self.index.table

        total_kmers_evaluated = 0
        total_reads_evaluated = 0

        odd_interleave = False
        n_windows = cfg.rows * (cfg.row_len - k + 1)
        max_reads = self.engine.max_reads
        from strainer2_tpu.utils.prefetch import prefetch

        from strainer2_tpu.native import Pe2EndedEarlyError

        try:
            stream = prefetch(self._batch_stream(f1, f2, ftype))
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
            boundaries = np.full(max_reads + 1, n_windows, dtype=np.int32)
            boundaries[:n] = batch.window_starts
            if self._sharded is not None:
                bases = batch.bases
                pad = (-bases.shape[0]) % self._sharded.n_data
                if pad:
                    bases = np.concatenate(
                        [bases, np.full((pad, bases.shape[1]), 4, dtype=bases.dtype)]
                    )
                if self.index.layout == "bucket":
                    arg = boundaries
                else:
                    rid = batch.read_id
                    if pad:
                        rid = np.concatenate(
                            [rid, np.full((pad, rid.shape[1]), -1, dtype=rid.dtype)]
                        )
                    arg = rid
                tot_d, inf_d = self._sharded.classify_batch(
                    self._classify_table, self._meta_dev, bases, arg
                )
                tot = np.asarray(tot_d).sum(axis=0)[:n]
                inf = np.asarray(inf_d).sum(axis=0)[:n]
            else:
                tot_d, inf_d = self.engine.classify_batch(
                    self._classify_table, self._meta_dev, t.h_bits, t.salt,
                    batch.bases, boundaries
                )
                # D2H gate (single-strain twin of the multi-strain gate in
                # pipeline/multi_detect.py): read back a (pairs,) bool; the
                # per-read vectors cross D2H only when a pair passes —
                # byte-identical, the skipped emission was a no-op
                any_d = self._passing_any(tot_d, inf_d, paired)
                n_pairs = (n - (n % 2)) // 2 if paired else n
                tot = inf = None
                if bool(np.asarray(any_d)[:n_pairs].any()):
                    tot = np.asarray(tot_d)[:n]
                    inf = np.asarray(inf_d)[:n]
            lens = batch.read_lengths
            if n % 2 and paired and ftype == IS_PAIRED_END_INTERLEAVE:
                odd_interleave = True
            if tot is None:  # device-checked: no pair passes in this batch
                ke, re_, _ = _evaluated_totals(lens, paired, k)
                total_kmers_evaluated += ke
                total_reads_evaluated += re_
                continue
            ke, re_, pe1, t1, i1, t2, i2 = _aggregate_classify_chunk(
                lens, tot, inf, paired, k
            )
            total_kmers_evaluated += ke
            total_reads_evaluated += re_

            passing = ((t1 + t2) >= cfg.min_hits_for_good_match) & (
                (i1 + i2) >= cfg.min_hits_for_informative_read
            )
            pass_idx = np.flatnonzero(passing)
            grouping = batch_read_grouping(batch) if pass_idx.size else None
            emit_items = []
            for j in pass_idx:
                r1 = int(pe1[j])
                prefix = f"{f1}\t{t1[j]}\t{i1[j]}\t{t2[j]}\t{i2[j]}\t"
                emit_items.append(
                    (prefix, read_codes_from_batch(batch, r1, k, grouping))
                )
                if paired:
                    emit_items.append(
                        (prefix, read_codes_from_batch(batch, r1 + 1, k, grouping))
                    )
            self._emit_rows_batch(out, emit_items)

        if odd_interleave:
            print(
                f"reached end of PE2 ({f1}) before end of PE1 ({f1}), "
                "check that file names are correct",
                file=sys.stderr,
            )
            raise SystemExit(1)

        # per-file summary comment lines (reference src/strain_detect.c:633-636)
        out.write("#%s\ttotal_kmer_evaluated\t%d\n" % (f1, total_kmers_evaluated))
        out.write("#%s\ttotal_reads_evaluated\t%d\n" % (f1, total_reads_evaluated))
        out.write("#%s\ttotal_genome_kmers\t%d\n" % (f1, self.total_genome_kmers))
        out.write(
            "#%s\ttotal_genome_informative_kmers\t%d\n" % (f1, self.total_genome_informative)
        )

    def _emit_rows(self, out: IO, prefix: str, codes: np.ndarray) -> None:
        """Re-scan one passing read; one row per informative-window
        occurrence, in window order (reference src/strain_detect.c:554-623)."""
        self._emit_rows_batch(out, [(prefix, codes)])

    _EMIT_WINDOW_BUDGET = 1 << 21  # bounds transient memory per lookup

    def _emit_rows_batch(self, out: IO, items: list) -> None:
        """Emission for all passing reads of one chunk at once: one
        canonical re-scan per read, but a single vectorized key lookup and
        class gather across bounded sub-batches.  Rows print in
        (read, window) order exactly as the per-read version."""
        start = 0
        windows = 0
        for i, (_, bases) in enumerate(items):
            windows += max(bases.shape[0] - self.cfg.k + 1, 0)
            if windows >= self._EMIT_WINDOW_BUDGET:
                self._emit_rows_slice(out, items[start : i + 1])
                start, windows = i + 1, 0
        if start < len(items):
            self._emit_rows_slice(out, items[start:])

    def _emit_rows_slice(self, out: IO, items: list) -> None:
        k = self.cfg.k
        ccodes_list = []
        valid_list = []
        spans = []
        for _, bases in items:
            cc, v = canonical_codes_np(bases, k)
            ccodes_list.append(cc)
            valid_list.append(v)
            spans.append(cc.size)
        if not spans or sum(spans) == 0:
            return
        ccodes = np.concatenate(ccodes_list)
        valid = np.concatenate(valid_list)
        idx = self._key_pos(ccodes)
        informative = valid & (idx >= 0)
        if informative.any():
            informative &= (
                np.where(idx >= 0, self.kmer_type[np.maximum(idx, 0)], 0)
                == INFORMATIVE_KMER
            )
        off = 0
        for (prefix, _), n in zip(items, spans):
            hits = np.flatnonzero(informative[off : off + n])
            if hits.size:
                for s in decode_codes_np(ccodes[off + hits], k):
                    out.write(prefix + s + "\n")
            off += n


def background_demote(kmer_type, bg_counts, num_inform, fraction, list_name, stdout):
    """The reference's background threshold search + demotion (reference
    src/strain_detect.c:160-240) on per-key arrays; mutates kmer_type.

    Threshold search: start at 1 (the detection minimum); raise to the
    count at the keep boundary, then keep raising while too many k-mers
    would be removed (reference 195-214).
    """
    kmer_to_keep = int(num_inform * fraction)
    stdout.write(
        "#removing %f proportion of %s kmers; informative %d keep at least %d\n"
        % (fraction, list_name, num_inform, kmer_to_keep)
    )
    informative = kmer_type == INFORMATIVE_KMER
    inf_bg = bg_counts[informative]
    if inf_bg.size > num_inform:
        print("Error: too many background kmers", file=sys.stderr)
        raise SystemExit(1)

    desc = np.sort(inf_bg)[::-1]
    max_kmer_to_keep = 1
    if kmer_to_keep >= 1 and desc.size >= kmer_to_keep and desc[kmer_to_keep - 1] > max_kmer_to_keep:
        max_kmer_to_keep = int(desc[kmer_to_keep - 1])
    while int(np.count_nonzero(inf_bg >= max_kmer_to_keep)) > kmer_to_keep:
        max_kmer_to_keep += 1

    demote = informative & (bg_counts >= max_kmer_to_keep)
    kmer_type[demote] = NON_INFORMATIVE_KMER
    stdout.write(
        "#final_threshold %d removes %d background kmers %d removed\n"
        % (
            max_kmer_to_keep,
            int(np.count_nonzero(inf_bg >= max_kmer_to_keep)),
            int(np.count_nonzero(demote)),
        )
    )


def run_detect(
    r_file: str,
    a_file: str,
    out_path: str,
    batch_list: str | None = None,
    b_file: str | None = None,
    b_file2: str | None = None,
    file_type: int = NOT_PAIRED_END,
    background_list: str | None = None,
    cfg: DetectConfig | None = None,
    stdout: IO | None = None,
    index_cache: str | None = None,
    checkpoint_dir: str | None = None,
    gzip_output: bool = True,
) -> StrainDetector:
    """Full strain_detect stage.

    Multi-process SPMD: with jax.distributed initialized (e.g.
    JAX_COORDINATOR_ADDRESS set, one process per host), every rank builds
    the same detector state, batch-list samples are scored across ranks,
    and rank 0 writes the output + stdout — byte-identical to one process.
    checkpoint_dir makes the batch run resumable at sample granularity."""
    from strainer2_tpu.parallel.distributed import initialize

    pidx, pcount = initialize()
    if pcount > 1 and pidx != 0:
        # rank 0 owns the observable streams (stats lines print once)
        from strainer2_tpu.pipeline.fused import _NullTextSink

        stdout = _NullTextSink()
    det = StrainDetector(r_file, a_file, cfg, stdout=stdout, index_cache=index_cache)
    if background_list:
        det.background_filter(background_list)
    det.quantify_all(
        out_path,
        batch_list=batch_list,
        b_file=b_file,
        b_file2=b_file2,
        file_type=file_type,
        checkpoint_dir=checkpoint_dir,
        gzip_output=gzip_output,
    )
    return det
