"""genome_compare stage: ANI-like k-mer containment scoring.

Equivalent of the reference auxiliary binary (reference src/main.c:28-115 +
src/genome_compare.c:242-354): hash every canonical k-mer of genome -a
(set semantics, variable k, default 20), then stream each query file
counting canonical-window hits/misses against the set.

Rapid ("hybrid") mode replicates the reference's subsample-then-escalate
control flow exactly: after the max_seeds-th evaluated (non-N) window, if
the hit fraction exceeds the threshold the whole query is scanned
("fullmap"), otherwise scanning stops and the partial tallies are printed
(reference src/genome_compare.c:327-340).  On the device path every batch
reduces ON DEVICE: fullmap batches fold into a persistent (2,) accumulator
(read back at rare spill points), and undecided rapid-mode batches return
four scalars including the crossing position located by a device-side
cumulative sum + searchsorted — the decision happens at exactly the same
window as the reference's scalar loop, and the full per-window masks never
cross to host (bulk D2H is pathological on the remote-attached TPU
transport; docs/PERFORMANCE.md measurement caveats).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import IO

import numpy as np

from strainer2_tpu.index.build import StrainIndex
from strainer2_tpu.io.batches import pack_stream
from strainer2_tpu.io.fastx import read_fastx
from strainer2_tpu.pipeline.engine import KmerEngine
from strainer2_tpu.pipeline.scrub_count import read_list_file

__all__ = ["CompareConfig", "GenomeComparer", "run_genome_compare"]

DEFAULT_SEED = 20  # reference src/main.c:11
# fullmap device batches between accumulator spills: a batch adds <= ~1M to
# each int32 lane, so spilling every 1024 batches stays exact on files of
# any size while costing one tiny readback per ~1e9 windows
_ACC_SPILL_BATCHES = 1024
CLONE_MODE = (50_000, 0.1)  # reference src/main.c:13,16
STRAIN_MODE = (100_000, 0.05)  # reference src/main.c:14,15


@dataclass
class CompareConfig:
    k: int = DEFAULT_SEED
    rows: int = 256
    row_len: int = 4096
    max_seeds: int = 0  # 0 = scan everything
    threshold_for_fullmap: float = 0.1  # reference src/main.c:17


def _c_fraction(hits: int, misses: int) -> str:
    """%f rendering incl. the reference's 0/0 case (x86 0.0/0.0 -> -nan)."""
    denom = hits + misses
    if denom == 0:
        return "-nan"
    return "%.6f" % (hits / denom)


_COMP_BYTES = bytes.maketrans(b"ABCDGHKMNRSTUVWXY", b"TVGHCD.KNYSAABWXR")


def _canonical_bytes(window: bytes) -> bytes:
    """Canonical form for arbitrary-length char windows (max(fwd, rc),
    forward wins ties — strcmp semantics, any IUPAC letters pass through
    like the reference's string path)."""
    rc = window.translate(_COMP_BYTES)[::-1]
    return window if window >= rc else rc


class _HostSetComparer:
    """String-set engine for k > 32 (beyond the 2-bit packed code range);
    matches the reference's arbitrary-seed behavior exactly, including
    windows with non-ACGT letters other than N.

    The default path is the native C++ twin (NativeComparer: FNV-probed
    arena set with software-prefetched probes — genome-scale speed at any
    seed length); this pure-Python engine is its oracle and fallback.
    STRAINER2_NATIVE_COMPARE=0 forces the Python path for A/B checks.
    """

    def __init__(self, a_file: str, k: int):
        self.k = k
        self.kmers: set[bytes] = set()
        for rec in read_fastx(a_file):
            seq = rec.seq.upper()
            for i in range(len(seq) - k + 1):
                w = seq[i : i + k]
                if b"N" not in w:
                    self.kmers.add(_canonical_bytes(w))

    def score(self, path: str, max_seeds: int, threshold: float) -> tuple[int, int]:
        k = self.k
        hits = 0
        misses = 0
        fullmap = max_seeds == 0
        for rec in read_fastx(path):
            seq = rec.seq.upper()
            if len(seq) < k:
                continue
            for i in range(len(seq) - k + 1):
                w = seq[i : i + k]
                if b"N" not in w:
                    if _canonical_bytes(w) in self.kmers:
                        hits += 1
                    else:
                        misses += 1
                if max_seeds and hits + misses >= max_seeds and not fullmap:
                    if hits / (hits + misses) > threshold:
                        fullmap = True
                    else:
                        return hits, misses
        return hits, misses


class GenomeComparer:
    def __init__(self, a_file: str, cfg: CompareConfig | None = None):
        self.cfg = cfg or CompareConfig()
        self.a_file = a_file
        self.engine = None
        self.index = None
        self._host = None

        import os

        native_ok = os.environ.get("STRAINER2_NATIVE_COMPARE", "1") != "0"
        if self.cfg.k > 32:
            # beyond the packed-code range: exact string engine, native C++
            # by default with the Python set as oracle/fallback
            if native_ok:
                try:
                    from strainer2_tpu.native import NativeComparer

                    self._host = NativeComparer(a_file, self.cfg.k)
                except (RuntimeError, OSError):
                    self._host = None  # unreadable/unavailable: Python path
            if self._host is None:
                self._host = _HostSetComparer(a_file, self.cfg.k)
            return
        if native_ok:
            # CPU backend: the native string engine beats the XLA CPU
            # gather path at any seed length (and scores IUPAC letters
            # exactly like the reference's string hash, where the packed
            # encoder can only mask them); the jit engine stays the
            # device path (docs/PERFORMANCE.md).
            import jax

            if jax.default_backend() != "tpu":
                try:
                    from strainer2_tpu.native import NativeComparer

                    self._host = NativeComparer(a_file, self.cfg.k)
                    return
                except (RuntimeError, OSError):
                    self._host = None
        self.engine = KmerEngine(self.cfg.k)
        # set semantics: the reference inserts each canonical k-mer once
        # (reference src/genome_compare.c:475-521)
        self.index = StrainIndex.from_fasta(
            a_file, self.engine, self.cfg.rows, self.cfg.row_len
        )

    def score_query(self, path: str, out: IO) -> tuple[int, int]:
        """Score one query file; prints the reference's result line."""
        cfg = self.cfg
        if self._host is not None:
            try:
                hits, misses = self._host.score(
                    path, cfg.max_seeds, cfg.threshold_for_fullmap
                )
            except OSError:
                # surface the same error the streaming reader would raise
                next(iter(read_fastx(path)), None)
                raise
            out.write(
                f"{self.a_file}\t{path}\t{hits}\t{misses}\t{_c_fraction(hits, misses)}\n"
            )
            return hits, misses
        t = self.index.table
        table_dev = self.index.device_table()

        # Everything reduces ON DEVICE: fullmap batches fold into a (2,)
        # device accumulator read back once per file, and undecided
        # rapid-mode batches return four scalars (engine.hit_stats) — the
        # full (rows x width) masks never cross to host.  Bulk D2H is
        # pathological on the remote-attached TPU transport
        # (docs/PERFORMANCE.md measurement caveats #2); this is the jit
        # engine's scoring path on TPU, so it must stay scalar-readback.
        import jax.numpy as jnp

        hits = 0
        evaluated = 0
        fullmap = cfg.max_seeds == 0
        decided = fullmap
        acc = jnp.zeros(2, dtype=jnp.int32)
        acc_batches = 0

        seqs = (rec.seq for rec in read_fastx(path))
        stream = pack_stream(seqs, cfg.k, rows=cfg.rows, row_len=cfg.row_len)
        for batch in stream:
            if decided:
                acc = self.engine.hit_accumulate(
                    acc, table_dev, t.h_bits, t.salt, batch.bases
                )
                acc_batches += 1
                if acc_batches >= _ACC_SPILL_BATCHES:
                    # rare scalar spill keeps the int32 device lanes exact
                    # on arbitrarily large files
                    acc_np = np.asarray(acc)
                    hits += int(acc_np[0])
                    evaluated += int(acc_np[1])
                    acc = jnp.zeros(2, dtype=jnp.int32)
                    acc_batches = 0
                continue
            bh, bv, hits_at, pos = self.engine.hit_stats(
                table_dev, t.h_bits, t.salt, batch.bases,
                jnp.int32(cfg.max_seeds - evaluated),
            )
            if int(pos) >= 0:
                # totals at exactly the max_seeds-th evaluated window
                # (reference src/genome_compare.c:327-340)
                hits_at_total = hits + int(hits_at)
                eval_at = cfg.max_seeds
                frac = hits_at_total / eval_at if eval_at else 0.0
                decided = True
                if frac > cfg.threshold_for_fullmap:
                    fullmap = True
                    # the post-crossing remainder of THIS batch still counts
                    # (the reference keeps scanning in place): fold the whole
                    # batch in like any fullmap batch
                    hits += int(bh)
                    evaluated += int(bv)
                else:
                    hits, evaluated = hits_at_total, eval_at
                    break
            else:
                hits += int(bh)
                evaluated += int(bv)

        if fullmap or not decided:
            acc_np = np.asarray(acc)  # one (2,) readback per file
            hits += int(acc_np[0])
            evaluated += int(acc_np[1])
        misses = evaluated - hits
        out.write(
            f"{self.a_file}\t{path}\t{hits}\t{misses}\t{_c_fraction(hits, misses)}\n"
        )
        return hits, misses


def run_genome_compare(
    a_file: str,
    b_file: str | None = None,
    b_list: str | None = None,
    cfg: CompareConfig | None = None,
    print_header: bool = False,
    out: IO | None = None,
) -> None:
    out = out if out is not None else sys.stdout
    if print_header:
        out.write("a_file\tb_file\thits\tmisses\tfrac\n")
    comparer = GenomeComparer(a_file, cfg)

    def _exit_unreadable_query(path):
        # reference src/genome_compare.c:289; the reference's handling of an
        # unreadable -a file is a HANG (GEN_read_seq_file has no error
        # check, src/genome_compare.c:460-461) — we fail cleanly instead
        # (documented divergence, docs/PARITY.md)
        print(
            f"could not read file {path} in GEN_calculate_coverage()",
            file=sys.stderr,
        )
        raise SystemExit(1)

    if b_file:
        try:
            comparer.score_query(b_file, out)
        except OSError:
            _exit_unreadable_query(b_file)
    elif b_list:
        try:
            paths = read_list_file(b_list)
        except OSError:
            # reference src/genome_compare.c:251
            print(
                f"could not read file {b_list} in GEN_all_coverage()",
                file=sys.stderr,
            )
            raise SystemExit(1)
        native_host = comparer._host is not None and not isinstance(
            comparer._host, _HostSetComparer
        )  # the pure-Python fallback is GIL-bound: threads add nothing
        if native_host and len(paths) > 1:
            # native string engine: score queries concurrently (the key set
            # is read-only; results are scalar tallies written in list
            # order — byte-identical to the sequential loop)
            import concurrent.futures
            import os

            threads = max(
                1,
                min(
                    int(os.environ.get("STRAINER2_COMPARE_THREADS", "0"))
                    or (os.cpu_count() or 1),
                    8,
                    len(paths),
                ),
            )
            if threads > 1:
                cfg_ = comparer.cfg

                def score(path):
                    try:
                        return comparer._host.score(
                            path, cfg_.max_seeds, cfg_.threshold_for_fullmap
                        )
                    except OSError as e:
                        return e

                with concurrent.futures.ThreadPoolExecutor(threads) as ex:
                    results = list(ex.map(score, paths))
                for path, res in zip(paths, results):
                    if isinstance(res, OSError):
                        _exit_unreadable_query(path)
                    hits, misses = res
                    out.write(
                        f"{a_file}\t{path}\t{hits}\t{misses}\t"
                        f"{_c_fraction(hits, misses)}\n"
                    )
                return
        for path in paths:
            try:
                comparer.score_query(path, out)
            except OSError:
                _exit_unreadable_query(path)
