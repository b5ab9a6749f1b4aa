"""Streaming FASTA/FASTQ(.gz) record reader (pure-Python data plane).

Functional twin of the reference's kseq parser (reference src/kseq.h:171-211
instantiated over zlib so plain and gzip files are transparent).  The native
C++ reader in strainer2_tpu/native is the production path; this module is
the always-available fallback and the behavior oracle for it.

Yields raw sequence bytes; case-folding and base validation happen in the
2-bit encoder (reference uppercases via BIO_stringToUpper and rejects only
'N' per window; our encoder maps every non-ACGT byte to the invalid code).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, NamedTuple

__all__ = ["FastxRecord", "read_fastx", "open_maybe_gzip"]


class FastxRecord(NamedTuple):
    name: bytes
    seq: bytes


def open_maybe_gzip(path: str, mode: str = "rb"):
    """Open plain or gzip file transparently (like zlib's gzopen)."""
    if "r" in mode:
        f = open(path, "rb")
        magic = f.read(2)
        f.seek(0)
        if magic == b"\x1f\x8b":
            return io.BufferedReader(gzip.GzipFile(fileobj=f))
        return io.BufferedReader(f)
    raise ValueError("open_maybe_gzip is read-only")


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Iterate records of a FASTA or FASTQ file (auto-detected, multiline ok).

    Name is the header up to the first whitespace (kseq semantics).
    """
    with open_maybe_gzip(path) as f:
        first = f.peek(1)[:1] if hasattr(f, "peek") else b""
        if first == b">":
            yield from _read_fasta(f)
        elif first == b"@":
            yield from _read_fastq(f)
        elif first == b"":
            return
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def _header_name(line: bytes) -> bytes:
    return line[1:].split(None, 1)[0] if len(line) > 1 else b""


def _read_fasta(f) -> Iterator[FastxRecord]:
    name = None
    chunks: list[bytes] = []
    for raw in f:
        line = raw.rstrip(b"\r\n")
        if line.startswith(b">"):
            if name is not None:
                yield FastxRecord(name, b"".join(chunks))
            name = _header_name(line)
            chunks = []
        elif line:
            chunks.append(line)
    if name is not None:
        yield FastxRecord(name, b"".join(chunks))


def _read_fastq(f) -> Iterator[FastxRecord]:
    while True:
        header = f.readline()
        if not header:
            return
        header = header.rstrip(b"\r\n")
        if not header:
            continue
        if not header.startswith(b"@"):
            raise ValueError(f"bad FASTQ header: {header[:40]!r}")
        name = _header_name(header)
        # sequence lines until '+'
        chunks: list[bytes] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError("truncated FASTQ record")
            line = line.rstrip(b"\r\n")
            if line.startswith(b"+"):
                break
            chunks.append(line)
        seq = b"".join(chunks)
        # quality lines until length matches
        qlen = 0
        while qlen < len(seq):
            line = f.readline()
            if not line:
                raise ValueError("truncated FASTQ quality")
            qlen += len(line.rstrip(b"\r\n"))
        yield FastxRecord(name, seq)
