"""Device kernels: 2-bit encoding and canonical k-mer window extraction.

TPU-first design notes
----------------------
The reference extracts k-mers by sliding a char window over each read and
re-comparing fwd vs reverse-complement strings per window (reference
src/genome_compare.c:1100-1141, src/strain_detect.c:456-474).  Here the whole
batch of sequences is a dense int array and every window's packed code is
produced with an O(log k) "doubling" combine — pure element-wise shifts/ors on
(rows, width) arrays, which XLA fuses into a handful of VPU passes.  There are
no per-window loops and no data-dependent shapes.

Representation
--------------
A k-mer (k <= 32) is packed MSB-first, base i at bit 2*(k-1-i), with
A=0 < C=1 < G=2 < T=3.  Because this ordering matches ASCII order of
"ACGT", numeric comparison of packed codes is exactly strcmp of the
corresponding strings, so the reference's canonical rule "lexicographically
greater of fwd/rc, forward wins ties" (reference src/genome_compare.c:505,
1108) becomes `canonical = max(fwd_code, rc_code)`.

On device a code is stored as two uint32 planes split at a *base* boundary:
``lo`` holds the last n_lo = min(k, 16) bases (up to 32 bits) and ``hi`` the
first k - n_lo bases.  Splitting at a base boundary means the planes are
built independently — no cross-word carries anywhere.
full code (as uint64 on host) = hi << (2 * n_lo) | lo.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from strainer2_tpu.constants import INVALID_BASE, MAX_K
from strainer2_tpu.ops.packing_np import (  # noqa: F401  (re-exported host twins)
    _ASCII_TABLE,
    canonical_codes_np,
    decode_codes_np,
    encode_ascii_np,
    merge_code64_np,
    split_code64_np,
)

__all__ = [
    "KmerWindows",
    "encode_ascii",
    "encode_ascii_np",
    "pack_windows",
    "canonical_windows",
    "split_code64_np",
    "merge_code64_np",
    "decode_codes_np",
]


class KmerWindows(NamedTuple):
    """Packed k-mer codes for every window of a base array.

    hi, lo: uint32 planes, shape (..., width) where width = L - k + 1.
    valid:  bool, True where the window contains only A/C/G/T bases
            (reference rejects windows containing N, and our packed host
            buffers reuse the invalid code as read separator/padding).
    """

    hi: jax.Array
    lo: jax.Array
    valid: jax.Array


# --- ASCII -> 2-bit encoding -------------------------------------------------

def encode_ascii(ascii_bytes: jax.Array) -> jax.Array:
    """Map uint8 ASCII bytes to base codes 0..3 / INVALID_BASE on device.

    Case-insensitive (the reference uppercases every sequence first,
    reference src/BIO_sequence.c:228-234); every non-ACGT byte becomes
    INVALID_BASE, which subsumes the reference's per-window N rejection.
    """
    table = jnp.asarray(_ASCII_TABLE)
    return jnp.take(table, ascii_bytes.astype(jnp.int32), axis=0)


# --- window packing ----------------------------------------------------------

def _pow2_packs(two_bit: jax.Array, ok1: jax.Array, max_size: int):
    """Build packed codes / validity for window sizes 1, 2, 4, ... max_size.

    packs[n][..., i] = bases i..i+n-1 packed MSB-first (2n bits, n <= 16)
    oks[n][..., i]   = all n bases valid
    Each doubling is one shift+or (and one and) over a full array: O(log k)
    passes total instead of the reference's O(k) per-window work.
    """
    packs = {1: two_bit}
    oks = {1: ok1}
    n = 1
    while n < max_size:
        a_pack, a_ok = packs[n], oks[n]
        # combine window [i, i+n) with window [i+n, i+2n)
        packs[2 * n] = (a_pack[..., : a_pack.shape[-1] - n] << jnp.uint32(2 * n)) | a_pack[..., n:]
        oks[2 * n] = a_ok[..., : a_ok.shape[-1] - n] & a_ok[..., n:]
        n *= 2
    return packs, oks


def _combine(packs, oks, sizes: list[int], offset0: int, width: int):
    """Pack ``sum(sizes)`` bases starting at offset0, for every window start.

    sizes is the power-of-two decomposition (descending) of the span length.
    """
    pack = packs[sizes[0]][..., offset0 : offset0 + width]
    ok = oks[sizes[0]][..., offset0 : offset0 + width]
    pos = offset0 + sizes[0]
    for n in sizes[1:]:
        pack = (pack << jnp.uint32(2 * n)) | packs[n][..., pos : pos + width]
        ok = ok & oks[n][..., pos : pos + width]
        pos += n
    return pack, ok


def _pow2_decomposition(n: int) -> list[int]:
    sizes = []
    bit = 16
    while bit >= 1:
        if n & bit:
            sizes.append(bit)
        bit >>= 1
    return sizes


def pack_windows(bases: jax.Array, k: int) -> KmerWindows:
    """Pack every length-k window of ``bases`` (forward strand).

    bases: (..., L) integer array with values 0..3 (valid) or >=4 (invalid).
    Returns planes of shape (..., L - k + 1).
    """
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")
    length = bases.shape[-1]
    if length < k:
        raise ValueError(f"sequence length {length} < k {k}")
    width = length - k + 1

    b32 = bases.astype(jnp.uint32)
    ok1 = b32 < jnp.uint32(INVALID_BASE)
    two_bit = b32 & jnp.uint32(3)  # deterministic garbage for invalid bases

    n_lo = min(k, 16)
    n_hi = k - n_lo
    max_size = max(_pow2_decomposition(n_lo)[:1] + _pow2_decomposition(max(n_hi, 1))[:1])
    packs, oks = _pow2_packs(two_bit, ok1, max_size)

    if n_hi:
        hi, ok_hi = _combine(packs, oks, _pow2_decomposition(n_hi), 0, width)
        lo, ok_lo = _combine(packs, oks, _pow2_decomposition(n_lo), n_hi, width)
        valid = ok_hi & ok_lo
    else:
        lo, valid = _combine(packs, oks, _pow2_decomposition(n_lo), 0, width)
        hi = jnp.zeros_like(lo)
    return KmerWindows(hi=hi, lo=lo, valid=valid)


def canonical_windows(bases: jax.Array, k: int) -> KmerWindows:
    """Canonical (max of fwd / revcomp) packed code for every window.

    Equivalent to the reference's orient_string over each window
    (reference src/genome_compare.c:1100-1141) but fully vectorized: the
    reverse-complement planes are the forward planes of the
    complemented-and-reversed sequence, read back-to-front, so the same
    O(log k) packer is reused and the canonical pick is a 3-op select.
    """
    fwd = pack_windows(bases, k)

    b32 = bases.astype(jnp.uint32)
    comp = jnp.where(b32 < jnp.uint32(INVALID_BASE), jnp.uint32(3) - b32,
                     jnp.uint32(INVALID_BASE))
    comp_rev = jnp.flip(comp, axis=-1)
    rc_all = pack_windows(comp_rev, k)
    # rc of the window starting at i is the forward window of comp_rev
    # starting at L - k - i, i.e. the flipped window axis.
    rc = KmerWindows(
        hi=jnp.flip(rc_all.hi, axis=-1),
        lo=jnp.flip(rc_all.lo, axis=-1),
        valid=fwd.valid,
    )

    fwd_wins = (fwd.hi > rc.hi) | ((fwd.hi == rc.hi) & (fwd.lo >= rc.lo))
    return KmerWindows(
        hi=jnp.where(fwd_wins, fwd.hi, rc.hi),
        lo=jnp.where(fwd_wins, fwd.lo, rc.lo),
        valid=fwd.valid,
    )
