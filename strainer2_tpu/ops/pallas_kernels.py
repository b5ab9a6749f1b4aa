"""Pallas TPU kernels.

The engine's only FLOP-dense stage is canonical window extraction; XLA
already fuses the jnp formulation well, but the Pallas version keeps every
intermediate plane in VMEM for one (block_rows, row_len) tile at a time —
zero HBM traffic for intermediates — and is the building block for fusing
extraction directly into future Pallas pipelines (e.g. on hardware with a
vectorized gather, where extract+lookup could run as one kernel).

The membership gather/scatter stages are deliberately NOT Pallas: Mosaic
has no vectorized dynamic indexing on v5e ("Cannot do int indexing on
TPU"), so XLA's serialized gather/scatter is already the best available
primitive there (docs/PERFORMANCE.md).

Correctness is pinned against the jnp kernels (tests/test_pallas.py); on
non-TPU backends the kernel runs in interpreter mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from strainer2_tpu.constants import INVALID_BASE, MAX_K

__all__ = ["canonical_windows_pallas"]

_BLOCK_ROWS = 8


def _decompose(n: int) -> list[int]:
    sizes = []
    bit = 16
    while bit >= 1:
        if n & bit:
            sizes.append(bit)
        bit >>= 1
    return sizes


def _pack_block(b32, ok1, k: int, width: int):
    """Same O(log k) doubling combine as ops/packing.py, on a VMEM tile."""
    packs = {1: b32 & jnp.uint32(3)}
    oks = {1: ok1}
    n = 1
    need = max(_decompose(min(k, 16))[:1] + _decompose(max(k - 16, 1))[:1])
    while n < need:
        a_p, a_o = packs[n], oks[n]
        packs[2 * n] = (a_p[:, : a_p.shape[1] - n] << jnp.uint32(2 * n)) | a_p[:, n:]
        oks[2 * n] = a_o[:, : a_o.shape[1] - n] & a_o[:, n:]
        n *= 2

    def combine(sizes, offset0):
        p = packs[sizes[0]][:, offset0 : offset0 + width]
        o = oks[sizes[0]][:, offset0 : offset0 + width]
        pos = offset0 + sizes[0]
        for m in sizes[1:]:
            p = (p << jnp.uint32(2 * m)) | packs[m][:, pos : pos + width]
            o = o & oks[m][:, pos : pos + width]
            pos += m
        return p, o

    n_lo = min(k, 16)
    n_hi = k - n_lo
    if n_hi:
        hi, ok_hi = combine(_decompose(n_hi), 0)
        lo, ok_lo = combine(_decompose(n_lo), n_hi)
        return hi, lo, ok_hi & ok_lo
    lo, ok = combine(_decompose(n_lo), 0)
    return jnp.zeros_like(lo), lo, ok


def _rc_pack_block(comp, k: int, width: int):
    """Reverse-complement packs without any array reversal (Mosaic has no
    `rev`): rpack_n[i] packs comp(b[i+n-1]) .. comp(b[i]) MSB-first, built
    by the mirrored doubling rpack_2n[i] = rpack_n[i+n] << 2n | rpack_n[i].
    """
    packs = {1: comp & jnp.uint32(3)}
    n = 1
    need = max(_decompose(min(k, 16))[:1] + _decompose(max(k - 16, 1))[:1])
    while n < need:
        a = packs[n]
        packs[2 * n] = (a[:, n:] << jnp.uint32(2 * n)) | a[:, : a.shape[1] - n]
        n *= 2

    def combine(sizes, offset0, span):
        # window [offset0, offset0+span): the rc string's HIGH part comes
        # from the window's tail
        pos = offset0 + span
        out = None
        for m in sizes:
            pos -= m
            piece = packs[m][:, pos : pos + width]
            out = piece if out is None else (out << jnp.uint32(2 * m)) | piece
        return out

    n_lo = min(k, 16)
    n_hi = k - n_lo
    if n_hi:
        # rc_hi = comp of the last n_hi bases (reversed) -> tail of window
        rhi = combine(_decompose(n_hi), n_lo, n_hi)
        rlo = combine(_decompose(n_lo), 0, n_lo)
        return rhi, rlo
    return None, combine(_decompose(n_lo), 0, n_lo)


def _kernel(bases_ref, hi_ref, lo_ref, valid_ref, *, k: int, width: int):
    b32 = bases_ref[:, :].astype(jnp.uint32)
    ok1 = b32 < jnp.uint32(INVALID_BASE)

    fhi, flo, valid = _pack_block(b32, ok1, k, width)

    comp = jnp.where(ok1, jnp.uint32(3) - b32, jnp.uint32(INVALID_BASE))
    rhi, rlo = _rc_pack_block(comp, k, width)
    if rhi is None:
        rhi = jnp.zeros_like(rlo)

    fwd_wins = (fhi > rhi) | ((fhi == rhi) & (flo >= rlo))
    hi_ref[:, :] = jnp.where(fwd_wins, fhi, rhi)
    lo_ref[:, :] = jnp.where(fwd_wins, flo, rlo)
    valid_ref[:, :] = valid.astype(jnp.int32)


def canonical_windows_pallas(bases: jax.Array, k: int):
    """Pallas twin of ops.packing.canonical_windows for 2-D batches.

    Returns (hi, lo, valid) with valid as int32 (Mosaic-friendly);
    semantics match canonical_windows exactly.
    """
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}]")
    rows, length = bases.shape
    width = length - k + 1
    if rows % _BLOCK_ROWS:
        raise ValueError(f"rows must be a multiple of {_BLOCK_ROWS}")

    interpret = jax.default_backend() != "tpu"
    out_shape = [
        jax.ShapeDtypeStruct((rows, width), jnp.uint32),
        jax.ShapeDtypeStruct((rows, width), jnp.uint32),
        jax.ShapeDtypeStruct((rows, width), jnp.int32),
    ]
    grid = (rows // _BLOCK_ROWS,)
    in_spec = pl.BlockSpec((_BLOCK_ROWS, length), lambda i: (i, 0))
    out_spec = pl.BlockSpec((_BLOCK_ROWS, width), lambda i: (i, 0))
    hi, lo, valid = pl.pallas_call(
        partial(_kernel, k=k, width=width),
        out_shape=out_shape,
        grid=grid,
        in_specs=[in_spec],
        out_specs=[out_spec, out_spec, out_spec],
        interpret=interpret,
    )(bases.astype(jnp.int32))
    return hi, lo, valid
