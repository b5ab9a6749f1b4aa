"""ops/segsum.boundary_strain_sums == the full-cumsum classify, bit-exact.

The two-level chunked prefix must produce identical integer totals for
every boundary layout: chunk-aligned, unaligned, empty reads, Q an exact
chunk multiple, partial last meta word, dense (read < chunk) and sparse
(read >> chunk) boundaries.

Every case runs under BOTH vector-program bodies — the SWAR vertical
counters (default) and the bit-expanded A/B control
(STRAINER2_SEGSUM=expand) — so the switch stays a real control.  The env
variable is captured once at module import (segsum._SEGSUM_EXPAND), so
the per-parametrization control patches the attribute directly; each case
jits a fresh lambda so the patched body actually retraces.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from strainer2_tpu.ops import segsum
from strainer2_tpu.ops.segsum import boundary_strain_sums


@pytest.fixture(params=["swar", "expand"], autouse=True)
def segsum_mode(request, monkeypatch):
    monkeypatch.setattr(segsum, "_SEGSUM_EXPAND", request.param == "expand")
    return request.param


def _reference(masked_words, boundaries, n_strains):
    """The round-1 (Q, S) expand + full cumsum path, in numpy."""
    ps, infs = [], []
    for j, w in enumerate(masked_words):
        n_j = min(16, n_strains - 16 * j)
        if n_j <= 0:
            break
        shifts = np.arange(n_j, dtype=np.uint32) * 2
        ps.append(((w[:, None] >> shifts[None, :]) & 1).astype(np.int64))
        infs.append(((w[:, None] >> (shifts[None, :] + 1)) & 1).astype(np.int64))
    present = np.concatenate(ps, axis=1)
    informative = np.concatenate(infs, axis=1)
    zero = np.zeros((1, n_strains), dtype=np.int64)
    cum_tot = np.concatenate([zero, np.cumsum(present, axis=0)])
    cum_inf = np.concatenate([zero, np.cumsum(informative, axis=0)])
    b0, b1 = boundaries[:-1], boundaries[1:]
    return cum_tot[b1] - cum_tot[b0], cum_inf[b1] - cum_inf[b0]


def _case(rng, q, n_strains, boundaries, chunk):
    n_words = -(-n_strains // 16)
    masked = [
        rng.integers(0, 1 << 32, size=q, dtype=np.uint64).astype(np.uint32)
        for _ in range(n_words)
    ]
    want_tot, want_inf = _reference(masked, boundaries, n_strains)
    got_tot, got_inf = jax.jit(
        lambda ws, b: boundary_strain_sums(ws, b, n_strains, chunk=chunk)
    )([jnp.asarray(w) for w in masked], jnp.asarray(boundaries))
    np.testing.assert_array_equal(np.asarray(got_tot), want_tot)
    np.testing.assert_array_equal(np.asarray(got_inf), want_inf)


@pytest.mark.parametrize("n_strains", [1, 7, 16, 17, 32, 40, 96])
def test_matches_full_cumsum_random_boundaries(n_strains):
    rng = np.random.default_rng(3)
    q = 10_000
    cuts = np.sort(rng.choice(np.arange(1, q), size=37, replace=False))
    boundaries = np.concatenate([[0], cuts, [q]]).astype(np.int32)
    _case(rng, q, n_strains, boundaries, chunk=256)


@pytest.mark.parametrize(
    "q,chunk",
    [
        (1024, 256),  # exact chunk multiple (boundary Q lands past last chunk)
        (1000, 256),  # padded final chunk
        (100, 256),   # single partial chunk
        (5000, 64),   # small chunks, dense boundaries
    ],
)
def test_shape_edges(q, chunk):
    rng = np.random.default_rng(11)
    # dense boundaries incl. empty reads and chunk-aligned cuts
    cuts = np.unique(
        np.concatenate(
            [
                rng.integers(0, q + 1, size=50),
                np.arange(0, q + 1, chunk),  # aligned cuts: off == 0
            ]
        )
    )
    boundaries = np.concatenate([[0], cuts[(cuts > 0) & (cuts < q)], [q]])
    boundaries = np.repeat(boundaries, 2)[1:-1].reshape(-1, 2)[:, 0]  # empty reads
    boundaries = np.concatenate([boundaries, [q]]).astype(np.int32)
    _case(rng, q, 24, boundaries, chunk=chunk)


def test_single_read_whole_batch():
    rng = np.random.default_rng(5)
    _case(rng, 777, 16, np.array([0, 777], dtype=np.int32), chunk=128)


@pytest.mark.parametrize("chunk", [0, -1, 65536, 1 << 20])
def test_out_of_range_chunk_rejected(chunk):
    """chunk >= 2**16 would overflow the 16-bit SWAR slots (silent count
    corruption); the guard must fail loudly instead."""
    w = [jnp.zeros(8, dtype=jnp.uint32)]
    b = jnp.array([0, 8], dtype=jnp.int32)
    with pytest.raises(ValueError, match="chunk"):
        boundary_strain_sums(w, b, 4, chunk=chunk)
