"""Pallas extraction kernel vs the jnp reference kernel (bit-exact)."""

import numpy as np
import pytest

import jax.numpy as jnp

from strainer2_tpu.ops.packing import canonical_windows
from strainer2_tpu.ops.pallas_kernels import canonical_windows_pallas
from tests.oracle import random_dna, seq_to_base_codes


@pytest.mark.parametrize("k", [15, 20, 31])
def test_pallas_extraction_matches_jnp(k):
    rng = np.random.default_rng(k)
    rows, length = 16, 512
    bases = np.full((rows, length), 4, dtype=np.uint8)
    for r in range(rows):
        s = seq_to_base_codes(random_dna(rng, int(rng.integers(k, length)), n_prob=0.03))
        bases[r, : s.size] = s

    ref = canonical_windows(jnp.asarray(bases), k)
    hi, lo, valid = canonical_windows_pallas(jnp.asarray(bases), k)
    np.testing.assert_array_equal(np.asarray(valid).astype(bool), np.asarray(ref.valid))
    mask = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(hi)[mask], np.asarray(ref.hi)[mask])
    np.testing.assert_array_equal(np.asarray(lo)[mask], np.asarray(ref.lo)[mask])


@pytest.mark.parametrize("variant", ["gridmap", "manual"])
def test_pallas_bucket_lookup_matches_xla(variant):
    """DMA-gather lookup experiments (ops/pallas_lookup.py) vs the XLA
    bucket_lookup oracle — exact (found, slot, meta) on a hit/miss mix."""
    from strainer2_tpu.index.bucket import build_bucket_table
    from strainer2_tpu.ops.lookup import bucket_lookup
    from strainer2_tpu.ops.packing_np import split_code64_np
    from strainer2_tpu.ops.pallas_lookup import (
        bucket_lookup_pallas_gridmap,
        bucket_lookup_pallas_manual,
    )

    k = 31
    rng = np.random.default_rng(3)
    codes = np.unique(rng.integers(0, 1 << 62, size=5000, dtype=np.uint64))
    table = build_bucket_table(codes, k)
    meta = (np.arange(table.num_slots, dtype=np.uint32) * 2654435761) & 0xFFFFFFFF
    rows = jnp.asarray(table.with_meta(meta))

    n = 2048
    q = np.where(
        rng.random(n) < 0.5,
        codes[rng.integers(0, codes.size, size=n)],
        rng.integers(0, 1 << 62, size=n, dtype=np.uint64),
    )
    qhi, qlo = split_code64_np(q, k)
    qhi, qlo = jnp.asarray(qhi), jnp.asarray(qlo)

    ref_found, ref_slot, ref_meta = bucket_lookup(
        rows, table.h_bits, table.salt, qhi, qlo
    )
    if variant == "gridmap":
        found, slot, meta_out = bucket_lookup_pallas_gridmap(
            rows, table.h_bits, table.salt, qhi, qlo, group=8
        )
    else:
        found, slot, meta_out = bucket_lookup_pallas_manual(
            rows, table.h_bits, table.salt, qhi, qlo, w=8, d=4, chunk=512
        )
    np.testing.assert_array_equal(np.asarray(found), np.asarray(ref_found))
    f = np.asarray(ref_found)
    np.testing.assert_array_equal(np.asarray(slot)[f], np.asarray(ref_slot)[f])
    np.testing.assert_array_equal(np.asarray(meta_out)[f], np.asarray(ref_meta)[f])


def test_engine_pallas_extraction_path_matches_jnp(monkeypatch):
    """KmerEngine.extract_codes with the Pallas TPU branch force-enabled
    (kernel interprets on CPU) returns exactly the jnp path's codes."""
    import strainer2_tpu.pipeline.engine as engine_mod
    from strainer2_tpu.pipeline.engine import KmerEngine
    from tests.oracle import random_dna, seq_to_base_codes

    rng = np.random.default_rng(9)
    rows, length = 16, 256
    bases = np.full((rows, length), 4, dtype=np.uint8)
    for r in range(rows):
        s = seq_to_base_codes(random_dna(rng, int(rng.integers(40, length)), n_prob=0.05))
        bases[r, : s.size] = s

    eng = KmerEngine(31)
    jnp_codes = eng.extract_codes(bases)
    monkeypatch.setattr(engine_mod, "_pallas_extract_on", lambda: True)
    pallas_codes = eng.extract_codes(bases)
    np.testing.assert_array_equal(jnp_codes, pallas_codes)
