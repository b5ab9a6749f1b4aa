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
