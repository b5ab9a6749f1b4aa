import numpy as np
import jax.numpy as jnp

from strainer2_tpu.index.bucket import KEYS_PER_BUCKET, build_bucket_table
from strainer2_tpu.ops.lookup import bucket_lookup, cuckoo_lookup
from strainer2_tpu.ops.packing import split_code64_np
from strainer2_tpu.index.cuckoo import build_cuckoo

K = 31


def _codes(rng, n):
    return np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))


def test_bucket_build_and_lookup_roundtrip():
    rng = np.random.default_rng(0)
    codes = _codes(rng, 20000)
    t = build_bucket_table(codes, K)
    hi, lo = split_code64_np(codes, K)

    # placement contract: slot_of_key points at the key's cells
    flat_hi = t.table[:, 0:16].reshape(-1)
    flat_lo = t.table[:, 16:32].reshape(-1)
    np.testing.assert_array_equal(flat_hi[t.slot_of_key], hi)
    np.testing.assert_array_equal(flat_lo[t.slot_of_key], lo)

    rows = jnp.asarray(t.table)
    found, slot, _ = bucket_lookup(rows, t.h_bits, t.salt, jnp.asarray(hi), jnp.asarray(lo))
    assert bool(np.all(np.asarray(found)))
    np.testing.assert_array_equal(np.asarray(slot), t.slot_of_key)

    absent = np.setdiff1d(_codes(rng, 8000), codes)[:2000]
    ahi, alo = split_code64_np(absent, K)
    found_a, _, _ = bucket_lookup(rows, t.h_bits, t.salt, jnp.asarray(ahi), jnp.asarray(alo))
    assert not bool(np.any(np.asarray(found_a)))


def test_bucket_matches_cuckoo_membership():
    rng = np.random.default_rng(1)
    codes = _codes(rng, 5000)
    tb = build_bucket_table(codes, K)
    tc = build_cuckoo(codes, K)
    queries = np.concatenate([codes[::2], _codes(rng, 3000)])
    qhi, qlo = split_code64_np(queries, K)
    fb, _, _ = bucket_lookup(jnp.asarray(tb.table), tb.h_bits, tb.salt,
                             jnp.asarray(qhi), jnp.asarray(qlo))
    fc, _ = cuckoo_lookup(
        (jnp.asarray(np.ascontiguousarray(tc.table[:, 0])),
         jnp.asarray(np.ascontiguousarray(tc.table[:, 1]))),
        tc.h_bits, tc.salt, jnp.asarray(qhi), jnp.asarray(qlo))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fc))


def test_bucket_meta_lane():
    rng = np.random.default_rng(2)
    codes = _codes(rng, 1000)
    t = build_bucket_table(codes, K)
    meta_per_slot = np.zeros(t.num_slots, dtype=np.uint32)
    classes = (rng.integers(1, 3, size=codes.size)).astype(np.uint32)
    meta_per_slot[t.slot_of_key] = classes
    rows = jnp.asarray(t.with_meta(meta_per_slot))
    hi, lo = split_code64_np(codes, K)
    found, _, meta = bucket_lookup(rows, t.h_bits, t.salt, jnp.asarray(hi), jnp.asarray(lo))
    assert bool(np.all(np.asarray(found)))
    np.testing.assert_array_equal(np.asarray(meta), classes)
