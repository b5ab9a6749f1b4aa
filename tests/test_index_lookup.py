import numpy as np
import jax.numpy as jnp

from strainer2_tpu.index import StrainIndex, build_cuckoo
from strainer2_tpu.ops.lookup import accumulate_counts, cuckoo_lookup, sorted_lookup
from strainer2_tpu.ops.packing import split_code64_np

K = 31


def _random_codes(rng, n):
    return np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))


def test_cuckoo_build_and_lookup_roundtrip():
    rng = np.random.default_rng(0)
    codes = _random_codes(rng, 5000)
    t = build_cuckoo(codes, K)

    # every key sits where slot_of_key says
    hi, lo = split_code64_np(codes, K)
    np.testing.assert_array_equal(t.table[t.slot_of_key, 0], hi)
    np.testing.assert_array_equal(t.table[t.slot_of_key, 1], lo)

    # device lookup finds all keys at the recorded slots
    table = jnp.asarray(t.table)
    found, slot = cuckoo_lookup(table, t.h_bits, t.salt, jnp.asarray(hi), jnp.asarray(lo))
    assert bool(np.all(np.asarray(found)))
    np.testing.assert_array_equal(np.asarray(slot), t.slot_of_key)

    # absent keys are not found
    absent = np.setdiff1d(_random_codes(rng, 4000), codes)[:1000]
    ahi, alo = split_code64_np(absent, K)
    found_a, _ = cuckoo_lookup(table, t.h_bits, t.salt, jnp.asarray(ahi), jnp.asarray(alo))
    assert not bool(np.any(np.asarray(found_a)))


def test_sorted_lookup_matches_cuckoo():
    rng = np.random.default_rng(1)
    codes = _random_codes(rng, 3000)
    t = build_cuckoo(codes, K)
    table = jnp.asarray(t.table)

    sorted_codes = np.sort(codes)
    shi, slo = split_code64_np(sorted_codes, K)
    keys = jnp.asarray(np.stack([shi, slo], axis=1))

    queries = np.concatenate([codes[::3], _random_codes(rng, 500)])
    qhi, qlo = split_code64_np(queries, K)
    f_c, _ = cuckoo_lookup(table, t.h_bits, t.salt, jnp.asarray(qhi), jnp.asarray(qlo))
    f_s, pos = sorted_lookup(keys, jnp.asarray(qhi), jnp.asarray(qlo))
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_s))
    expect = np.isin(queries, codes)
    np.testing.assert_array_equal(np.asarray(f_c), expect)
    # found positions point at the right sorted key
    pos_np = np.asarray(pos)[expect]
    np.testing.assert_array_equal(sorted_codes[pos_np], queries[expect])


def test_accumulate_counts_multiplicity():
    rng = np.random.default_rng(2)
    codes = _random_codes(rng, 64)
    t = build_cuckoo(codes, K)
    table = jnp.asarray(t.table)

    # query each key i exactly (i % 5) times, plus absent noise
    reps = np.repeat(np.arange(codes.size), np.arange(codes.size) % 5)
    queries = codes[reps]
    qhi, qlo = split_code64_np(queries, K)
    found, slot = cuckoo_lookup(table, t.h_bits, t.salt, jnp.asarray(qhi), jnp.asarray(qlo))
    counts = jnp.zeros(t.num_slots, dtype=jnp.uint32)
    counts = accumulate_counts(counts, slot, found)
    got = np.asarray(counts)[t.slot_of_key]
    np.testing.assert_array_equal(got, np.arange(codes.size) % 5)


def test_strain_index_from_scan_codes_first_encounter_order():
    scan = np.array([7, 3, 7, 9, 3, 3, 11], dtype=np.uint64)
    idx = StrainIndex.from_scan_codes(scan, k=K)
    np.testing.assert_array_equal(idx.codes, [7, 3, 9, 11])
    np.testing.assert_array_equal(idx.genome_counts, [2, 3, 1, 1])

    # slot/key gather round trip
    per_key = np.array([10, 20, 30, 40], dtype=np.uint32)
    per_slot = idx.slot_values(per_key)
    np.testing.assert_array_equal(idx.key_values(per_slot), per_key)


def test_strain_index_save_load(tmp_path):
    rng = np.random.default_rng(3)
    scan = rng.integers(0, 1 << 62, size=500, dtype=np.uint64)
    idx = StrainIndex.from_scan_codes(scan, k=K)
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = StrainIndex.load(p)
    np.testing.assert_array_equal(idx.codes, idx2.codes)
    np.testing.assert_array_equal(idx.table.table, idx2.table.table)
    assert idx.table.h_bits == idx2.table.h_bits
