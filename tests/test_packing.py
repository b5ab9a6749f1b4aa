import numpy as np
import pytest

import jax.numpy as jnp

from strainer2_tpu.ops import (
    canonical_windows,
    decode_codes_np,
    encode_ascii,
    encode_ascii_np,
    merge_code64_np,
    pack_windows,
    split_code64_np,
)
from tests.oracle import (
    canonical_codes_of_seq,
    kmer_to_code,
    random_dna,
    seq_to_base_codes,
    windows_of,
)


def test_encode_ascii_matches_np():
    raw = np.frombuffer(b"ACGTacgtNnXY-*", dtype=np.uint8)
    dev = np.asarray(encode_ascii(jnp.asarray(raw)))
    host = encode_ascii_np(raw)
    np.testing.assert_array_equal(dev, host)
    np.testing.assert_array_equal(host[:8], [0, 1, 2, 3, 0, 1, 2, 3])
    assert (host[8:] == 4).all()


@pytest.mark.parametrize("k", [1, 2, 5, 15, 16, 17, 20, 31, 32])
def test_pack_windows_forward_oracle(k):
    rng = np.random.default_rng(k)
    seq = random_dna(rng, 80, n_prob=0.05)
    bases = seq_to_base_codes(seq)[None, :]
    win = pack_windows(jnp.asarray(bases), k)
    hi = np.asarray(win.hi)[0].astype(np.uint64)
    lo = np.asarray(win.lo)[0].astype(np.uint64)
    valid = np.asarray(win.valid)[0]
    codes = merge_code64_np(hi, lo, k)
    for i, w in windows_of(seq, k):
        expect_valid = all(c in "ACGT" for c in w)
        assert valid[i] == expect_valid, (i, w)
        if expect_valid:
            assert codes[i] == kmer_to_code(w), (i, w)


@pytest.mark.parametrize("k", [3, 16, 21, 31, 32])
def test_canonical_windows_oracle(k):
    rng = np.random.default_rng(100 + k)
    seqs = [random_dna(rng, 70, n_prob=0.03) for _ in range(4)]
    bases = np.stack([seq_to_base_codes(s) for s in seqs])
    win = canonical_windows(jnp.asarray(bases), k)
    codes = merge_code64_np(
        np.asarray(win.hi).astype(np.uint64), np.asarray(win.lo).astype(np.uint64), k
    )
    valid = np.asarray(win.valid)
    for r, seq in enumerate(seqs):
        expect = canonical_codes_of_seq(seq, k)
        for i, (ev, ec) in enumerate(expect):
            assert valid[r, i] == ev, (r, i)
            if ev:
                assert codes[r, i] == ec, (r, i, seq[i : i + k])


def test_canonical_palindrome_forward_wins():
    # A palindromic k-mer: fwd == rc; canonical must equal fwd (tie rule).
    seq = "ACGT" * 4  # k=16 palindrome ACGTACGTACGTACGT? rc == itself
    k = 16
    bases = seq_to_base_codes(seq)[None, :]
    win = canonical_windows(jnp.asarray(bases), k)
    code = merge_code64_np(
        np.asarray(win.hi).astype(np.uint64), np.asarray(win.lo).astype(np.uint64), k
    )[0]
    assert code == kmer_to_code(seq)


def test_split_merge_decode_roundtrip():
    rng = np.random.default_rng(7)
    k = 31
    codes = rng.integers(0, 1 << 62, size=32, dtype=np.uint64)
    hi, lo = split_code64_np(codes, k)
    np.testing.assert_array_equal(merge_code64_np(hi, lo, k), codes)
    strings = decode_codes_np(codes[:4], k)
    for s, c in zip(strings, codes[:4]):
        assert kmer_to_code(s) == int(c)


def test_pack_windows_batch_shapes():
    bases = jnp.zeros((3, 5, 40), dtype=jnp.uint8)
    win = pack_windows(bases, 31)
    assert win.hi.shape == (3, 5, 10)
    assert win.valid.dtype == jnp.bool_
