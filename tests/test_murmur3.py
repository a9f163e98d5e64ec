"""Murmur3 kernel parity: vectorized numpy vs scalar reference vs known vectors."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rkmh_spark.functions.murmur3 import murmur3_scalar, murmur3_x64_128_low64

# Known-good vectors for MurmurHash3_x64_128 low 64 bits, computed with the
# canonical C++ implementation / mmh3 (mmh3.hash64(key, seed, signed=False)[0]).
KNOWN = [
    (b"", 0, 0x0000000000000000),
    (b"a", 0, 0x85555565F6597889),
    (b"foo", 0, 0xE271865701F54561),  # mmh3 docs: hash64('foo')[0] signed -2129773440516405919
    (b"abc", 0, 0xB4963F3F3FAD7867),
    (b"Hello, world!", 42, 0x01C8726001FDD5C4),
    (b"The quick brown fox jumps over the lazy dog", 0, 0xE34BBC7BBC071B6C),
]


@pytest.mark.parametrize("key,seed,expect", KNOWN)
def test_scalar_known_vectors(key, seed, expect):
    assert murmur3_scalar(key, seed) == expect


@pytest.mark.parametrize("length", [1, 7, 8, 9, 15, 16, 17, 31, 32, 33, 48])
def test_vectorized_matches_scalar(length):
    rng = np.random.default_rng(7)
    mat = rng.integers(0, 256, size=(50, length), dtype=np.uint8)
    out = murmur3_x64_128_low64(mat, seed=42)
    for i in range(mat.shape[0]):
        assert out[i] == murmur3_scalar(mat[i].tobytes(), 42), f"row {i} len {length}"


@given(st.binary(min_size=1, max_size=64), st.integers(0, 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_vectorized_matches_scalar_property(data, seed):
    mat = np.frombuffer(data, dtype=np.uint8).reshape(1, -1)
    assert murmur3_x64_128_low64(mat, seed)[0] == murmur3_scalar(data, seed)


def test_empty_matrix():
    out = murmur3_x64_128_low64(np.empty((0, 16), dtype=np.uint8))
    assert out.shape == (0,)
