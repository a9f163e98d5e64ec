"""Sketch-kernel semantics pinned to the reference (SURVEY.md §7.1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rkmh_spark.functions.shingles import (
    bottom_s_sketch,
    multiset_intersection_size,
    shingle_hashes,
    shingle_matrix,
    sketch_text,
)


def test_shingle_count():
    # len(bytes) - k + 1 shingles, like the reference's k-mer enumeration
    assert shingle_matrix("abcdefgh", 3).shape == (6, 3)
    assert shingle_matrix("ab", 3).shape == (0, 3)


def test_shingle_values():
    m = shingle_matrix("abcd", 2)
    assert [bytes(r) for r in m] == [b"ab", b"bc", b"cd"]


def test_bottom_s_keeps_duplicates():
    # duplicates kept — rkmh.cpp:1236-1239 does not dedup
    h = np.array([5, 3, 3, 9, 1], dtype=np.uint64)
    np.testing.assert_array_equal(
        bottom_s_sketch(h, 4), np.array([1, 3, 3, 5], dtype=np.uint64)
    )


def test_bottom_s_skips_zero_sentinel():
    h = np.array([0, 0, 7, 2], dtype=np.uint64)
    np.testing.assert_array_equal(
        bottom_s_sketch(h, 4), np.array([2, 7], dtype=np.uint64)
    )


def test_bottom_s_uses_unsigned_order():
    # values >= 2^63 must sort AFTER small values (u64 order, not i64)
    big = np.uint64(2**63 + 5)
    h = np.array([big, 10, 3], dtype=np.uint64)
    out = bottom_s_sketch(h, 2)
    np.testing.assert_array_equal(out, np.array([3, 10], dtype=np.uint64))


def test_multiset_intersection_counts_multiplicity():
    a = np.array([1, 2, 2, 3], dtype=np.int64)
    b = np.array([2, 2, 2, 3, 4], dtype=np.int64)
    # min(2,3) for value 2, min(1,1) for value 3 → 3
    assert multiset_intersection_size(a, b) == 3


def test_identical_texts_identical_sketches():
    t = "the quick brown fox jumps over the lazy dog " * 4
    s1 = sketch_text(t, k=8, s=32)
    s2 = sketch_text(t, k=8, s=32)
    np.testing.assert_array_equal(s1, s2)
    assert multiset_intersection_size(s1, s2) == s1.size


@given(st.text(alphabet=st.characters(codec="ascii"), min_size=20, max_size=200))
@settings(max_examples=50, deadline=None)
def test_sketch_invariance_under_hash_order(text):
    # sketch depends only on the hash multiset, not enumeration order
    h = shingle_hashes(text, 5)
    rng = np.random.default_rng(1)
    perm = rng.permutation(h)
    np.testing.assert_array_equal(bottom_s_sketch(h, 16), bottom_s_sketch(perm, 16))


def test_sketch_monotone_in_s():
    t = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
    s16 = sketch_text(t, k=6, s=16)
    s32 = sketch_text(t, k=6, s=32)
    np.testing.assert_array_equal(s16, s32[:16])
