"""Shingling + bottom-s MinHash sketch kernels (pure NumPy, Arrow-batch ready).

Reference semantics being reproduced (SURVEY.md §7.1):

- shingling = all overlapping k-byte substrings of the utf-8 text, the text
  analog of rkmh's k-mer enumeration (kmerize call sites
  /root/reference/src/rkmh.cpp:2228).
- hash = murmur3_x64_128 seed 42, low 64 bits
  (/root/reference/src/rkmh.cpp:493-497); forward-only for text (no
  reverse-complement canonicalization).
- sketch = the s smallest hashes of the sorted hash MULTISET — duplicates
  kept, zero-sentinels skipped — matching the open-coded bottom-s loops at
  /root/reference/src/rkmh.cpp:1236-1239,1277-1283.

u64/i64 note: Spark has no unsigned type. Sketches are computed and ordered
in uint64 space, then reinterpreted (bit-cast) to int64 for storage in
``array<long>`` columns. Every comparison that depends on magnitude happens
BEFORE the cast (SURVEY.md §7.4 risk 2).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from rkmh_spark.functions.murmur3 import murmur3_x64_128_low64


def shingle_matrix(text: str, k: int) -> np.ndarray:
    """All overlapping k-byte shingles of utf-8 ``text`` as an (N, k) uint8 view."""
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if raw.size < k:
        return np.empty((0, k), dtype=np.uint8)
    return sliding_window_view(raw, k)


def shingle_hashes(text: str, k: int, seed: int = 42) -> np.ndarray:
    """(N,) uint64 hash per shingle position (rkmh calc_hashes analog).

    Position-aligned like the reference's hash arrays; the reference writes
    sentinel 0 for invalid k-mers — text has no invalid shingles, but a
    genuine hash value of 0 is still dropped at sketch time for parity.
    """
    return murmur3_x64_128_low64(shingle_matrix(text, k), seed=seed)


def bottom_s_sketch(hashes: np.ndarray, s: int) -> np.ndarray:
    """Bottom-s of the hash multiset in uint64 order, ascending; dups kept.

    Zero sentinels are skipped (/root/reference/src/rkmh.cpp:1233-1235).
    Uses O(n) partition + sort of the surviving s values.
    """
    h = hashes[hashes != 0]
    if h.size > s:
        h = np.partition(h, s - 1)[:s]
    return np.sort(h)


def sketch_text(text: str, k: int, s: int, seed: int = 42) -> np.ndarray:
    """text → sorted bottom-s sketch as int64 (bit-cast for Spark storage)."""
    return bottom_s_sketch(shingle_hashes(text, k, seed), s).view(np.int64)


def multiset_intersection_size(a: np.ndarray, b: np.ndarray) -> int:
    """|a ∩ b| with multiplicity — rkmh hash_intersection_size parity.

    The reference merge-counts two sorted arrays counting duplicate matches
    (call sites /root/reference/src/rkmh.cpp:869,922; SURVEY.md §7.4 risk 1).
    Computed as sum over distinct values of min(count_a, count_b). Inputs may
    be int64 bit-cast sketches; comparison is value-equality so signedness
    does not matter.
    """
    if a.size == 0 or b.size == 0:
        return 0
    va, ca = np.unique(a, return_counts=True)
    vb, cb = np.unique(b, return_counts=True)
    ia = np.isin(va, vb, assume_unique=True)
    if not ia.any():
        return 0
    ib = np.isin(vb, va, assume_unique=True)
    return int(np.minimum(ca[ia], cb[ib]).sum())
