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


def shingle_hashes(
    text: str, k: int | tuple[int, ...], seed: int = 42
) -> np.ndarray:
    """(N,) uint64 hash per shingle position (rkmh calc_hashes analog).

    Position-aligned like the reference's hash arrays; the reference writes
    sentinel 0 for invalid k-mers — text has no invalid shingles, but a
    genuine hash value of 0 is still dropped at sketch time for parity.

    ``k`` may be a tuple of sizes: the reference's multi-k mode
    (``-k 12 -k 14``) hashes every k size and CONCATENATES the per-k hash
    arrays into one multiset before sketching
    (/root/reference/src/rkmh.cpp:296-303 — calc_hashes loops kmer sizes
    and appends).
    """
    if isinstance(k, int):
        return murmur3_x64_128_low64(shingle_matrix(text, k), seed=seed)
    parts = [
        murmur3_x64_128_low64(shingle_matrix(text, kk), seed=seed) for kk in k
    ]
    return (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )


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


def sketch_texts_batch(
    texts,
    k: int,
    s: int,
    seed: int = 42,
    drop_hashes: np.ndarray | None = None,
    num_bins: int | None = None,
    max_chunk_shingles: int = 1 << 17,
):
    """Sketch a whole Arrow batch of texts with ONE murmur pass.

    Stacks every document's shingle matrix into a single (total_shingles, k)
    uint8 matrix, hashes it in one vectorized call (this is the hot kernel —
    the analog of the reference's OpenMP hashing loop at
    /root/reference/src/rkmh.cpp:845-860), then takes per-document bottom-s.

    ``drop_hashes``: optional sorted uint64 array of banned hashes (the
    hot-shingle / max-doc-freq filter, rkmh ``-I``
    /root/reference/src/rkmh.cpp:835-836) removed BEFORE bottom-s selection,
    matching minhashes_frequency_filter semantics.

    ``num_bins``: when given, also returns per-doc K-wide OPH minhash
    vectors for LSH banding (computed from the SAME sorted hash array the
    bottom-s sketch uses — one sort serves both signatures).

    The murmur pass runs over sub-chunks capped at ``max_chunk_shingles``
    regardless of how many documents Arrow delivered: vstacking a whole
    2048-doc batch of multi-KB pages produced ~GB-scale numpy temporaries
    whose allocation/page-fault churn made the stage 7x slower than the
    same work in cache-sized chunks (measured at 48k x 4KB docs).

    ``k`` may be a tuple (reference multi-k, rkmh.cpp:296-303): per-k hash
    arrays are concatenated per document before the sort/bottom-s. The
    multi-k path hashes per document (not per mega-chunk) — k widths
    differ so the matrices cannot vstack; multi-k is a config corner, the
    single-k fast path is untouched.

    Returns (sketches: list[int64 array], minhashes: list[int64]|None,
    n_shingles: int64 array).
    """
    empty = np.empty(0, dtype=np.int64)
    n = len(texts)
    counts = np.empty(n, dtype=np.int64)
    sketches: list = [empty] * n
    minhashes = [empty] * n if num_bins is not None else None

    if not isinstance(k, int):
        for i, t in enumerate(texts):
            h = shingle_hashes(t if t is not None else "", k, seed)
            counts[i] = h.size
            if drop_hashes is not None and drop_hashes.size and h.size:
                h = h[~np.isin(h, drop_hashes)]
            hs = np.sort(h[h != 0])
            sketches[i] = hs[:s].view(np.int64)
            if minhashes is not None:
                minhashes[i] = oph_minhash(hs, num_bins)
        return sketches, minhashes, counts

    chunk_mats: list = []
    chunk_docs: list = []  # (doc_index, n_shingles)
    chunk_total = 0

    def flush() -> None:
        nonlocal chunk_mats, chunk_docs, chunk_total
        if not chunk_mats:
            return
        all_hashes = murmur3_x64_128_low64(np.vstack(chunk_mats), seed=seed)
        pos = 0
        for i, cnt in chunk_docs:
            h = all_hashes[pos : pos + cnt]
            pos += cnt
            if drop_hashes is not None and drop_hashes.size and h.size:
                h = h[~np.isin(h, drop_hashes)]
            hs = np.sort(h[h != 0])
            sketches[i] = hs[:s].view(np.int64)
            if minhashes is not None:
                minhashes[i] = oph_minhash(hs, num_bins)
        chunk_mats, chunk_docs, chunk_total = [], [], 0

    for i, t in enumerate(texts):
        m = shingle_matrix(t if t is not None else "", k)
        counts[i] = m.shape[0]
        if m.shape[0]:
            chunk_mats.append(m)
            chunk_docs.append((i, m.shape[0]))
            chunk_total += m.shape[0]
            if chunk_total >= max_chunk_shingles:
                flush()
    flush()
    return sketches, minhashes, counts


_DENSIFY_C = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_DENSIFY_A = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 finalizer constant


def oph_minhash(sorted_hashes: np.ndarray, num_bins: int) -> np.ndarray:
    """One-Permutation-Hashing minhash vector (K bins) from SORTED hashes.

    Classic K-permutation minhash costs O(n*K) mixing per document — at
    K=144 that is ~100x the murmur cost and left the signature stage
    memory-bandwidth-bound. OPH (Li/Owen/Zhang 2012) hashes each shingle
    ONCE: bin = h mod K, signature[bin] = min h in bin — O(n) after the
    sort the bottom-s sketch needs anyway.

    Empty bins take OPTIMAL densification (Shrivastava, ICML'17 — public
    algorithm): each empty bin borrows from an independent hash-random
    sequence of bins, retrying until it lands on a filled one. r1 used
    ROTATION densification (next-filled-bin + distance offset), which
    fills CONSECUTIVE empty bins from the SAME source minimum; since
    bands are consecutive r-bin slices, a band of densified bins collided
    with probability ≈ J instead of J^r, and short documents
    (n_shingles < K) exploded the candidate set — measured 408,893
    candidate pairs for 5,000 sf0.1 docs vs 6,635 after the switch (62×),
    identical capture theory. Deterministic: the retry sequence is a
    fixed hash of (bin, attempt).

    Input must be ascending uint64 with zero-sentinels removed; returns
    (K,) int64 bit-cast. Empty input → empty vector (depth-filter F1).
    """
    if sorted_hashes.size == 0:
        return np.empty(0, dtype=np.int64)
    k = np.uint64(num_bins)
    bins = (sorted_hashes % k).astype(np.int64)
    present, first_idx = np.unique(bins, return_index=True)
    vals = np.zeros(num_bins, dtype=np.uint64)
    filled = np.zeros(num_bins, dtype=bool)
    vals[present] = sorted_hashes[first_idx]  # ascending → first = min
    filled[present] = True
    if present.size < num_bins:
        src = np.full(num_bins, -1, dtype=np.int64)
        pending = np.flatnonzero(~filled)
        attempt = np.uint64(1)
        with np.errstate(over="ignore"):  # uint64 wraparound is the mixer
            while pending.size:
                j = (
                    (pending.astype(np.uint64) * _DENSIFY_A + attempt * _DENSIFY_C)
                    >> np.uint64(33)
                ) % k
                j = j.astype(np.int64)
                hit = filled[j]
                src[pending[hit]] = j[hit]
                pending = pending[~hit]
                attempt += np.uint64(1)
        empty_pos = ~filled
        vals[empty_pos] = vals[src[empty_pos]]
    return vals.view(np.int64)


def minhash_permutation_params(num_perms: int, seed: int = 42):
    """Deterministic (a, b) coefficients for K bijective u64 mixers.

    π_i(x) = a_i * x + b_i (mod 2^64) with a_i odd is a bijection of u64
    space, so min over a document's shingle-hash set is a classic MinHash
    value. The bottom-s sketch (reference parity) is NOT suitable for
    banding — a single differing small hash shifts every later sketch
    position, so band collision probability collapses; K independent
    minima restore the standard 1-(1-j^r)^b capture curve.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_vector(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(K,) int64 minhash vector of one document's shingle hashes.

    Empty input → empty vector (the doc can never collide in any band —
    the LSH analog of the reference depth filter F1).
    """
    h = hashes[hashes != 0]
    if h.size == 0:
        return np.empty(0, dtype=np.int64)
    # Chunk the (n, K) mixed matrix so the intermediate stays cache-resident
    # instead of streaming n*K*8 bytes through DRAM per document — the
    # unchunked version left the signature stage memory-bandwidth-bound
    # (no speedup 8→32 cores).
    chunk = max(1, 65536 // max(1, a.shape[0]))
    mins = np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    for i in range(0, h.shape[0], chunk):
        mixed = h[i : i + chunk, None] * a[None, :] + b[None, :]
        np.minimum(mins, mixed.min(axis=0), out=mins)
    return mins.view(np.int64)


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
