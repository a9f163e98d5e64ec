"""MurmurHash3_x64_128, vectorized in NumPy.

The reference hashes every k-mer with MurmurHash3_x64_128(seed=42) and keeps
the low 64 bits — recovered from the sketch metadata rkmh serializes
(/root/reference/src/rkmh.cpp:493-497: hashType=MurmurHash3_x64_128,
hashSeed=42, hashBits=64). ``mmh3`` is not available in this environment, so
this module implements the public-domain algorithm (Austin Appleby,
SMHasher) two ways:

- ``murmur3_scalar(data, seed)``: straightforward pure-Python reference,
  used only by tests as ground truth.
- ``murmur3_x64_128_low64(mat, seed)``: vectorized over an (N, L) uint8
  matrix — N equal-length byte strings hashed at once. This is the hot-path
  kernel: all shingles of one document (and of one Arrow batch) have the
  same byte length, so hashing an entire batch is a handful of numpy passes
  with zero per-row Python.

All arithmetic is uint64 with natural mod-2^64 wraparound.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def murmur3_x64_128_low64(mat: np.ndarray, seed: int = 42) -> np.ndarray:
    """Hash each row of an (N, L) uint8 matrix; return (N,) uint64 = low 64 bits.

    Equivalent to ``MurmurHash3_x64_128(row, L, seed)`` h1 output for every
    row, matching mmh3.hash64(row, seed, signed=False)[0].
    """
    if mat.ndim != 2:
        raise ValueError("expected 2-D uint8 matrix of equal-length keys")
    n, length = mat.shape
    if n == 0:
        return np.empty(0, dtype=np.uint64)

    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = np.full(n, seed, dtype=np.uint64)

    nblocks = length // 16
    if nblocks:
        # little-endian uint64 pairs per 16-byte block
        body = np.ascontiguousarray(mat[:, : nblocks * 16])
        blocks = body.view("<u8").reshape(n, nblocks, 2)
        for i in range(nblocks):
            k1 = blocks[:, i, 0].astype(np.uint64, copy=True)
            k2 = blocks[:, i, 1].astype(np.uint64, copy=True)
            k1 *= _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            h1 ^= k1
            h1 = _rotl(h1, 27)
            h1 += h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            h2 ^= k2
            h2 = _rotl(h2, 31)
            h2 += h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)

    tail_len = length & 15
    if tail_len:
        tail = mat[:, nblocks * 16 :].astype(np.uint64)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for i in range(min(tail_len, 8)):
            k1 |= tail[:, i] << np.uint64(8 * i)
        for i in range(8, tail_len):
            k2 |= tail[:, i] << np.uint64(8 * (i - 8))
        if tail_len > 8:
            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            h2 ^= k2
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1 ^= k1

    ln = np.uint64(length)
    h1 ^= ln
    h2 ^= ln
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    # h2 += h1  # high 64 bits — not needed for the low-64 output
    return h1


def murmur3_scalar(data: bytes, seed: int = 42) -> int:
    """Pure-Python MurmurHash3_x64_128, low 64 bits. Test oracle only."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _MASK

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & _MASK
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & _MASK
        k ^= k >> 33
        return k

    length = len(data)
    h1 = h2 = seed & _MASK
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & _MASK
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * c2) & _MASK
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    for i in range(min(len(tail), 8)):
        k1 |= tail[i] << (8 * i)
    for i in range(8, len(tail)):
        k2 |= tail[i] << (8 * (i - 8))
    if len(tail) > 8:
        k2 = (k2 * c2) & _MASK
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & _MASK
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _MASK
    return h1
