"""Single-node NumPy oracle of the reference dedup loop.

This is the golden-truth yardstick for the Spark pipeline (BASELINE.md:
dup-pair recall >= 0.99). It implements exactly the reference loop —
shingle → murmur3(seed 42) → bottom-s multiset sketch → all-pairs multiset
intersection → threshold → union-find — the way rkmh's exhaustive
classify/stream comparison would accept pairs
(/root/reference/src/rkmh.cpp:845-898, equiv.hpp:324-353), with no LSH
shortcuts. O(n²) on purpose; use only on fixtures.
"""

from __future__ import annotations

import numpy as np

from rkmh_spark.config import DedupConfig
from rkmh_spark.functions.shingles import (
    multiset_intersection_size,
    sketch_text,
)


class UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root rule keeps ids deterministic
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def oracle_sketches(texts: list[str], cfg: DedupConfig) -> list[np.ndarray]:
    return [sketch_text(t, cfg.k, cfg.sketch_size, cfg.hash_seed) for t in texts]


def oracle_sketches_min_occ(texts: list[str], cfg: DedupConfig) -> list[np.ndarray]:
    """F4 (rkmh -M) reference loop: build the global occurrence counter over
    ALL texts, then per text keep sorted hashes whose global count >= M,
    stopping at sketch_size (/root/reference/src/rkmh.cpp:1256-1267)."""
    from collections import Counter

    from rkmh_spark.functions.shingles import shingle_hashes

    assert cfg.min_occ is not None
    all_hashes = [shingle_hashes(t, cfg.k, cfg.hash_seed) for t in texts]
    counter: Counter = Counter()
    for h in all_hashes:
        counter.update(h[h != 0].tolist())
    out = []
    for h in all_hashes:
        h = np.sort(h[h != 0])
        kept = h[np.array([counter[int(x)] >= cfg.min_occ for x in h], dtype=bool)] if h.size else h
        out.append(kept[: cfg.sketch_size].view(np.int64))
    return out


def oracle_pairs(
    texts: list[str], cfg: DedupConfig, sketches: list[np.ndarray] | None = None
) -> set[tuple[int, int]]:
    """All accepted dup pairs (i<j) under the reference acceptance rule:

    est_jaccard = shared / min(s, |sketch_a|, |sketch_b|) >= tau, with the
    depth filter F1 (empty/too-small sketch → never matches,
    /root/reference/src/rkmh.cpp:888,938).
    """
    if sketches is None:
        sketches = oracle_sketches(texts, cfg)
    n = len(texts)
    pairs: set[tuple[int, int]] = set()
    for i in range(n):
        si = sketches[i]
        if si.size == 0:
            continue
        for j in range(i + 1, n):
            sj = sketches[j]
            if sj.size == 0:
                continue
            shared = multiset_intersection_size(si, sj)
            if shared < cfg.min_matches:
                continue
            denom = min(cfg.sketch_size, si.size, sj.size)
            if shared / denom >= cfg.jaccard_threshold:
                pairs.add((i, j))
    return pairs


def oracle_clusters(
    texts: list[str], cfg: DedupConfig, pairs: set[tuple[int, int]] | None = None
) -> list[int]:
    """Connected components over accepted pairs; cluster id = min member idx."""
    if pairs is None:
        pairs = oracle_pairs(texts, cfg)
    uf = UnionFind(len(texts))
    for i, j in pairs:
        uf.union(i, j)
    return [uf.find(i) for i in range(len(texts))]
