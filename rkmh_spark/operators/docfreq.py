"""Global shingle document-frequency + hot-shingle (boilerplate) table.

Reference analogs: global k-mer counting `rkmh count`
(/root/reference/src/rkmh.cpp:2268-2360) and the per-hash distinct-sample
count feeding ``-I max_samples`` (/root/reference/src/rkmh.cpp:340-358,
404-421). The reference serializes this through an ``omp critical`` shared
map or a lossy fixed-size HASHTCounter; here it is an exact distributed
hash aggregation — partial (map-side) combine then a single shuffle on the
hash key, which Catalyst plans automatically for groupBy().count().

The python worker emits each document's DISTINCT hashes only (A6
semantics: count documents containing the shingle, not occurrences), so
the exploded relation is bounded by sum(distinct shingles per doc), and
the groupBy sees pre-deduplicated input.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from rkmh_spark.config import DedupConfig
from rkmh_spark.functions.shingles import shingle_hashes


def shingle_doc_frequency(
    pages: DataFrame, cfg: DedupConfig, text_col: str = "text"
) -> DataFrame:
    """→ DataFrame(hash: long, df: long) — #documents containing each shingle."""
    k, seed = cfg.k, cfg.hash_seed

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chunks = []
            for t in pdf[text_col].tolist():
                h = shingle_hashes(t if t is not None else "", k, seed)
                if h.size:
                    chunks.append(np.unique(h))  # distinct within the doc
            out = (
                np.concatenate(chunks).view(np.int64)
                if chunks
                else np.empty(0, dtype=np.int64)
            )
            yield pd.DataFrame({"hash": out})

    exploded = pages.select(text_col).mapInPandas(
        kernel, schema=T.StructType([T.StructField("hash", T.LongType(), False)])
    )
    return exploded.groupBy("hash").agg(F.count("*").alias("df"))


def hash_depth_table(
    pages: DataFrame, cfg: DedupConfig, text_col: str = "text"
) -> DataFrame:
    """→ DataFrame(hash: long, depth: long) — TOTAL occurrences per shingle.

    Reference parity: the ``-M``/``call`` global counter counts every hash
    occurrence across all reads, with multiplicity (read_hash_counter /
    read_hash_to_depth, /root/reference/src/rkmh.cpp:1256-1267,1784), unlike
    the distinct-document ``df`` of shingle_doc_frequency. The kernel emits
    per-doc (hash, cnt) pairs — the exploded relation is bounded by
    Σ distinct shingles/doc, and the shuffle carries counts, not rows.
    """
    k, seed = cfg.k, cfg.hash_seed

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs, cs = [], []
            for t in pdf[text_col].tolist():
                h = shingle_hashes(t if t is not None else "", k, seed)
                h = h[h != 0]
                if h.size:
                    vals, cnts = np.unique(h, return_counts=True)
                    hs.append(vals.view(np.int64))
                    cs.append(cnts.astype(np.int64))
            if hs:
                yield pd.DataFrame(
                    {"hash": np.concatenate(hs), "cnt": np.concatenate(cs)}
                )
            else:
                yield pd.DataFrame(
                    {
                        "hash": np.empty(0, dtype=np.int64),
                        "cnt": np.empty(0, dtype=np.int64),
                    }
                )

    exploded = pages.select(text_col).mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("hash", T.LongType(), False),
                T.StructField("cnt", T.LongType(), False),
            ]
        ),
    )
    return exploded.groupBy("hash").agg(F.sum("cnt").alias("depth"))


class CountMinSketchNP:
    """A5 — the reference's lossy fixed-memory counter (HASHTCounter,
    /root/reference/src/rkmh.cpp:340-421, README.md:67-69 "~80 MB,
    collision-prone") as a proper Count-Min Sketch (Cormode/Muthukrishnan,
    public algorithm): depth×width int64 table, per-row universal hashing,
    estimate = min over rows. One-sided like the reference's collisions:
    estimates only ever OVER-count, so a keep-if-count≥M filter keeps a
    superset — the same failure direction the reference documents.

    Vectorized NumPy throughout; the table is a few hundred KB and
    BROADCASTS into the signature kernel, so the -M filter runs with zero
    shuffle — the Spark reshaping of the reference holding its counter
    resident in shared memory (rkmh.cpp:1256: counter lookup per hash).
    """

    def __init__(self, width: int = 1 << 14, depth: int = 4, seed: int = 42):
        self.width = width
        self.depth = depth
        rng = np.random.default_rng(seed)
        self.a = (
            rng.integers(1, 2**62, size=depth, dtype=np.uint64) * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.integers(0, 2**63, size=depth, dtype=np.uint64)
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _idx(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) table columns for uint64 inputs."""
        mixed = hashes[None, :] * self.a[:, None] + self.b[:, None]
        return ((mixed >> np.uint64(33)) % np.uint64(self.width)).astype(
            np.int64
        )

    def update(self, hashes: np.ndarray) -> None:
        idx = self._idx(hashes.astype(np.uint64))
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], 1)

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        """(n,) over-estimates of each hash's total count."""
        if hashes.size == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._idx(hashes.astype(np.uint64))
        ests = np.stack(
            [self.table[d][idx[d]] for d in range(self.depth)], axis=0
        )
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketchNP") -> "CountMinSketchNP":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self


def approx_hash_depth_cms(
    pages: DataFrame,
    cfg: DedupConfig,
    width: int = 1 << 14,
    depth: int = 4,
    text_col: str = "text",
) -> CountMinSketchNP:
    """Build the global CMS distributed: one local table per partition
    (mapInPandas emits the flattened int64 table as ONE row), tables
    summed on the driver — a fixed depth×width×8-byte transfer per
    partition regardless of corpus size. No shuffle at all."""
    k, seed = cfg.k, cfg.hash_seed

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cms = CountMinSketchNP(width, depth, seed)
        for pdf in batches:
            for t in pdf[text_col].tolist():
                h = shingle_hashes(t if t is not None else "", k, seed)
                h = h[h != 0]
                if h.size:
                    cms.update(h)
        yield pd.DataFrame({"table": [cms.table.ravel().tolist()]})

    parts = pages.select(text_col).mapInPandas(
        kernel,
        schema=T.StructType(
            [T.StructField("table", T.ArrayType(T.LongType()), False)]
        ),
    )
    out = CountMinSketchNP(width, depth, cfg.hash_seed)
    for r in parts.collect():
        out.table += np.array(r["table"], dtype=np.int64).reshape(depth, width)
    return out


def hot_shingles(doc_freq: DataFrame, max_doc_freq: int) -> np.ndarray:
    """Hashes present in more than ``max_doc_freq`` documents (rkmh -I analog).

    Collected to the driver: the hot set is small by construction (web
    boilerplate), and it is re-broadcast into the signature kernel the same
    way rkmh keeps its counter resident (/root/reference/src/rkmh.cpp:835-836).
    """
    rows = (
        doc_freq.where(F.col("df") > max_doc_freq).select("hash").collect()
    )
    return np.array([r["hash"] for r in rows], dtype=np.int64)
