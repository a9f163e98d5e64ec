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
