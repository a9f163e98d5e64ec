"""Stage 3 — exact sketch-Jaccard verification of candidate pairs.

Reference kernel: hash_intersection_size, a merge-count over two sorted
u64 sketches with multiplicity (/root/reference/src/rkmh.cpp:869,922;
equiv.hpp:308). ``F.array_intersect`` is set-semantics, so multiset parity
lives in a vectorized pandas UDF (SURVEY.md §7.4 risk 1).

Acceptance (reference filters F1/F2 + threshold):
  - both sketches non-empty (depth filter, rkmh.cpp:888)
  - shared >= min_matches (match filter, rkmh.cpp:889)
  - est_jaccard = shared / min(s, |a|, |b|) >= jaccard_threshold
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from rkmh_spark.config import DedupConfig


@pandas_udf(T.LongType())
def _shared_count(a: pd.Series, b: pd.Series) -> pd.Series:
    """Multiset |a ∩ b| per pair. Arrow-batched; per-pair work is numpy.

    Sketches arrive as int64 bit-casts of u64; equality is bit-equality so
    signedness is irrelevant here.
    """
    out = np.empty(len(a), dtype=np.int64)
    for i in range(len(a)):
        xa, xb = np.asarray(a.iloc[i]), np.asarray(b.iloc[i])
        if xa.size == 0 or xb.size == 0:
            out[i] = 0
            continue
        va, ca = np.unique(xa, return_counts=True)
        vb, cb = np.unique(xb, return_counts=True)
        ia = np.isin(va, vb, assume_unique=True)
        if not ia.any():
            out[i] = 0
        else:
            ib = np.isin(vb, va, assume_unique=True)
            out[i] = np.minimum(ca[ia], cb[ib]).sum()
    return pd.Series(out)


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(url_a, url_b) ⋈ signatures ×2 → verified pairs with shared/est_jaccard."""
    sig = signatures.select("url", "sketch")
    joined = (
        pairs.join(
            sig.select(F.col("url").alias("url_a"), F.col("sketch").alias("sketch_a")),
            "url_a",
        ).join(
            sig.select(F.col("url").alias("url_b"), F.col("sketch").alias("sketch_b")),
            "url_b",
        )
    )
    scored = (
        joined.withColumn("shared", _shared_count("sketch_a", "sketch_b"))
        .withColumn(
            "denom",
            F.least(
                F.lit(cfg.sketch_size), F.size("sketch_a"), F.size("sketch_b")
            ),
        )
        .withColumn("est_jaccard", F.col("shared") / F.col("denom"))
    )
    return scored.where(
        (F.size("sketch_a") > 0)
        & (F.size("sketch_b") > 0)
        & (F.col("shared") >= cfg.min_matches)
        & (F.col("est_jaccard") >= cfg.jaccard_threshold)
    ).select("url_a", "url_b", "shared", "est_jaccard")


def brute_force_pairs(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """All-pairs verification — the reference's exhaustive comparison
    (/root/reference/src/rkmh.cpp:867-870) as a self-join. O(n²): fixtures
    and recall oracles only; the LSH path is the scale path.
    """
    s = signatures.select("url")
    pairs = (
        s.alias("a")
        .join(s.alias("b"), F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
    )
    return verify_pairs(pairs, signatures, cfg)
