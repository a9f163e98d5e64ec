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


def _occ_ranks(pair_ids: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Occurrence index within runs of equal (pair, value).

    Sketches are sorted (u64 order) so equal values are adjacent within a
    pair; the k-th duplicate gets rank k, which turns multiset intersection
    into set intersection on (pair, value, rank) triples.
    """
    n = values.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = (pair_ids[1:] != pair_ids[:-1]) | (values[1:] != values[:-1])
    starts = np.flatnonzero(new)
    reps = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, reps)


_TRIPLE = np.dtype([("p", "<i8"), ("v", "<i8"), ("o", "<i8")])


def _flatten(series: pd.Series):
    arrs = [np.asarray(x, dtype=np.int64) for x in series]
    lens = np.fromiter((a.shape[0] for a in arrs), dtype=np.int64, count=len(arrs))
    pair_ids = np.repeat(np.arange(len(arrs), dtype=np.int64), lens)
    vals = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    t = np.empty(vals.shape[0], dtype=_TRIPLE)
    t["p"], t["v"], t["o"] = pair_ids, vals, _occ_ranks(pair_ids, vals)
    return t


@pandas_udf(T.LongType())
def _shared_count(a: pd.Series, b: pd.Series) -> pd.Series:
    """Multiset |a ∩ b| per pair, fully vectorized over the Arrow batch.

    Sketches arrive as int64 bit-casts of u64; equality is bit-equality so
    signedness is irrelevant. The whole batch reduces to ONE structured
    np.intersect1d (C sort+merge) instead of a python loop per pair —
    reference kernel parity (merge-count with multiplicity,
    /root/reference/src/rkmh.cpp:869) at batch speed.
    """
    ta, tb = _flatten(a), _flatten(b)
    inter = np.intersect1d(ta, tb, assume_unique=True)
    counts = np.bincount(inter["p"], minlength=len(a))
    return pd.Series(counts.astype(np.int64))


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
