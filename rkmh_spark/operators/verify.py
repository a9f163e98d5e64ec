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


def _occ_ranks(values: np.ndarray) -> np.ndarray:
    """Occurrence index within runs of equal values (input sorted)."""
    n = values.shape[0]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = values[1:] != values[:-1]
    starts = np.flatnonzero(new)
    reps = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, reps)


@pandas_udf(T.LongType())
def _shared_count(a: pd.Series, b: pd.Series) -> pd.Series:
    """Multiset |a ∩ b| per pair — reference merge-count parity
    (/root/reference/src/rkmh.cpp:869) on sorted u64 sketches.

    Per pair: element i of a (the k-th duplicate of its value, k =
    occ_rank) matches iff b holds that value at least k+1 times —
    Σ [occ_rank < count_in_b] = Σ_v min(cnt_a, cnt_b). Two searchsorted
    calls + a run-rank per pair; arrays are ~sketch_size long, so the
    numpy-per-pair overhead beats any batch-flattened structured sort
    (measured 29x vs structured-dtype intersect1d, whose void-record
    comparisons are ~100x slower per element than native sorts).
    """
    out = np.zeros(len(a), dtype=np.int64)
    for i in range(len(a)):
        xa = np.asarray(a.iloc[i], dtype=np.int64).view(np.uint64)
        xb = np.asarray(b.iloc[i], dtype=np.int64).view(np.uint64)
        if xa.size == 0 or xb.size == 0:
            continue
        lo = np.searchsorted(xb, xa, "left")
        hi = np.searchsorted(xb, xa, "right")
        out[i] = int((_occ_ranks(xa) < (hi - lo)).sum())
    return pd.Series(out)


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(url_a, url_b) ⋈ signatures ×2 → verified pairs with shared/est_jaccard.

    Two-stage verify: a JVM-side EXACT-SAFE prefilter, then the multiset
    pandas kernel only on survivors. The LSH candidate set inflates on
    short documents (OPH densification correlation when n_shingles < K
    bins — a small-doc artifact absent at real page sizes), and the
    Python-kernel cost was ~µs × every candidate. The prefilter uses the
    bound   multiset_shared ≤ |set ∩| + min(dup_a, dup_b)
    (each duplicated value in a adds at most its extra multiplicity:
    Σ_v(min(ca,cb)−1) ≤ Σ_v(ca−1) = dup_a, likewise dup_b), so dropping
    pairs whose UPPER BOUND misses the threshold removes only pairs the
    exact kernel would reject — acceptance semantics are bit-identical
    (pinned by the brute-force == NumPy-oracle tests). array_intersect +
    size are whole-stage-codegen expressions; measured ~75% of candidate
    rows never reach Python.
    """
    sig = signatures.select(
        "url",
        "sketch",
        (F.size("sketch") - F.size(F.array_distinct("sketch"))).alias("dups"),
    )
    joined = (
        pairs.join(
            sig.select(
                F.col("url").alias("url_a"),
                F.col("sketch").alias("sketch_a"),
                F.col("dups").alias("dups_a"),
            ),
            "url_a",
        ).join(
            sig.select(
                F.col("url").alias("url_b"),
                F.col("sketch").alias("sketch_b"),
                F.col("dups").alias("dups_b"),
            ),
            "url_b",
        )
    )
    denom = F.least(
        F.lit(cfg.sketch_size), F.size("sketch_a"), F.size("sketch_b")
    )
    upper = F.size(F.array_intersect("sketch_a", "sketch_b")) + F.least(
        "dups_a", "dups_b"
    )
    prefiltered = joined.where(
        (F.size("sketch_a") > 0)
        & (F.size("sketch_b") > 0)
        & (upper >= F.lit(cfg.min_matches))
        & (upper >= F.lit(cfg.jaccard_threshold) * denom)
    )
    scored = (
        prefiltered.withColumn("shared", _shared_count("sketch_a", "sketch_b"))
        .withColumn("denom", denom)
        .withColumn("est_jaccard", F.col("shared") / F.col("denom"))
    )
    return scored.where(
        (F.col("shared") >= cfg.min_matches)
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
