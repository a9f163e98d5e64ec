"""Two-tier classification — rkmh `hpv16` lifecycle (SURVEY.md §3.2,
/root/reference/src/rkmh.cpp:2366-2718).

Tier 1 (coarse): argmax against per-reference sketches — classify_pages.
Tier 2 (fine): DISCRIMINATIVE hash tables — for each group (the
reference's lineage = key[0], sublineage = key[0:2], rkmh.cpp:2561,2616),
the shingle hashes unique to that group after a multi-way set difference
against every other group (rkmh.cpp:2568-2598). The reference runs an
O(G²) std::set_difference loop; relationally one shuffle does all groups
at once: distinct (group, hash) → groupBy(hash) → keep hashes seen in
exactly one group (SURVEY.md J6).

Queries are then scored per group by how many of their OWN hashes hit the
group's unique table (rkmh.cpp:2688-2701 ranked similarity), using the
full hash relation, not the sketch — matching the reference, which
compares full read hash arrays at this tier (rkmh.cpp:2656-2664).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rkmh_spark.config import DedupConfig
from rkmh_spark.functions.sinks import hash_dump
from rkmh_spark.operators.classify import classify_pages
from rkmh_spark.operators.signatures import compute_signatures


def discriminative_hash_tables(
    panel_pages: DataFrame, cfg: DedupConfig, group_col: str = "lang"
) -> DataFrame:
    """→ (hash, group) — hashes unique to exactly one group of the panel."""
    gh = (
        hash_dump(panel_pages.select("url", "text"), cfg)
        .join(panel_pages.select("url", group_col), "url")
        .select(F.col(group_col).alias("group"), "hash")
        .distinct()
    )
    return (
        gh.groupBy("hash")
        .agg(
            F.count_distinct("group").alias("n_groups"),
            F.min("group").alias("group"),
        )
        .where(F.col("n_groups") == 1)
        .select("hash", "group")
    )


def two_tier_classify(
    query_pages: DataFrame,
    panel_pages: DataFrame,
    cfg: DedupConfig,
    group_col: str = "lang",
) -> DataFrame:
    """→ (url, best_ref, shared, fail_*, best_group, group_hits).

    best_ref/shared: tier-1 sketch argmax vs individual panel refs.
    best_group/group_hits: tier-2 argmax of discriminative-hash hits
    (min-group tiebreak, deterministic).
    """
    qsigs = compute_signatures(query_pages, cfg)
    psigs = compute_signatures(panel_pages, cfg)
    tier1 = classify_pages(qsigs, psigs, cfg, exhaustive=True)

    uniq = discriminative_hash_tables(panel_pages, cfg, group_col)
    qhashes = hash_dump(query_pages.select("url", "text"), cfg)
    hits = (
        qhashes.join(uniq, "hash")
        .groupBy("url", "group")
        .agg(F.count("*").alias("group_hits"))
    )
    w = Window.partitionBy("url").orderBy(F.desc("group_hits"), F.asc("group"))
    best_group = (
        hits.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("url", F.col("group").alias("best_group"), "group_hits")
    )
    return tier1.join(best_group, "url", "left").select(
        "url",
        "best_ref",
        "shared",
        "fail_depth",
        "fail_matches",
        "fail_diff",
        "best_group",
        F.coalesce("group_hits", F.lit(0)).alias("group_hits"),
    )
