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
    panel_pages: DataFrame,
    cfg: DedupConfig,
    group_col: str = "lang",
    panel_hashes: DataFrame | None = None,
) -> DataFrame:
    """→ (hash, group) — hashes unique to exactly one group of the panel.

    ``panel_hashes``: optional precomputed (url, hash) relation — the
    two-tier caller derives BOTH granularity tables from one shingle
    pass over the panel instead of re-hashing it per tier.
    """
    if panel_hashes is None:
        panel_hashes = hash_dump(panel_pages.select("url", "text"), cfg)
    gh = (
        panel_hashes.join(panel_pages.select("url", group_col), "url")
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


def _ranked_tier_lists(
    qhashes: DataFrame,
    uniq: DataFrame,
    panel_groups: DataFrame,
    n_hashes: DataFrame,
    prefix: str,
) -> DataFrame:
    """Per query url: the reference's ranked per-tier output
    (rkmh.cpp:2688-2713) as two canonical strings.

    - ``{prefix}_ranked``:  "group:hits/n_hashes;..." desc by hits, asc by
      group name — the reference's ``name:sim;`` list, with sim printed as
      the exact rational hits/hashnum instead of a formatted double (the
      double is hits/hashnum in mkmh's sort_by_similarity, un-vendored in
      the reference tree; the rational is lossless and avoids cross-engine
      float formatting in the oracle gate).
    - ``{prefix}_hits``: "12;3;0;" raw intersections in the SAME order —
      the reference's ``lin_intersections`` column, verbatim semantics.

    Every PANEL group appears (zero-hit groups rank last as "g:0/…"), like
    the reference iterating all lineage tables. panel_groups is tiny
    (distinct group values) → broadcast cross join, same resident-panel
    mechanism as classify (rkmh.cpp:867-870).
    """
    urls = n_hashes.select("url")
    hits = (
        qhashes.join(uniq, "hash")
        .groupBy("url", "group")
        .agg(F.count("*").alias("h"))
    )
    full = (
        urls.crossJoin(F.broadcast(panel_groups))
        .join(hits, ["url", "group"], "left")
        .select("url", "group", F.coalesce("h", F.lit(0)).alias("h"))
    )
    # order inside one collected array: array_sort on (−hits, group) structs
    # is deterministic and avoids a per-group window shuffle
    arr = full.groupBy("url").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("h")).alias("nh"),
                    F.col("group").alias("g"),
                    F.col("h").alias("h"),
                )
            )
        ).alias("arr")
    )
    joined = arr.join(n_hashes, "url")
    return joined.select(
        "url",
        F.concat(
            F.array_join(
                F.transform(
                    "arr",
                    lambda x: F.concat_ws(
                        "",
                        x["g"],
                        F.lit(":"),
                        x["h"].cast("string"),
                        F.lit("/"),
                        F.col("n_hashes").cast("string"),
                    ),
                ),
                ";",
            ),
            F.lit(";"),
        ).alias(f"{prefix}_ranked"),
        F.concat(
            F.array_join(
                F.transform("arr", lambda x: x["h"].cast("string")), ";"
            ),
            F.lit(";"),
        ).alias(f"{prefix}_ranked_hits"),
    )


def two_tier_classify(
    query_pages: DataFrame,
    panel_pages: DataFrame,
    cfg: DedupConfig,
    group_col: str = "lang",
    subgroup_col: str | None = None,
) -> DataFrame:
    """→ (url, best_ref, shared, fail_*, best_group, group_hits,
    n_hashes, group_ranked, group_ranked_hits[, subgroup_* when
    ``subgroup_col`` is given]).

    best_ref/shared: tier-1 sketch argmax vs individual panel refs.
    best_group/group_hits: tier-2 argmax of discriminative-hash hits
    (min-group tiebreak, deterministic).
    group_ranked/group_ranked_hits: the reference's FULL ranked
    ``lineage:sim;`` + raw-intersection lists (rkmh.cpp:2682-2715), one
    entry per panel group incl. zero-hit groups. ``subgroup_col`` adds the
    sublineage-analog pair over the finer grouping (the reference's
    key[0] vs key[0:2] nesting — e.g. lang vs lang-source).
    """
    qsigs = compute_signatures(query_pages, cfg)
    psigs = compute_signatures(panel_pages, cfg)
    tier1 = classify_pages(qsigs, psigs, cfg, exhaustive=True)

    # ONE shingle pass over the panel feeds both granularity tables
    phashes = hash_dump(panel_pages.select("url", "text"), cfg)
    if subgroup_col is not None:
        phashes = phashes.localCheckpoint(eager=True)
    uniq = discriminative_hash_tables(
        panel_pages, cfg, group_col, panel_hashes=phashes
    )
    # qhashes feeds 4+ plan branches (argmax hits, hashnum, both ranked
    # tiers) — eager checkpoint so the mapInPandas shingle pass runs once
    qhashes = hash_dump(query_pages.select("url", "text"), cfg).localCheckpoint(
        eager=True
    )
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
    # hashnum in the reference's "max_shared/hashnum" (rkmh.cpp:2683):
    # the read's own hash count after filters. Universe = EVERY query url
    # (not just urls with ≥1 shingle): a doc shorter than k yields no
    # hash_dump rows but must still emit the full zero-hit ranked list
    # ("g:0/0;..."), matching the reference iterating all lineage tables
    # for every read (ADVICE r3).
    n_hashes = (
        query_pages.select("url")
        .join(
            qhashes.groupBy("url").agg(F.count("*").alias("nh")),
            "url",
            "left",
        )
        .select("url", F.coalesce("nh", F.lit(0)).alias("n_hashes"))
    )

    ranked_g = _ranked_tier_lists(
        qhashes,
        uniq,
        panel_pages.select(F.col(group_col).alias("group")).distinct(),
        n_hashes,
        "group",
    )
    out = (
        tier1.join(best_group, "url", "left")
        .join(n_hashes, "url", "left")
        .join(ranked_g, "url", "left")
    )
    sel = [
        F.col("url"),
        F.col("best_ref"),
        F.col("shared"),
        F.col("fail_depth"),
        F.col("fail_matches"),
        F.col("fail_diff"),
        F.col("best_group"),
        F.coalesce("group_hits", F.lit(0)).alias("group_hits"),
        F.coalesce("n_hashes", F.lit(0)).alias("n_hashes"),
        F.coalesce("group_ranked", F.lit("")).alias("group_ranked"),
        F.coalesce("group_ranked_hits", F.lit("")).alias("group_ranked_hits"),
    ]
    if subgroup_col is not None:
        uniq_sub = discriminative_hash_tables(
            panel_pages, cfg, subgroup_col, panel_hashes=phashes
        )
        ranked_s = _ranked_tier_lists(
            qhashes,
            uniq_sub,
            panel_pages.select(F.col(subgroup_col).alias("group")).distinct(),
            n_hashes,
            "subgroup",
        )
        out = out.join(ranked_s, "url", "left")
        sel += [
            F.coalesce("subgroup_ranked", F.lit("")).alias("subgroup_ranked"),
            F.coalesce("subgroup_ranked_hits", F.lit("")).alias(
                "subgroup_ranked_hits"
            ),
        ]
    return out.select(*sel)
