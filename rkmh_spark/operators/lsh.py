"""Stage 2 — LSH banding + candidate pair generation (SURVEY.md §7.2 M2).

The reference compares every read against every reference sketch with a
broadcast nested-loop theta-join (/root/reference/src/rkmh.cpp:867-870).
That is O(n²) and cannot survive web scale, so this is the one place the
Spark design intentionally diverges in MECHANISM (not result, SURVEY.md
§2.4): signatures are banded (b bands × r rows), equal bands collide in a
bucket, and only intra-bucket pairs go to exact verification. At equal
config the verified pairs must reproduce the reference's exhaustive
acceptance with recall ≥ 0.99.

Skew ("salted explode-groupBy", north_rule): Zipfian shingles make hot
buckets whose naive self-join is O(sz²) in ONE task. Defenses, in order:
1. the doc-frequency hot-shingle filter upstream (the reference's own
   answer, ``-I`` /root/reference/src/rkmh.cpp:835-836);
2. a bucket-size census; buckets over ``bucket_cap`` get a deterministic
   salt shard per member and pair generation runs as a sharded triangle
   join — the same pair set, spread over ~(sz/cap)² tasks;
3. AQE skew-join splitting for residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rkmh_spark.config import DedupConfig

_BUCKET_KEY = ["band_id", "band_hash"]


def bucket_census(
    members: DataFrame, keys: list[str], min_sz: int = 2
) -> DataFrame:
    """members + per-key ``sz`` column, keys with < ``min_sz`` members
    dropped — the groupBy + join-back spelling, NOT a count window.

    ``count(*) over (partition by key)`` ships every row of a hot key to
    ONE WindowExec task and buffers it — a one-reducer spill bomb on a
    content-derived key at web scale (the span_dedup.py argument, r5;
    systemic fix r6 per VERDICT #1). groupBy partial-aggregates map-side
    (the reducer sees one row per map task per key) and the join back
    replicates the single count row per key — the shape AQE's skew-join
    split handles. Cost: one extra exchange of (key, sz) rows; the
    members relation feeds two plan branches, so callers persist it (or
    its source) exactly as they already did for the window spelling.
    """
    counts = (
        members.groupBy(*keys)
        .agg(F.count("*").alias("sz"))
        .where(F.col("sz") >= min_sz)
    )
    return members.join(counts, keys)


def band_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures → (url, band_id, band_hash).

    Band i = minhash[i*r : (i+1)*r] over the K independent minhash values;
    64-bit xxhash of the row values (32-bit F.hash would collide
    catastrophically at 10^12 docs × b bands). Documents with no shingles
    have an empty minhash vector and produce no bands — the LSH analog of
    the depth filter F1.
    """
    b, r = cfg.num_bands, cfg.band_rows
    bands = F.array(*[F.slice("minhash", i * r + 1, r) for i in range(b)])
    return (
        signatures.select("url", F.posexplode(bands).alias("band_id", "band"))
        .where(F.size("band") == r)
        .select("url", "band_id", F.xxhash64("band").alias("band_hash"))
    )


def candidate_pairs(
    buckets: DataFrame,
    cfg: DedupConfig,
    materialize: bool = True,
    cleanup: list | None = None,
) -> DataFrame:
    """buckets → distinct (url_a, url_b) with url_a < url_b.

    Census first: size-1 buckets are pruned before any join (most buckets,
    at web scale); 2..cap buckets take the plain self-equi-join; > cap
    buckets take the salted triangle join.

    ``materialize=True`` (default): the pair set is localCheckpointed
    eagerly and the intermediate ``sized`` census relation is unpersisted
    before returning — the persist is needed because both pair branches
    read it, but leaving it cached leaked one relation per call in the
    streaming loop (ADVICE r1). The returned DataFrame is already
    computed, lineage-free, and safe to reuse across plan branches.

    ``materialize=False``: single-consumer callers (the batch dedup
    pipeline consumes candidates exactly once, in verify) skip the eager
    checkpoint — measured 2× the candidate-stage wall at sf0.1 — and take
    the ``sized`` persist handle via ``cleanup`` (a list the caller
    unpersists after its own action materializes the chain).
    """
    # bucket sizes via groupBy + join back (bucket_census): one more
    # exchange than the r5 window spelling, but no single-task buffering
    # of a hot band's whole membership (VERDICT r5 #1 — the window census
    # was the flagship's one scale-killer-class caveat). The sized
    # relation is persisted because both pair branches read it.
    sized = bucket_census(buckets, _BUCKET_KEY).persist()

    normal = sized.where(F.col("sz") <= cfg.bucket_cap).drop("sz")
    a, b = normal.alias("a"), normal.alias("b")
    normal_pairs = (
        a.join(b, _BUCKET_KEY)
        .where(F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
    )

    hot = sized.where(F.col("sz") > cfg.bucket_cap)
    hot_pairs = _salted_triangle_pairs(hot, cfg.bucket_cap)

    pairs = normal_pairs.unionByName(hot_pairs).distinct()
    if materialize:
        try:
            pairs = pairs.localCheckpoint(eager=True)
        finally:
            sized.unpersist()
    elif cleanup is not None:
        cleanup.append(sized)
    return pairs


def _salted_triangle_pairs(
    hot: DataFrame,
    cap: int,
    keys: list[str] | None = None,
    node_col: str = "url",
    out_cols: tuple[str, str] = ("url_a", "url_b"),
) -> DataFrame:
    """Cover all intra-bucket pairs of hot buckets without one giant task.

    Each member gets shard = xxhash64(url) mod m (m = ceil(sz/cap),
    deterministic, no window). For every unordered shard pair (i ≤ j),
    members of shard i meet members of shard j: the left relation
    replicates each member to keys (i=shard, j ∈ [shard, m)), the right to
    keys (i ∈ [0, shard], j=shard); the equi-join on (bucket, i, j) then
    emits each member pair exactly once per bucket.

    ``keys``: the bucket-key columns (default: LSH band key). The
    containment anchor pass reuses this with keys=["anchor"].
    """
    if keys is None:
        keys = _BUCKET_KEY
    node = node_col
    hot = hot.withColumn(
        "m", F.ceil(F.col("sz") / F.lit(cap)).cast("long")
    ).withColumn("shard", F.pmod(F.xxhash64(node), F.col("m")))

    left = hot.select(
        *keys,
        F.col(node),
        F.col("shard").alias("i"),
        F.explode(F.sequence(F.col("shard"), F.col("m") - 1)).alias("j"),
    )
    right = hot.select(
        *keys,
        F.col(node),
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("shard"))).alias("i"),
        F.col("shard").alias("j"),
    )
    # NB: cannot filter a.node < b.node here — a pair whose smaller node
    # sits in the HIGHER shard only ever joins in the (bigger, smaller)
    # orientation (left side carries shard i, right side shard j, i <= j).
    # Normalize with least/greatest instead; callers dedup.
    return (
        left.alias("a")
        .join(right.alias("b"), keys + ["i", "j"])
        .where(F.col(f"a.{node}") != F.col(f"b.{node}"))
        .select(
            F.least(F.col(f"a.{node}"), F.col(f"b.{node}")).alias(out_cols[0]),
            F.greatest(F.col(f"a.{node}"), F.col(f"b.{node}")).alias(out_cols[1]),
        )
    )
