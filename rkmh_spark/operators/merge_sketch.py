"""Cluster-representative sketch merge — reference A7 ``merge``
(/root/reference/equiv.hpp:59-111): union many sketches, keep the s
smallest hashes, with per-hash member counts.

Relational spelling (one shuffle, no UDF): explode member sketches →
groupBy(cluster, hash).count → per-cluster bottom-s by UNSIGNED hash
order. Sketches are stored as int64 bit-casts of u64, and i64 sort order
!= u64 sort order (SURVEY.md §7.4 risk 2): unsigned ascending = all
non-negatives ascending, then all negatives ascending, which the sort key
(hash < 0, hash) reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rkmh_spark.config import DedupConfig


def cluster_representative_sketches(
    signatures: DataFrame,
    assignments: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """→ (cluster_id, sketch array<long>, member_counts array<long>).

    sketch = s unsigned-smallest distinct hashes over the cluster's member
    sketches; member_counts[i] = how many member sketches contain
    sketch[i] (the merge-with-counts the reference's min_heap tracks).
    """
    member_hashes = (
        signatures.join(assignments.withColumnRenamed("url", "url"), "url")
        .select("cluster_id", "url", F.explode("sketch").alias("hash"))
    )
    # count distinct MEMBERS per hash (the reference's merge counts raw
    # occurrences, equiv.hpp:59-111; member-distinct is the useful variant
    # when sketches carry duplicate hashes from repeated shingles)
    counted = member_hashes.groupBy("cluster_id", "hash").agg(
        F.count_distinct("url").alias("cnt")
    )
    # bottom-s per cluster as a TWO-LEVEL salted tournament: a giant
    # boilerplate cluster (10^8 members ⇒ up to s·members distinct hashes)
    # would otherwise sort through ONE window partition. Level 1 takes
    # bottom-s within (cluster, hash mod SALT) — 16× smaller partitions,
    # deterministic salt; level 2 takes bottom-s of the ≤16·s survivors.
    # Identical result: the global s smallest all survive their shard.
    u64_order = [F.col("hash") < 0, F.col("hash")]  # unsigned u64 ascending
    salt = F.pmod(F.col("hash"), F.lit(16))
    w1 = Window.partitionBy("cluster_id", salt).orderBy(*u64_order)
    pruned = counted.withColumn("rk1", F.row_number().over(w1)).where(
        F.col("rk1") <= cfg.sketch_size
    )
    w = Window.partitionBy("cluster_id").orderBy(*u64_order)
    topk = pruned.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= cfg.sketch_size
    )
    return topk.groupBy("cluster_id").agg(
        F.array_sort(
            F.collect_list(F.struct((F.col("hash") < 0).alias("neg"), "hash", "cnt"))
        ).alias("_s")
    ).select(
        "cluster_id",
        F.transform("_s", lambda x: x["hash"]).alias("sketch"),
        F.transform("_s", lambda x: x["cnt"]).alias("member_counts"),
    )
