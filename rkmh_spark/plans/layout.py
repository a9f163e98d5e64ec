"""Physical table layout for the pages/signatures tables at 10^12-doc scale.

north_rule: "explicit range/hash partitioning". The Iceberg spelling is

    PARTITIONED BY (bucket(N, url), days(warc_ts))

(SURVEY.md §4 "partition pruning / range-hash layout"). This sandbox has
no iceberg-spark-runtime jar, so the same layout is expressed as hive-style
parquet partitions over derived columns:

    url_bucket = pmod(xxhash64(url), N)     -- hash component
    warc_date  = date(warc_ts)              -- time-range component

Properties this buys at scale (and the tests assert the local analogs):
- **Partition pruning**: a crawl-window query (`warc_date BETWEEN …`) or a
  bucket-targeted re-run reads only matching directories — visible as
  PartitionFilters in the scan plan.
- **Co-located joins**: signatures written bucketed by the SAME url hash
  let the verify stage join candidates to sketches with both sides
  pre-clustered on the join key; with Iceberg this is a storage-partitioned
  join (no shuffle of the big side).
- **Bounded task inputs**: bucket count N chosen so one (bucket, day)
  partition ≈ one executor-core unit of work; at 10^12 docs/day and
  N=4096, a day-bucket is ~250M docs spread over day files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LAYOUT_COLS = ("url_bucket", "warc_date")


def with_layout_columns(pages: DataFrame, n_buckets: int = 64) -> DataFrame:
    return pages.withColumns(
        {
            "url_bucket": F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"),
            "warc_date": F.to_date("warc_ts"),
        }
    )


def write_pages_table(
    pages: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Write pages in the bucket(url) x days(warc_ts) layout."""
    (
        with_layout_columns(pages, n_buckets)
        .write.mode(mode)
        .partitionBy(*LAYOUT_COLS)
        .parquet(path)
    )


def read_pages_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_has_partition_pruning(df: DataFrame) -> bool:
    """True iff the executed plan pushes a partition filter into the scan
    (the local analog of Iceberg manifest pruning)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            inner = line.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
            if inner.strip():
                return True
    return False
