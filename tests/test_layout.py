"""Physical layout: bucket(url) x days(warc_ts) partitioning + pruning."""

from pyspark.sql import functions as F

from rkmh_spark.plans.layout import (
    read_pages_table,
    scan_has_partition_pruning,
    with_layout_columns,
    write_pages_table,
)
from rkmh_spark.sources.pages import pages_dataframe


def test_layout_roundtrip_and_pruning(spark, tmp_path):
    pages = pages_dataframe(spark, n_clusters=20, dup_rate=0.5, seed=17)
    path = str(tmp_path / "pages_tbl")
    write_pages_table(pages, path, n_buckets=8)

    back = read_pages_table(spark, path)
    assert back.count() == pages.count()
    # layout columns materialized as partition dirs
    assert {"url_bucket", "warc_date"} <= set(back.columns)
    assert back.select("url_bucket").distinct().count() <= 8

    # date filter prunes partitions at scan time
    pruned = back.where(F.col("warc_date") == F.lit("2026-01-01"))
    assert scan_has_partition_pruning(pruned)
    # non-partition filter must NOT count as partition pruning
    unpruned = back.where(F.col("lang") == "en")
    assert not scan_has_partition_pruning(unpruned)

    # bucket filter prunes too (targeted re-run of one bucket)
    bucketed = back.where(F.col("url_bucket") == 3)
    assert scan_has_partition_pruning(bucketed)


def test_layout_columns_deterministic(spark):
    pages = pages_dataframe(spark, n_clusters=5, seed=2)
    a = {r["url"]: r["url_bucket"] for r in with_layout_columns(pages, 16).collect()}
    b = {r["url"]: r["url_bucket"] for r in with_layout_columns(pages, 16).collect()}
    assert a == b
    assert all(0 <= v < 16 for v in a.values())
