"""Crawl-delta snapshot diffing (operators/delta.py)."""

from pyspark.sql import functions as F


def test_crawl_delta_statuses(spark):
    from rkmh_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [
            ("http://a.ex/1", "one"),
            ("http://a.ex/2", "two"),
            ("http://a.ex/3", "three"),
        ],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            ("http://a.ex/1", "one"),          # unchanged
            ("HTTP://A.EX:80/2", "two-v2"),    # changed (url respelled)
            ("http://a.ex/4", "four"),         # added
        ],
        "url string, text string",
    )
    got = {
        r["canonical_url"]: r["status"]
        for r in crawl_delta(old, new).collect()
    }
    assert got == {
        "http://a.ex/1": "unchanged",
        "http://a.ex/2": "changed",
        "http://a.ex/3": "removed",
        "http://a.ex/4": "added",
    }


def test_crawl_delta_newest_fetch_wins_within_snapshot(spark):
    from rkmh_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [("http://a.ex/1", "v1", 1)], "url string, text string, ts long"
    )
    # the same canonical url fetched twice in the new snapshot: ts=2 is
    # superseded by ts=3, whose content equals old → unchanged
    new = spark.createDataFrame(
        [
            ("http://a.ex/1?utm_source=f", "v2", 2),
            ("http://a.ex/1", "v1", 3),
        ],
        "url string, text string, ts long",
    )
    got = crawl_delta(old, new, ts_col="ts").collect()
    assert len(got) == 1 and got[0]["status"] == "unchanged"


def test_crawl_delta_hash_variants_agree_on_status(spark):
    from rkmh_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [(f"http://a.ex/{i}", f"t{i}") for i in range(20)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [(f"http://a.ex/{i}", f"t{i}" if i % 2 else "mod") for i in range(20)],
        "url string, text string",
    )
    a = sorted(
        (r["canonical_url"], r["status"])
        for r in crawl_delta(old, new).collect()
    )
    b = sorted(
        (r["canonical_url"], r["status"])
        for r in crawl_delta(old, new, content_hash="xxhash64").collect()
    )
    assert a == b
    assert sum(1 for _, s in a if s == "changed") == 10


def test_crawl_delta_plan_single_join_no_quadratic(spark):
    from rkmh_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [("http://a.ex/1", "x")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("http://a.ex/1", "x")], "url string, text string"
    )
    plan = (
        crawl_delta(old, new)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_crawl_delta_null_text_pages_classified_by_presence(spark):
    """A NULL-text page must be classified by PRESENCE, not by hash
    nullness (md5(NULL) is NULL)."""
    from rkmh_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [("http://a.ex/1", None), ("http://a.ex/2", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("http://a.ex/1", None), ("http://a.ex/3", None)],
        "url string, text string",
    )
    got = {
        r["canonical_url"]: r["status"]
        for r in crawl_delta(old, new).collect()
    }
    assert got == {
        "http://a.ex/1": "unchanged",   # NULL == NULL content
        "http://a.ex/2": "removed",
        "http://a.ex/3": "added",
    }
