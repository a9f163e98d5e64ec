"""Hot-bucket salting must emit exactly the naive pair set, just sharded."""

import pytest
from pyspark.sql import functions as F

from rkmh_spark.config import DedupConfig
from rkmh_spark.operators.lsh import candidate_pairs


def _bucket_rows(spark, urls_per_bucket):
    rows = []
    for b, (band_id, band_hash) in enumerate(urls_per_bucket):
        for u in urls_per_bucket[(band_id, band_hash)]:
            rows.append((u, band_id, band_hash))
    return spark.createDataFrame(rows, ["url", "band_id", "band_hash"])


def _expected_pairs(urls_per_bucket):
    out = set()
    for urls in urls_per_bucket.values():
        s = sorted(urls)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                out.add((s[i], s[j]))
    return out


@pytest.mark.parametrize("cap", [2, 3, 200])
def test_salted_pairs_equal_naive(spark, cap):
    buckets = {
        (0, 111): [f"u{i:02d}" for i in range(9)],   # hot at cap=2,3
        (1, 222): ["a", "b", "c"],
        (2, 333): ["x"],                              # singleton → no pairs
        (3, 444): ["p", "q"],
        # same urls colliding in a second bucket → dedup across buckets
        (4, 555): ["a", "b"],
    }
    cfg = DedupConfig(bucket_cap=cap)
    df = _bucket_rows(spark, buckets)
    got = {
        (r["url_a"], r["url_b"])
        for r in candidate_pairs(df, cfg).collect()
    }
    assert got == _expected_pairs(buckets)


def test_duplicate_membership_single_bucket(spark):
    # a url can appear once per (band, bucket); pairs are still unique
    buckets = {(0, 1): ["m", "n", "o", "m2", "n2", "o2"]}
    cfg = DedupConfig(bucket_cap=2)
    got = {
        (r["url_a"], r["url_b"])
        for r in candidate_pairs(_bucket_rows(spark, buckets), cfg).collect()
    }
    assert got == _expected_pairs(buckets)
    assert len(got) == 15
