"""Property tests from SURVEY.md §5.2: byte-identical text invariant,
recall monotonicity in banding, containment-integrated pipeline."""

import datetime
import hashlib
import random

from pyspark.sql import functions as F

from rkmh_spark.config import DedupConfig, TEST_CONFIG
from rkmh_spark.operators.dedup import dedup_pages
from rkmh_spark.sources.pages import generate_pages, pages_dataframe, pages_schema

TS = datetime.datetime(2026, 1, 1)


def test_text_sha256_stable_per_url(spark):
    """Per-row invariant (BASELINE.json input_hint): the text column for a
    given url is byte-identical across independent generations."""
    h1 = {
        r[0]: hashlib.sha256(r[3].encode()).hexdigest()
        for r in generate_pages(n_clusters=20, seed=77)
    }
    h2 = {
        r[0]: hashlib.sha256(r[3].encode()).hexdigest()
        for r in generate_pages(n_clusters=20, seed=77)
    }
    assert h1 == h2


def test_recall_monotone_in_bands(spark):
    """More bands (same r) can only raise LSH capture: pair set grows."""
    df = pages_dataframe(spark, n_clusters=15, dup_rate=0.7, seed=13)

    def pairs_at(bands):
        cfg = DedupConfig(k=8, sketch_size=64, num_bands=bands, band_rows=4,
                          jaccard_threshold=0.5)
        res = dedup_pages(df, cfg)
        return {
            tuple(sorted((r["url_a"], r["url_b"])))
            for r in res.pairs.select("url_a", "url_b").collect()
        }

    few, many = pairs_at(8), pairs_at(72)
    assert few <= many


def test_containment_pass_merges_truncations(spark):
    """A strict prefix page whose symmetric Jaccard is below τ must still
    join its original's cluster when the containment pass is on."""
    rng = random.Random(42)
    words = [f"x{rng.randrange(10**6):06d}" for _ in range(900)]
    base = " ".join(words)
    head = base[: len(base) // 3]  # symmetric jaccard ≈ 1/3 < τ=0.5
    rows = [
        ("t://full", TS, b"", base, "en"),
        ("t://head", TS, b"", head, "en"),
        ("t://other", TS, b"", " ".join(f"y{rng.randrange(10**6):06d}" for _ in range(300)), "en"),
    ]
    pages = spark.createDataFrame(rows, schema=pages_schema())

    plain = dedup_pages(pages, TEST_CONFIG)
    a_plain = dict(plain.assignments.collect())
    assert a_plain["t://head"] != a_plain["t://full"], "precondition: jaccard path misses it"

    with_cont = dedup_pages(pages, TEST_CONFIG, containment_threshold=0.9)
    a = dict(with_cont.assignments.collect())
    assert a["t://head"] == a["t://full"]
    assert a["t://other"] not in (a["t://full"],)


def test_signatures_independent_of_partitioning(spark):
    """Sketches depend only on text, not on partition layout (P-invariance)."""
    from rkmh_spark.operators.signatures import compute_signatures

    df1 = pages_dataframe(spark, n_clusters=10, seed=5, num_partitions=2)
    df2 = pages_dataframe(spark, n_clusters=10, seed=5, num_partitions=7)
    s1 = {r["url"]: r["sketch"] for r in compute_signatures(df1, TEST_CONFIG).collect()}
    s2 = {r["url"]: r["sketch"] for r in compute_signatures(df2, TEST_CONFIG).collect()}
    assert s1 == s2
