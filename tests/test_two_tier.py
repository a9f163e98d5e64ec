"""Two-tier classification: discriminative tables + group argmax."""

import datetime
import random

from rkmh_spark.config import TEST_CONFIG
from rkmh_spark.operators.two_tier import (
    discriminative_hash_tables,
    two_tier_classify,
)
from rkmh_spark.sources.pages import pages_schema

TS = datetime.datetime(2026, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(u, TS, b"", t, g) for u, t, g in rows], schema=pages_schema()
    )


def _vocab_text(rng, prefix, n):
    return " ".join(f"{prefix}{rng.randrange(10**5):05d}" for _ in range(n))


def test_two_tier_groups(spark):
    rng = random.Random(8)
    # two groups with disjoint vocabularies + one shared boilerplate chunk
    shared = _vocab_text(rng, "s", 20)
    ga1 = _vocab_text(rng, "a", 60) + " " + shared
    ga2 = _vocab_text(rng, "a", 60) + " " + shared
    gb1 = _vocab_text(rng, "b", 60) + " " + shared
    gb2 = _vocab_text(rng, "b", 60) + " " + shared
    panel = _mk(
        spark,
        [("r://a1", ga1, "A"), ("r://a2", ga2, "A"),
         ("r://b1", gb1, "B"), ("r://b2", gb2, "B")],
    )

    # discriminative tables: shared boilerplate hashes must be excluded
    uniq = discriminative_hash_tables(panel, TEST_CONFIG)
    from rkmh_spark.functions.shingles import shingle_hashes
    import numpy as np

    shared_hashes = set(
        shingle_hashes(shared, TEST_CONFIG.k, TEST_CONFIG.hash_seed)
        .view(np.int64)
        .tolist()
    )
    uniq_hashes = {r["hash"] for r in uniq.collect()}
    assert not (shared_hashes & uniq_hashes)

    # queries: mutations of group members
    qa = ga1.replace(ga1.split()[3], "zzz")
    qb = gb2.replace(gb2.split()[5], "qqq")
    queries = _mk(spark, [("q://a", qa, "?"), ("q://b", qb, "?")])
    out = {r["url"]: r for r in two_tier_classify(queries, panel, TEST_CONFIG).collect()}
    assert out["q://a"]["best_group"] == "A"
    assert out["q://b"]["best_group"] == "B"
    assert out["q://a"]["best_ref"] == "r://a1"
    assert out["q://b"]["best_ref"] == "r://b2"
    assert out["q://a"]["group_hits"] > 0
