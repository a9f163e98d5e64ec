"""SemDeDup semantic dedup: rule semantics on hand-built vectors, full
reporting, LSH-pairs path ≡ exact path on the planted corpus, and chain
(non-transitive) behavior."""

import pytest
from pyspark.sql import functions as F

from rkmh_spark.operators.semantic_dedup import semantic_dedup
from rkmh_spark.operators.similarity import (
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    near = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    return emb.unionByName(near).persist()


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_min_id_representative_kept(spark):
    # 3 copies of one direction + 1 orthogonal: keep min id + orthogonal
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.001]),
        (3, [0.999, 0.0]),
        (9, [0.0, 1.0]),
    ]
    out = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in semantic_dedup(_df(spark, rows), threshold=0.99).collect()
    }
    assert out == {
        1: (None, True),
        2: (1, False),
        3: (1, False),
        9: (None, True),
    }


def test_chain_is_non_transitive_min_earlier_neighbor(spark):
    # a~b and b~c but a≁c at τ: b → a, c → b (min EARLIER NEIGHBOR, not
    # min earlier id globally), a and nothing else kept from the chain.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9848, 0.1736]),  # ~10° from a: cos≈0.985
        (3, [0.9397, 0.3420]),  # ~20° from a: cos(a,c)≈0.94 < τ, cos(b,c)≈0.985
    ]
    out = {
        r["vec_id"]: (r["dup_of"], r["keep"])
        for r in semantic_dedup(_df(spark, rows), threshold=0.98).collect()
    }
    assert out == {1: (None, True), 2: (1, False), 3: (2, False)}


def test_every_input_row_reported(spark, planted):
    res = semantic_dedup(planted, threshold=0.95)
    assert res.count() == planted.count()


def test_lsh_pairs_path_identical_to_exact(spark, planted):
    exact = semantic_dedup(planted, threshold=0.95)
    lsh_pairs = embedding_near_dup_pairs_lsh(
        planted, threshold=0.95, dim=64, n_planes=8, n_tables=4
    )
    via_lsh = semantic_dedup(planted, threshold=0.95, pairs=lsh_pairs)
    a = {tuple(r) for r in exact.collect()}
    b = {tuple(r) for r in via_lsh.collect()}
    assert a == b
    # non-vacuous: the planted copies really get dropped
    dropped = {r["vec_id"] for r in exact.where(~F.col("keep")).collect()}
    assert dropped == {v + 100000 for v in range(10)}


def test_threshold_monotone(spark, planted):
    kept_hi = semantic_dedup(planted, threshold=0.999).where("keep").count()
    kept_lo = semantic_dedup(planted, threshold=0.95).where("keep").count()
    assert kept_hi >= kept_lo
