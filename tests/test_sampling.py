"""Deterministic stratified sampling / mixture weighting
(operators/sampling.py)."""

import hashlib

from pyspark.sql import functions as F


def _mkdf(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en")
        .when(F.col("id") % 4 == 1, "de")
        .when(F.col("id") % 4 == 2, "fr")
        .otherwise("zh")
        .alias("lang"),
    )


def _u(key, salt="sample") -> float:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


def test_stratified_sample_matches_reference_decision(spark):
    from rkmh_spark.operators.sampling import stratified_sample

    rates = {"en": 0.5, "de": 0.25, "fr": 1.0, "zh": 0.0}
    df = _mkdf(spark)
    got = {r["doc_id"] for r in stratified_sample(df, rates).collect()}
    langs = ["en", "de", "fr", "zh"]
    expect = {
        i for i in range(2000) if _u(i) < rates[langs[i % 4]]
    }
    assert got == expect
    assert 0 < len(expect) < 2000
    # rate 1.0 keeps every fr row; rate 0.0 drops every zh row
    assert all(i in got for i in range(2, 2000, 4))
    assert all(i not in got for i in range(3, 2000, 4))


def test_stratified_sample_stable_under_repartition(spark):
    """The keep-set must not depend on partitioning (the reason this is
    hash-based, not rand()-based)."""
    from rkmh_spark.operators.sampling import stratified_sample

    rates = {"en": 0.3, "de": 0.7}
    df = _mkdf(spark, 500)
    a = {r["doc_id"] for r in stratified_sample(df, rates, default_rate=0.5).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), rates, default_rate=0.5).collect()
    }
    assert a == b


def test_weighted_mixture_replication_and_copy_index(spark):
    from rkmh_spark.operators.sampling import weighted_mixture

    w = {"en": 2.0, "de": 0.5, "fr": 1.25, "zh": 0.0}
    df = _mkdf(spark, 1000)
    rows = weighted_mixture(df, w).collect()
    langs = ["en", "de", "fr", "zh"]
    from collections import Counter

    got = Counter((r["doc_id"]) for r in rows)
    for i in range(1000):
        wv = w[langs[i % 4]]
        base, frac = int(wv), wv - int(wv)
        expect = base + (1 if frac > 0 and _u(i, "mix") < frac else 0)
        assert got.get(i, 0) == expect, i
    # copy index is 0..n-1 per doc
    for r in rows:
        assert 0 <= r["copy"] < got[r["doc_id"]]
    copies = Counter((r["doc_id"], r["copy"]) for r in rows)
    assert all(v == 1 for v in copies.values())
    # expectation sanity: en doubled, zh gone
    assert got[0] == 2 and got.get(3, 0) == 0


def test_sample_then_mix_decisions_are_decorrelated(spark):
    """Different default salts: a 0.5-sample followed by a w=1.5 mix
    must NOT give every survivor the extra copy (unsalted, it would —
    both decisions would test the same u < 0x80000000)."""
    from rkmh_spark.operators.sampling import (
        stratified_sample,
        weighted_mixture,
    )

    df = _mkdf(spark, 2000).where("lang = 'en'")  # 500 rows
    kept = stratified_sample(df, {"en": 0.5})
    mixed = weighted_mixture(kept, {"en": 1.5})
    n_kept = kept.count()
    n_mixed = mixed.count()
    # realized mixture weight should be ~1.5, nowhere near 2.0
    ratio = n_mixed / n_kept
    assert 1.3 < ratio < 1.7, (n_kept, n_mixed)


def test_sampling_plan_is_shuffle_free(spark):
    from rkmh_spark.operators.sampling import (
        stratified_sample,
        weighted_mixture,
    )

    df = _mkdf(spark, 100)
    for out in (
        stratified_sample(df, {"en": 0.5}),
        weighted_mixture(df, {"en": 1.5}),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
