"""VERDICT r2 #2: the hot-shingle (-I) drop-set must not be collected to
the driver unconditionally. A pathologically low ``max_doc_freq`` on a
big corpus makes the hot set huge; above ``cfg.hot_broadcast_limit`` the
pipeline must switch to the relational anti-join spelling (the same
machinery the unbroadcastable -M keep-set already uses) and produce the
SAME sketches either way."""

import dataclasses

from rkmh_spark.config import TEST_CONFIG, DedupConfig
from rkmh_spark.operators.dedup import dedup_pages
from rkmh_spark.operators.docfreq import hot_shingles, shingle_doc_frequency
from rkmh_spark.operators.signatures import (
    compute_signatures,
    compute_signatures_min_occ,
)
from rkmh_spark.sources.pages import pages_dataframe


def _sig_map(df):
    return {
        r["url"]: (tuple(r["sketch"]), tuple(r["minhash"]), r["n_shingles"])
        for r in df.collect()
    }


def test_relational_hot_filter_matches_collect_path(spark):
    """Same sketches from the broadcast-drop kernel and the relational
    doc-freq join, with a low max_doc_freq that makes MOST shingles hot."""
    pages = pages_dataframe(spark, n_clusters=10, dup_rate=0.8, seed=31)
    cfg = dataclasses.replace(TEST_CONFIG, max_doc_freq=1)

    dfreq = shingle_doc_frequency(pages, cfg)
    drop = hot_shingles(dfreq, cfg.max_doc_freq)
    assert drop.size > 0  # the filter really bites at df>1 on dup pages
    a = _sig_map(compute_signatures(pages, cfg, drop_hashes=drop))
    b = _sig_map(compute_signatures_min_occ(pages, cfg, doc_freq=dfreq))
    assert a == b


def test_dedup_pages_guard_switches_to_relational(spark):
    """hot_broadcast_limit=0 forbids ANY driver collect of the hot set;
    dedup must still run (relational path) and assign every page, with
    assignments identical to the collect-path run."""
    pages = pages_dataframe(spark, n_clusters=10, dup_rate=0.8, seed=32)
    base = dict(
        k=8, sketch_size=64, num_bands=72, band_rows=4,
        jaccard_threshold=0.5, max_doc_freq=2,
    )
    guarded = dedup_pages(pages, DedupConfig(**base, hot_broadcast_limit=0))
    collected = dedup_pages(
        pages, DedupConfig(**base, hot_broadcast_limit=10**9)
    )
    ga = sorted(map(tuple, guarded.assignments.collect()))
    ca = sorted(map(tuple, collected.assignments.collect()))
    assert ga == ca
    assert len(ga) == pages.count()
