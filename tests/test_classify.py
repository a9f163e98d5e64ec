"""classify_pages parity: LSH path == exhaustive path == NumPy argmax."""

import numpy as np
import pytest

from rkmh_spark.config import TEST_CONFIG
from rkmh_spark.functions.shingles import multiset_intersection_size
from rkmh_spark.operators.classify import classify_pages, ranked_similarity
from rkmh_spark.operators.signatures import compute_signatures
from rkmh_spark.oracle import oracle_sketches
from rkmh_spark.sources.pages import generate_pages, pages_dataframe, pages_schema


@pytest.fixture(scope="module")
def panel_and_queries(spark):
    rows = generate_pages(n_clusters=15, dup_rate=1.0, seed=21)
    # panel = first member of each cluster; queries = the rest
    seen, panel, queries = set(), [], []
    for r in rows:
        (panel if r[5] not in seen else queries).append(r[:5])
        seen.add(r[5])
    pdf = spark.createDataFrame(panel, schema=pages_schema())
    qdf = spark.createDataFrame(queries, schema=pages_schema())
    return panel, queries, pdf, qdf


def _numpy_argmax(panel, queries):
    ps = oracle_sketches([r[3] for r in panel], TEST_CONFIG)
    qs = oracle_sketches([r[3] for r in queries], TEST_CONFIG)
    out = {}
    for qi, q in enumerate(queries):
        shared = [
            (multiset_intersection_size(qs[qi], ps[pi]), panel[pi][0])
            for pi in range(len(panel))
        ]
        # argmax with min-url tiebreak, like the Spark window order
        best = max(shared, key=lambda t: (t[0], [-ord(c) for c in t[1]]))
        srt = sorted(shared, key=lambda t: (-t[0], t[1]))
        out[q[0]] = (srt[0][1], srt[0][0], srt[1][0] if len(srt) > 1 else 0)
    return out


def test_exhaustive_matches_numpy(spark, panel_and_queries):
    panel, queries, pdf, qdf = panel_and_queries
    psig = compute_signatures(pdf, TEST_CONFIG)
    qsig = compute_signatures(qdf, TEST_CONFIG)
    got = {
        r["url"]: (r["best_ref"], r["shared"], r["second_shared"])
        for r in classify_pages(qsig, psig, TEST_CONFIG, exhaustive=True).collect()
    }
    expect = _numpy_argmax(panel, queries)
    assert got == expect


def test_lsh_path_matches_exhaustive_on_matches(spark, panel_and_queries):
    panel, queries, pdf, qdf = panel_and_queries
    psig = compute_signatures(pdf, TEST_CONFIG).persist()
    qsig = compute_signatures(qdf, TEST_CONFIG).persist()
    ex = {
        r["url"]: r["best_ref"]
        for r in classify_pages(qsig, psig, TEST_CONFIG, exhaustive=True)
        .where("NOT fail_matches")
        .collect()
    }
    lsh = {
        r["url"]: r["best_ref"]
        for r in classify_pages(qsig, psig, TEST_CONFIG).collect()
    }
    # every real match must be found with the same best_ref via LSH
    hits = sum(1 for u, ref in ex.items() if lsh.get(u) == ref)
    assert hits / max(1, len(ex)) >= 0.99


def test_fail_flags(spark):
    from rkmh_spark.config import DedupConfig

    cfg = DedupConfig(k=8, sketch_size=64, num_bands=72, band_rows=4,
                      jaccard_threshold=0.5, min_matches=5, min_diff=2)
    rows = [
        ("q://match", None, b"", "alpha beta gamma delta epsilon zeta eta theta " * 6, "en"),
        ("q://short", None, b"", "tiny", "en"),
    ]
    refs = [
        ("r://a", None, b"", "alpha beta gamma delta epsilon zeta eta theta " * 6, "en"),
        ("r://b", None, b"", "completely different words entirely unrelated content here " * 6, "en"),
    ]
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    qdf = spark.createDataFrame([(u, ts, h, t, l) for u, _, h, t, l in rows], pages_schema())
    rdf = spark.createDataFrame([(u, ts, h, t, l) for u, _, h, t, l in refs], pages_schema())
    out = {
        r["url"]: r
        for r in classify_pages(
            compute_signatures(qdf, cfg),
            compute_signatures(rdf, cfg),
            cfg,
            exhaustive=True,
        ).collect()
    }
    m = out["q://match"]
    assert m["best_ref"] == "r://a" and not m["fail_matches"] and not m["fail_diff"]
    s = out["q://short"]  # 4-char text, k=8 → empty sketch
    assert s["fail_depth"] and s["fail_matches"]


def test_ranked_similarity_orders_desc(spark, panel_and_queries):
    _, _, pdf, qdf = panel_and_queries
    psig = compute_signatures(pdf, TEST_CONFIG)
    qsig = compute_signatures(qdf, TEST_CONFIG)
    rows = ranked_similarity(qsig.limit(3), psig, TEST_CONFIG).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append((r["rnk"], r["sim"]))
    for url, lst in by_url.items():
        lst.sort()
        sims = [s for _, s in lst]
        assert sims == sorted(sims, reverse=True), url


def test_lsh_path_emits_row_for_unmatched_queries(spark):
    """ADVICE r1: a query whose bands collide with NO reference must still
    produce a classification record (FAIL:MATCHES), not vanish."""
    import datetime

    from rkmh_spark.config import DedupConfig

    cfg = DedupConfig(k=8, sketch_size=64, num_bands=16, band_rows=4,
                      jaccard_threshold=0.5)
    ts = datetime.datetime(2026, 1, 1)
    qdf = spark.createDataFrame(
        [("q://match", ts, b"", "alpha beta gamma delta epsilon zeta " * 8, "en"),
         ("q://nomatch", ts, b"", "totally unrelated content words here now " * 8, "en"),
         ("q://empty", ts, b"", "", "en")],
        pages_schema())
    rdf = spark.createDataFrame(
        [("r://a", ts, b"", "alpha beta gamma delta epsilon zeta " * 8, "en")],
        pages_schema())
    out = {
        r["url"]: r
        for r in classify_pages(
            compute_signatures(qdf, cfg), compute_signatures(rdf, cfg), cfg
        ).collect()
    }
    assert set(out) == {"q://match", "q://nomatch", "q://empty"}
    assert out["q://match"]["best_ref"] == "r://a"
    assert not out["q://match"]["fail_matches"]
    for u in ("q://nomatch", "q://empty"):
        assert out[u]["best_ref"] is None
        assert out[u]["shared"] == 0 and out[u]["fail_matches"], u
    assert out["q://empty"]["fail_depth"]
