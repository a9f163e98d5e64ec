"""Physical-plan regression guards: the scale-path queries must never
plan a cartesian/broadcast-nested-loop join, and scans must prune columns.
(The declared-O(n²) oracle spellings — substring_pairs, embedding_dup_*
brute-force — are exempt: their theta-joins are the point.)"""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# two_tier_classify is exempt: its tier-1 is classify's exhaustive mode —
# a DELIBERATE broadcast nested-loop against the small resident panel,
# the reference's own mechanism (rkmh.cpp:867-870); the scale path for
# large panels is the banded default.
SCALE_PATH_QUERIES = [
    "dedup_assignments",
    "cluster_sizes",       # r5: two bounded groupBys over the assignments
    "exact_dedup_keep_first",  # r5: md5 groupBy keep-min + left-semi join
    "minhash_signatures",
    "min_occ_signatures",
    "ngram_jaccard_pairs",
    "simhash_bands",
    "containment_sketch",
    "variant_calls",
    "session_stats",
    "search_hits",
    "embedding_dup_pairs_lsh",
    "embedding_lsh_topk",
    "token_docfreq",
    "pricing_summary",
    "brand_revenue",
    "line_dedup",          # r3: CCNet line dedup — one df shuffle, no BNL
    "repetition_scores",   # r3: Gopher signals — groupBys only
    "embedding_ivf_topk",  # r4: sharded centroid probe join, no BNL
    "quality_filter",      # r4: Gopher composite — projections + groupBys
    # r5 additions. lm_score is exempt: its single totals row rides a
    # deliberate 1-row broadcast cross join (free at any scale — same
    # sanction class as two_tier_classify's resident panel); its
    # token joins are hash joins and covered by test_lm_score.py's gate.
    "canonical_urls",      # r5: pure projection
    "url_dedup",           # r5: one window shuffle on the canonical key
    "html_text",           # r5: pure projection
    "pii_scrub",           # r5: pure projection
    "domain_stats",        # r5: one hash-agg on host
    "stratified_sample",   # r5: map-only filter
    "weighted_mixture",    # r5: map-only posexplode
    "decontaminate",       # r5: broadcast bench join + doc-id agg
    "tfidf_scores",        # r5: max_df-bounded token join
    "crawl_delta",         # r5: one full-outer hash join on the key
    "corpus_profile",      # r5: one hash-agg on lang
    "dup_spans",           # r5: gram-count groupBy + join back + island window
    "strip_spans",         # r5: dup_spans + per-doc span array join, map-side filter
    "link_graph",          # r5: map-only extraction + one host-pair groupBy
    "anchor_texts",        # r5: map-only extraction + one (host,anchor) groupBy
    "c4_filter",           # r5: pure projection
    # semantic_dedup's queries() entry deliberately runs the exact O(n²)
    # pair generator (the oracle baseline, same exemption as
    # embedding_dup_pairs); its scale path takes LSH pairs and is gated
    # by test_semantic_dedup.py::test_lsh_pairs_path_identical_to_exact
]


@pytest.mark.parametrize("name", SCALE_PATH_QUERIES)
def test_no_quadratic_join_in_plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_parquet_scan_prunes_columns(spark):
    # token_docfreq reads only (doc_id, text) of documents — the scan's
    # ReadSchema must not include the unused lang/source/n_chars columns
    df = entry_mod.queries()["token_docfreq"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert scan_lines, "no parquet scan found"
    for l in scan_lines:
        assert "lang" not in l and "n_chars" not in l, l


def test_filter_pushdown_reaches_scan(spark):
    # embedding_topk filters queries on vec_id < 20 — the predicate must
    # be pushed into the parquet scan, not applied post-scan only.
    # (variant_calls' scans don't appear in ITS final plan: its depth
    # table is localCheckpointed, so those scans run in sub-jobs.)
    df = entry_mod.queries()["embedding_topk"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [
        l for l in plan.split("\n")
        if "PushedFilters" in l and "vec_id" in l and "LessThan" in l
    ]
    assert pushed, plan[:2000]
