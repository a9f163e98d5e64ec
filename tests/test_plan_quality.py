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
    "semantic_dedup",      # r6: exercised path now feeds LSH-bucketed
                           # pairs (census/cap/salted) into the decision;
                           # the exact O(n²) generator remains only as
                           # the DuckDB oracle spelling
]


@pytest.mark.parametrize("name", SCALE_PATH_QUERIES)
def test_no_quadratic_join_in_plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


# content-derived census keys: a `count(*) over (partition by <key>)`
# window on any of these ships a hot key's whole membership to ONE
# WindowExec task (the span_dedup.py spill-bomb argument; VERDICT r5 #1).
# r6 respelled every census to groupBy + join back (lsh.bucket_census);
# this gate keeps the window spelling from creeping back. Windows
# partitioned by a PER-DOCUMENT/PER-QUERY id (doc_id, query_id, ref, user)
# are fine — one document's rows are bounded; a content bucket's are not.
_CENSUS_KEY_FRAGMENTS = [
    "band_hash",
    "band#",
    "key#",
    "ngram#",
    "_k#",
    "bucket#",
    "centroid_id#",
    "anchor#",
    "gram#",
]

# every query whose candidate generation runs a census (plus their
# consumers); simhash_dup_pairs/containment hide the census behind a
# localCheckpoint in the FINAL plan, so the gate walks the builder
# functions directly below.
_CENSUS_QUERIES = [
    "ngram_jaccard_pairs",
    "dup_spans",
    "strip_spans",
    "line_dedup",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
]


def _assert_no_census_partition_keys(name, plan):
    """Window plan lines print as `Window [exprs], [partitionSpec],
    [orderSpec]` — only the PARTITION spec decides which rows land in one
    WindowExec task, so only it is gated (a content key in the ORDER BY
    of a per-doc window is fine)."""
    import re

    for line in plan.split("\n"):
        if "windowspecdefinition" not in line:
            continue
        m = re.search(r"\], \[([^\]]*)\], \[[^\]]*\]\s*$", line)
        part_spec = m.group(1) if m else line
        for frag in _CENSUS_KEY_FRAGMENTS:
            assert frag not in part_spec, (
                f"{name}: window census partitioned on {frag}: {line}"
            )


@pytest.mark.parametrize("name", _CENSUS_QUERIES)
def test_no_window_census_on_content_keys(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _assert_no_census_partition_keys(name, plan)


def test_no_window_census_in_candidate_builders(spark):
    """The LSH / SimHash / containment / embedding-bucket candidate
    builders checkpoint their pair sets, so the benched queries' final
    plans don't show the census — gate the builders' lazy plans."""
    from rkmh_spark.config import TEST_CONFIG
    from rkmh_spark.operators.containment import containment_candidates
    from rkmh_spark.operators.dedup_exact import (
        simhash_band_candidates,
        simhash_signatures,
    )
    from rkmh_spark.operators.lsh import band_buckets, candidate_pairs
    from rkmh_spark.operators.signatures import compute_signatures
    from rkmh_spark.sources.pages import documents_as_pages

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pages = documents_as_pages(docs)
    sigs = compute_signatures(pages, TEST_CONFIG)
    lazy_plans = {
        "lsh_candidate_pairs": candidate_pairs(
            band_buckets(sigs, TEST_CONFIG), TEST_CONFIG, materialize=False
        ),
        "simhash_band_candidates": simhash_band_candidates(
            simhash_signatures(docs.select("doc_id", "text"))
        ),
    }
    for name, df in lazy_plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        _assert_no_census_partition_keys(name, plan)
    # containment_candidates checkpoints internally — source-level gate:
    import inspect

    src = inspect.getsource(containment_candidates)
    assert "bucket_census" in src and "Window" not in src


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
