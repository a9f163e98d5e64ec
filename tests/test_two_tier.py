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


def _grams(t: str, k: int) -> list[str]:
    return [t[i : i + k] for i in range(max(len(t) - k + 1, 0))]


def _expected_ranked(qtext: str, panel_rows, k: int):
    """Pure-python replay (substring space, hash↔gram 1:1 like the oracle
    literals): (ranked_str, hits_str) for one tier. panel_rows:
    [(group, text)]."""
    group_sets: dict[str, set] = {}
    for g, t in panel_rows:
        group_sets.setdefault(g, set()).update(_grams(t, k))
    seen_in: dict[str, set] = {}
    for g, s in group_sets.items():
        for x in s:
            seen_in.setdefault(x, set()).add(g)
    uniq = {x: next(iter(gs)) for x, gs in seen_in.items() if len(gs) == 1}
    hits = {g: 0 for g in group_sets}
    for x in _grams(qtext, k):
        g = uniq.get(x)
        if g is not None:
            hits[g] += 1
    n = len(_grams(qtext, k))
    order = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))
    return (
        "".join(f"{g}:{h}/{n};" for g, h in order),
        "".join(f"{h};" for _, h in order),
    )


def test_ranked_tier_lists_order_and_tiebreaks(spark):
    """Pins the reference's ranked `group:sim;` output (rkmh.cpp:2682-2715):
    desc by raw intersections, asc by group name on ties; zero-hit panel
    groups present and ranked last; raw-hits list in the same order; the
    sublineage-analog tier over a finer grouping."""
    from pyspark.sql import functions as F

    rng = random.Random(19)
    shared = _vocab_text(rng, "s", 15)
    mk = lambda p, n: _vocab_text(rng, p, n) + " " + shared
    a1, a2 = mk("a", 50), mk("a", 50)
    b1, c1 = mk("b", 50), mk("c", 50)
    panel = _mk(
        spark,
        [("r://a1", a1, "A"), ("r://a2", a2, "A"),
         ("r://b1", b1, "B"), ("r://c1", c1, "C")],
    ).withColumn("sub", F.concat_ws("-", F.col("lang"), F.col("url")))

    # query = pieces of a1 only → A hits > 0, B and C both 0 (name tiebreak)
    qtext = a1
    queries = _mk(spark, [("q://x", qtext, "?")]).withColumn(
        "sub", F.lit("?")
    )
    out = {
        r["url"]: r
        for r in two_tier_classify(
            queries, panel, TEST_CONFIG, group_col="lang", subgroup_col="sub"
        ).collect()
    }
    row = out["q://x"]
    k = TEST_CONFIG.k

    exp_ranked, exp_hits = _expected_ranked(
        qtext, [("A", a1), ("A", a2), ("B", b1), ("C", c1)], k
    )
    assert row["group_ranked"] == exp_ranked
    assert row["group_ranked_hits"] == exp_hits
    assert row["n_hashes"] == len(_grams(qtext, k))
    # zero-hit groups appear, B before C (asc name on the 0-0 tie)
    assert row["group_ranked"].index("B:0/") < row["group_ranked"].index("C:0/")
    assert row["group_ranked"].startswith("A:")

    # sublineage tier: 4 subgroups (one per panel doc); a1's own subgroup
    # must rank first — its unique vocab dominates
    exp_s_ranked, exp_s_hits = _expected_ranked(
        qtext,
        [("A-r://a1", a1), ("A-r://a2", a2), ("B-r://b1", b1), ("C-r://c1", c1)],
        k,
    )
    assert row["subgroup_ranked"] == exp_s_ranked
    assert row["subgroup_ranked_hits"] == exp_s_hits
    assert row["subgroup_ranked"].startswith("A-r://a1:")


def test_two_tier_zero_shingle_doc_gets_full_ranked_list(spark):
    """ADVICE r3: a query shorter than k yields no hash_dump rows but must
    still emit the FULL zero-hit ranked list over every panel group
    ("g:0/0;..."), like the reference iterating all lineage tables for
    every read — not empty strings."""
    rng = random.Random(11)
    panel = _mk(
        spark,
        [("r://a1", _vocab_text(rng, "a", 60), "A"),
         ("r://b1", _vocab_text(rng, "b", 60), "B")],
    )
    tiny = "abc"
    assert len(tiny) < TEST_CONFIG.k
    queries = _mk(spark, [("q://tiny", tiny, "?")])
    out = {
        r["url"]: r
        for r in two_tier_classify(queries, panel, TEST_CONFIG).collect()
    }
    row = out["q://tiny"]
    assert row["n_hashes"] == 0
    assert row["group_ranked"] == "A:0/0;B:0/0;"
    assert row["group_ranked_hits"] == "0;0;"
    assert row["group_hits"] == 0
