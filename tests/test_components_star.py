"""Star-contraction CC must agree with union-find and hash-min on random
graphs AND converge fast on the hash-min worst case (a long chain)."""

import random

import pytest

from rkmh_spark.operators.components import (
    _driver_union_find,
    connected_components,
    connected_components_star,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "url_a string, url_b string")


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


@pytest.mark.parametrize("seed", [1, 2])
def test_star_matches_union_find_random(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = []
    for _ in range(70):
        a, b = rng.sample(nodes, 2)
        pairs.append((min(a, b), max(a, b)))
    df = _edges_df(spark, pairs)
    star = _labels(connected_components_star(df))
    uf = _labels(_driver_union_find(df, "url_a", "url_b"))
    assert star == uf


def test_star_handles_long_chain_within_log_rounds(spark):
    # a 64-node chain has diameter 63: hash-min with the default 20-round
    # cap would SPLIT it (and warns); star contraction needs ~log2(64)
    # alternating rounds
    n = 64
    pairs = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(n - 1)]
    df = _edges_df(spark, pairs)
    star = _labels(connected_components_star(df, max_iterations=10))
    assert set(star.values()) == {"c000"}
    assert len(star) == n


def test_hash_min_warns_on_chain_where_star_succeeds(spark):
    n = 40
    pairs = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(n - 1)]
    df = _edges_df(spark, pairs)
    with pytest.warns(RuntimeWarning, match="did NOT converge"):
        connected_components(
            df, max_iterations=3, driver_threshold=0, n_edges=n - 1
        )
    star = _labels(connected_components_star(df, max_iterations=8))
    assert set(star.values()) == {"c000"}
