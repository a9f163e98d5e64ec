"""Sessionization semantics on a hand-computed fixture."""

import datetime as dt

from rkmh_spark.operators.sessions import session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_gap_splits_sessions(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user 1: 3 events within 10 min, then a 2h gap, then 1 event
        (1, t0, 1, "a", 1.0),
        (2, t0 + dt.timedelta(minutes=5), 1, "a", 1.0),
        (3, t0 + dt.timedelta(minutes=10), 1, "a", 1.0),
        (4, t0 + dt.timedelta(hours=2, minutes=10), 1, "a", 1.0),
        # user 2: single event
        (5, t0, 2, "b", 1.0),
    ]
    out = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["duration_s"],
        )
        for r in session_stats(_events(spark, rows), gap_seconds=3600).collect()
    }
    assert out[(1, 1)] == (3, 600)
    assert out[(1, 2)] == (1, 0)
    assert out[(2, 1)] == (1, 0)
    assert len(out) == 3


def test_boundary_gap_exactly_threshold_does_not_split(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "a", 1.0),
        (2, t0 + dt.timedelta(seconds=3600), 1, "a", 1.0),  # == gap → same
        (3, t0 + dt.timedelta(seconds=7201), 1, "a", 1.0),  # > gap → new
    ]
    s = sessionize(_events(spark, rows), gap_seconds=3600)
    idx = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert idx[1] == idx[2] == 1
    assert idx[3] == 2
