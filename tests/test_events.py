"""Funnel and cohort retention vs hand-built fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from linkgraph.operators.events import funnel, retention_cohorts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_order(spark):
    t = datetime(2024, 1, 1)
    m = timedelta(minutes=1)
    rows = [
        # user 1 completes a -> b -> c in order
        (1, t, "a"), (1, t + m, "b"), (1, t + 2 * m, "c"),
        # user 2: b BEFORE a -> never advances past a
        (2, t, "b"), (2, t + m, "a"),
        # user 3: a then c (skips b) -> stops after a
        (3, t, "a"), (3, t + m, "c"),
        # user 4: tie timestamp a and b -> strict > means no advance
        (4, t, "a"), (4, t, "b"),
        # user 5 never does a
        (5, t, "b"), (5, t + m, "c"),
    ]
    got = {r["step"]: (r["step_name"], r["users"])
           for r in funnel(_ev(spark, rows), ["a", "b", "c"]).collect()}
    assert got == {0: ("a", 4), 1: ("b", 1), 2: ("c", 1)}


def test_funnel_validation(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, []), [])


def test_retention_cohorts(spark):
    # weeks: 2024-01-01 (Mon), 2024-01-08, 2024-01-15
    w0, w1, w2 = (datetime(2024, 1, 1 + 7 * i, 12) for i in range(3))
    rows = [
        (1, w0, "x"), (1, w1, "x"), (1, w2, "x"),   # cohort w0, offsets 0,1,2
        (2, w0, "x"), (2, w2, "x"),                  # cohort w0, offsets 0,2
        (3, w1, "x"),                                # cohort w1, offset 0
    ]
    got = {(str(r["cohort"]), r["offset"]): r["users"]
           for r in retention_cohorts(_ev(spark, rows)).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 2,
        ("2024-01-08", 0): 1,
    }
