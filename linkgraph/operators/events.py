"""Event-sequence analytics: ordered funnels and cohort retention.

The two standard product-analytics aggregations over an event log
(user_id, ts, event_type): how many users progress through an ordered
step sequence, and how many users from each first-seen cohort come
back k periods later. Both are pure Catalyst plans — per-step min-ts
aggregations and joins for the funnel (k-1 joins for k steps, all
keyed on user_id), one date-trunc + distinct + self-join for
retention. No window over the whole log, no driver loop beyond the
fixed step list.

Reference scope: networkx-rust has no event surface; these extend the
engine's sessionization queries (SURVEY §2.8b) to the remaining
event-log primitives a data-pipeline team expects.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """DataFrame(step, step_name, users): users completing each prefix
    of the ordered ``steps`` sequence — step i counts users with a
    step-i event STRICTLY AFTER their earliest completion time of step
    i-1 (the standard strict-order funnel; ties at the same timestamp
    do not advance). Each user is counted once per step they reach.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    )
    cur = (
        e.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t"))
    )
    out = [
        cur.agg(F.count("*").alias("users")).select(
            F.lit(0).alias("step"), F.lit(steps[0]).alias("step_name"), "users"
        )
    ]
    for i, name in enumerate(steps[1:], start=1):
        nxt = e.filter(F.col("et") == name).join(cur, "u")
        cur = (
            nxt.filter(F.col("ts") > F.col("t"))
            .groupBy("u")
            .agg(F.min("ts").alias("t"))
        )
        out.append(
            cur.agg(F.count("*").alias("users")).select(
                F.lit(i).alias("step"), F.lit(name).alias("step_name"), "users"
            )
        )
    return reduce(DataFrame.unionAll, out)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DataFrame(cohort, offset, users): weekly cohort retention —
    cohort = ISO week (Monday-truncated date) of a user's first event,
    offset = whole weeks since that cohort week, users = distinct
    users from the cohort active in that week. offset 0 row = cohort
    size. One distinct on (user, week), one min-agg, one join."""
    weeks = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
    ).distinct()
    first = weeks.groupBy("u").agg(F.min("wk").alias("cohort"))
    return (
        weeks.join(first, "u")
        .select(
            "u", "cohort", F.expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").alias("offset")
        )
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("u").alias("users"))
    )
