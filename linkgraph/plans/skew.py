"""Skew mitigation for power-law (hub-heavy) graphs — north rule item.

Web graphs are Zipf-distributed: a handful of hub domains collect a
huge share of in-links, so any shuffle keyed by ``dst`` sends the
head of the distribution to one reducer. Two mechanisms, layered:

1. AQE skew-join splitting (enabled in session.py) — the runtime
   backstop, free.
2. Explicit salting for the aggregation path (AQE splits skewed JOIN
   partitions but a skewed groupBy key still lands on one reducer):
   two-level aggregation — partial agg on (key, salt), final agg on
   key. For sums (PageRank contributions, degree counts) this is
   exact and turns the hub reducer into R reducers.

``split_by_hubs`` additionally separates a small hot-key set so the
hot side can be broadcast — the classic broadcast-salted join hybrid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    out: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact sum-by-key with a two-level (salted) aggregation.

    Equivalent to ``df.groupBy(key).sum(value)`` but the first-level
    shuffle key is (key, hash%n_salts): hub keys fan out over
    n_salts reducers; the second level aggregates n_salts rows per
    key — negligible. Catalyst's map-side partial agg already gives
    much of this; explicit salting guarantees it survives plans where
    partial agg degrades (high-cardinality distinct inputs).

    The salt is derived from the ROW CONTENT (hash of every column),
    not ``monotonically_increasing_id``: content-derived salts make
    the two-level float summation ORDER stable across runs, so
    salted results are bit-identical run-to-run (the engine's
    determinism contract). Identical rows land on the same salt —
    harmless for a sum, and hub keys' rows still spread because the
    value column varies."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_psum"))
    )
    return partial.groupBy(key).agg(F.sum("_psum").alias(out))


def split_by_hubs(df: DataFrame, key: str, hubs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split rows into (cold, hot) by membership of ``key`` in the
    hub id set (hubs: DataFrame(id)). Callers join the cold side
    normally and broadcast-join the hot side."""
    hot = df.join(F.broadcast(hubs), df[key] == hubs.id, "left_semi")
    cold = df.join(F.broadcast(hubs), df[key] == hubs.id, "left_anti")
    return cold, hot


def salt_edges(edges: DataFrame, hubs: DataFrame, n_salts: int = 8) -> DataFrame:
    """Replicate-and-salt for joins keyed by dst: hub dst rows get a
    salt column 0..n_salts-1 derived from src (deterministic), cold
    rows salt 0. The matching build side must be exploded over the
    salt range. Used when a co-partitioned join on raw dst would put
    a hub's whole in-neighborhood in one task."""
    is_hub = F.col("_hub").isNotNull()
    tagged = edges.join(
        F.broadcast(hubs.select(F.col("id").alias("dst"), F.lit(1).alias("_hub"))),
        "dst",
        "left",
    )
    return tagged.withColumn(
        "salt",
        F.when(is_hub, F.pmod(F.xxhash64("src"), F.lit(n_salts))).otherwise(F.lit(0)),
    ).drop("_hub")
