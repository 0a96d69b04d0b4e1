"""Stationary operands for iterative joins.

The single biggest per-iteration cost in a frontier/label/SpMV loop
is re-shuffling the EDGE side of the join every round: a cached frame
without a known partitioning satisfies no join distribution, so
Catalyst exchanges all E rows per iteration. Caching the frame AFTER
an explicit repartition on the join key publishes
HashPartitioning(key, P) through the InMemoryTableScan — the edge
operand then never moves again and only the (V-row) state side
shuffles. Measured on PageRank (scaling_bench): local[32] throughput
+36% from this alone.

Partition count is sized by DATA (~2M rows ≈ 50 MB per partition),
capped at the session shuffle width: big inputs keep the full-width
CSR layout, small inputs avoid paying a fixed 64-empty-task scheduler
floor per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ROWS_PER_PARTITION = 2_000_000


def shuffle_width(spark: SparkSession) -> int:
    """The session's shuffle width as an int. Some managed runtimes
    set ``spark.sql.shuffle.partitions`` to a non-numeric value
    (e.g. "auto"); fall back to the cluster's default parallelism
    rather than crashing on a user-supplied session."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        return int(spark.sparkContext.defaultParallelism)


_SIZE_SUFFIX = {
    "b": 1, "k": 1024, "kb": 1024, "m": 1024**2, "mb": 1024**2,
    "g": 1024**3, "gb": 1024**3, "t": 1024**4, "tb": 1024**4,
}


def _parse_bytes_conf(v: str) -> int:
    """Spark size-string ("64MB", "10485760b", "-1") → bytes."""
    s = str(v).strip().lower()
    for suf in sorted(_SIZE_SUFFIX, key=len, reverse=True):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * _SIZE_SUFFIX[suf])
    return int(float(s))


def broadcast_state_rows(spark: SparkSession, row_bytes: int = 16) -> int:
    """How many rows of a slim vertex-state frame (id long + score
    doubles ≈ ``row_bytes``) this session would choose to BROADCAST,
    mirroring the judgment Spark's own AQE makes through
    ``spark.sql.autoBroadcastJoinThreshold`` — the one knob cluster
    operators already tune per topology. Iterative SpMV operators use
    this as the auto-switch between the shuffle plan (state exchanges
    every round) and the exchange-free broadcast plan (state ships to
    every executor every round): with the engine's 64 MB session
    default this is ~4M rows, exactly the regime where the broadcast
    plan measured 3.1x on 160M Zipf edges (BENCH/BASELINE.md Job 4);
    with Spark's stock 10 MB it stays conservative (~650k rows) for
    untuned many-executor clusters, where per-round broadcast bytes
    scale with executor count. Returns 0 when broadcast is disabled
    (threshold <= 0) or the conf is unparseable."""
    try:
        b = _parse_bytes_conf(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
    except (ValueError, TypeError):
        return 0
    return max(0, b // max(1, row_bytes))


def stationary(
    df: DataFrame, key: str | list[str] = "src", rows: int | None = None
) -> DataFrame:
    """Hash-partition ``df`` by ``key`` (a column name or list of
    names; data-sized partition count) and persist, so every later
    join keyed on ``key`` reads it without an Exchange. Caller
    unpersists."""
    spark = df.sparkSession
    keys = [key] if isinstance(key, str) else list(key)
    m = rows if rows is not None else df.count()
    n_parts = max(
        1,
        min(
            shuffle_width(spark),
            (m + ROWS_PER_PARTITION - 1) // ROWS_PER_PARTITION,
        ),
    )
    return df.repartition(n_parts, *keys).persist()
