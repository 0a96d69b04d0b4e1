"""Incremental page ingestion → edge table via Structured Streaming.

The reference is fully batch (SURVEY.md §2.9) and so is the north
rule, but the extraction stage composes naturally as a stream: new
page files land, links are extracted with the SAME vectorized UDF
path as batch (one code path, two execution modes), and edges append
to the durable edge table. ``foreachBatch`` keeps the batch writer's
dedup/aggregation semantics; `availableNow` gives run-to-completion
batch-over-stream for backfills and tests.

At production scale this is the Iceberg MERGE target; here the sink
is an append-mode Parquet directory with a checkpoint location for
exactly-once file-source progress tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linkgraph.sources.edges import build_edges
from linkgraph.sources.pages import PAGE_SCHEMA


def incremental_edge_ingest(
    spark: SparkSession,
    pages_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream parquet page files from ``pages_dir`` into an
    append-only edge table at ``edges_dir``. Returns the streaming
    query (caller awaits/stops it)."""
    stream = (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # per-microbatch link extraction: dedup within the batch;
        # cross-batch multiplicity is resolved by readers (sum weights)
        edges = build_edges(batch_df, dedup=True)
        edges.write.mode("append").parquet(edges_dir)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_edge_ingest(
    spark: SparkSession,
    pages_dir: str,
    table_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """``incremental_edge_ingest`` with the snapshot-log table as the
    sink: each micro-batch's extracted edges land as ONE
    ``SnapshotTable.commit_append`` — so downstream consumers get
    snapshot isolation (a reader never sees half a batch), per-batch
    time travel, and ``added_since`` incremental scans that line up
    1:1 with micro-batches. The streaming checkpoint handles
    source-progress exactly-once; the table's data-then-meta commit
    protocol handles sink atomicity — a batch retried after a crash
    mid-commit leaves only invisible orphan files. This is the
    sandbox stand-in for writeStream → Iceberg table commits.

    Returns the streaming query (caller awaits/stops it).
    """
    from linkgraph.sources.snapshots import SnapshotTable

    table = SnapshotTable(table_root, spark=spark)
    stream = (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.commit_append(build_edges(batch_df, dedup=True))

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding-window aggregation over a
    streaming events frame (ts timestamp, event_type string, value):
    (window, event_type, n, total_value).

    The watermark bounds state: rows later than ``watermark`` behind
    the max observed ts are dropped and windows older than that are
    finalized and evicted — the standard late-data contract. Works
    identically on a batch frame (no watermark semantics, same
    values), keeping one code path for backfill and live."""
    from pyspark.sql import functions as F

    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(win.alias("window"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def running_user_counts(events: DataFrame, timeout_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count with an idle-timeout that emits and
    clears state (the applyInPandasWithState pattern from the north
    brief). Output: (user_id, n_events, closed)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "closed": [True]})
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "closed": [False]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, closed boolean",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_dedup(docs: DataFrame) -> DataFrame:
    """First-occurrence-only streaming dedup: a document passes iff
    its normalized-text fingerprint has not been seen in any earlier
    micro-batch — the online mirror of the batch ``dedup_exact``
    (same md5-60-bit fingerprint), via applyInPandasWithState keyed
    BY the fingerprint so state is one boolean per distinct content
    and the shuffle keys on the fingerprint (uniform), never the doc
    id. Within a batch the smallest doc_id wins (deterministic).
    Output: (fingerprint, doc_id) survivors, append mode."""
    from pyspark.sql import functions as F

    from linkgraph.functions.text import doc_fingerprint_col

    keyed = docs.select(
        doc_fingerprint_col(F.col("text")).alias("fingerprint"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )

    def update(key, pdf_iter, state):
        import pandas as pd

        (fp,) = key
        if state.exists:
            # content already emitted in an earlier batch: drop all
            for _ in pdf_iter:
                pass
            return
        best = None
        for pdf in pdf_iter:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        state.update((True,))
        yield pd.DataFrame({"fingerprint": [fp], "doc_id": [best]})

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType="fingerprint long, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_rank_refresh(
    spark: SparkSession,
    pages_dir: str,
    work_dir: str,
    checkpoint_dir: str,
    alpha: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 200,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """The crawl-refresh loop as one stream: each micro-batch of page
    files appends its extracted edges to ``<work_dir>/edges``, then
    re-ranks the ACCUMULATED graph warm-started from the previous
    batch's converged scores (``pagerank(init_ranks=...)`` — the
    incremental path: the fixpoint is start-independent, so freshness
    costs only the iterations the delta needs, not a cold start's
    dozens). Per batch the scores land durably at
    ``<work_dir>/ranks/batch_<id>`` with an ``iterations`` sidecar;
    ``latest_ranks`` reads the newest. Cross-batch duplicate edges
    are resolved by weight summation at rank time (the append-sink
    contract of ``incremental_edge_ingest``).

    At production scale the edge append and the score swap are
    Iceberg commits; here they are parquet dirs + the stream's own
    exactly-once file-source checkpoint. Returns the streaming query.
    """
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.pagerank import pagerank

    edges_dir = _os.path.join(work_dir, "edges")
    ranks_root = _os.path.join(work_dir, "ranks")

    stream = (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        build_edges(batch_df, dedup=True).write.mode("append").parquet(edges_dir)
        merged = (
            spark.read.parquet(edges_dir)
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        g = LinkGraph(merged, directed=True)
        init = latest_ranks(spark, work_dir)
        res = pagerank(
            g, alpha=alpha, tol=tol, max_iter=max_iter, init_ranks=init
        )
        out = _os.path.join(ranks_root, f"batch_{batch_id:06d}")
        res.state.write.mode("overwrite").parquet(out)
        with open(_os.path.join(out, "_iterations.json"), "w") as f:
            _json.dump({"batch": batch_id, "iterations": len(res.stats)}, f)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_ranks(spark: SparkSession, work_dir: str) -> DataFrame | None:
    """The newest committed score table under ``<work_dir>/ranks``,
    or None before the first batch. A batch dir counts only once its
    parquet _SUCCESS marker exists (the commit protocol)."""
    import os as _os

    root = _os.path.join(work_dir, "ranks")
    if not _os.path.isdir(root):
        return None
    done = sorted(
        d for d in _os.listdir(root)
        if d.startswith("batch_")
        and _os.path.exists(_os.path.join(root, d, "_SUCCESS"))
    )
    if not done:
        return None
    return spark.read.parquet(_os.path.join(root, done[-1]))
