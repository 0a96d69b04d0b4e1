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
