from linkgraph import LinkGraph
from linkgraph.sources.pages import pages_dataframe
from linkgraph.streaming.ingest import incremental_edge_ingest


def test_incremental_ingest_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    edges_dir = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_dataframe(spark, 80, n_domains=8)
    # land pages as multiple files → multiple micro-batches
    pages.repartition(8).write.parquet(pages_dir)

    q = incremental_edge_ingest(spark, pages_dir, edges_dir, ckpt, available_now=True)
    q.awaitTermination(120)

    streamed = spark.read.parquet(edges_dir).groupBy("src", "dst").sum("weight")
    batch = LinkGraph.from_pages(spark.read.parquet(pages_dir)).edges
    s = {(r["src"], r["dst"], r["sum(weight)"]) for r in streamed.collect()}
    b = {(r["src"], r["dst"], r["weight"]) for r in batch.collect()}
    assert s == b  # stream == batch on the same input

    # restart with the same checkpoint: no new input → no duplicates
    q2 = incremental_edge_ingest(spark, pages_dir, edges_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(edges_dir).count() == len(s)


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Watermarked windowed agg over a file-source stream equals the
    same aggregation computed in batch (one code path, two modes)."""
    import datetime as dt

    from linkgraph.streaming.ingest import windowed_event_counts

    rows = [
        (dt.datetime(2025, 1, 1, 0, m, 0), "click" if m % 2 else "view", float(m))
        for m in range(0, 50, 5)
    ]
    src = str(tmp_path / "events_src")
    spark.createDataFrame(rows, "ts timestamp, event_type string, value double").write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
    q = (
        windowed_event_counts(stream, window="10 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].minute, r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table("win_counts").collect()
    }
    batch = windowed_event_counts(
        spark.read.parquet(src)
    ).collect()
    expect = {
        (r["window"]["start"].minute, r["event_type"]): (r["n"], r["total_value"])
        for r in batch
    }
    assert got == expect
    assert len(got) > 0


def test_running_user_counts_stateful(spark, tmp_path):
    import datetime as dt

    from linkgraph.streaming.ingest import running_user_counts

    rows = [
        (i % 3, dt.datetime(2025, 1, 1, 0, 0, i), float(i)) for i in range(30)
    ]
    src = str(tmp_path / "user_events")
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double").write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    q = (
        running_user_counts(stream)
        .writeStream.format("memory")
        .queryName("user_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r["n_events"] for r in spark.table("user_counts").collect()}
    assert got == {0: 10, 1: 10, 2: 10}


def test_streaming_dedup_first_occurrence_wins(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from linkgraph.streaming.ingest import streaming_dedup

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt_dedup")

    schema = "doc_id long, text string"
    # batch 1: docs 1-3, with 1 and 3 identical content
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "alpha  beta ")], schema
    ).coalesce(1).write.parquet(f"{src}/b1")  # ONE file: with
    # maxFilesPerTrigger=1 a multi-file write splits the batch and
    # "within-batch smallest id wins" stops being well-defined
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    # within-batch dup: smallest id wins
    assert first == {1, 2}

    # batch 2: doc 4 repeats batch-1 content (dropped), doc 5 is new
    spark.createDataFrame(
        [(4, "gamma"), (5, "delta")], schema
    ).coalesce(1).write.parquet(f"{src}/b2")
    q2 = (
        streaming_dedup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    final = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert final == {1, 2, 5}


def test_streaming_rank_refresh_warm_start(spark, tmp_path):
    """Two crawl micro-batches: final streamed scores equal a cold
    batch PageRank on the accumulated graph (fixpoint start-
    independence), and the second batch's warm start spends fewer
    iterations than a cold re-rank of the same graph."""
    import json

    from linkgraph.operators.pagerank import pagerank
    from linkgraph.sources.pages import pages_dataframe
    from linkgraph.streaming.ingest import latest_ranks, streaming_rank_refresh
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_dataframe(spark, 120, n_domains=10)
    # ONE file per batch dir: multiple part files would silently split
    # into extra micro-batches (test_streaming gotcha)
    pages.filter(F.xxhash64("url") % 2 == 0).coalesce(1).write.parquet(f"{src}/b1")
    pages.filter(F.xxhash64("url") % 2 != 0).coalesce(1).write.parquet(f"{src}/b2")

    # glob: the parquet file source does not recurse into the b1/b2
    # subdirs on its own (same pattern as the streaming-dedup test)
    q = streaming_rank_refresh(
        spark, f"{src}/*", work, ckpt, tol=1e-9, available_now=True
    )
    q.awaitTermination(600)

    import os
    batches = sorted(
        d for d in os.listdir(os.path.join(work, "ranks")) if d.startswith("batch_")
    )
    assert len(batches) == 2

    got = {r["id"]: r["rank"] for r in latest_ranks(spark, work).collect()}
    merged = (
        spark.read.parquet(os.path.join(work, "edges"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    cold = pagerank(LinkGraph(merged, directed=True), tol=1e-9, max_iter=200)
    want = {r["id"]: r["rank"] for r in cold.state.collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-7

    with open(os.path.join(work, "ranks", batches[-1], "_iterations.json")) as f:
        warm_iters = json.load(f)["iterations"]
    assert warm_iters < len(cold.stats)  # the warm start pays off


def test_snapshot_edge_ingest_commits_per_batch(spark, tmp_path):
    """Streaming into the snapshot-log table: stream == batch on the
    same input, one snapshot per micro-batch, added_since lines up
    with micro-batches, and a checkpointed restart appends nothing."""
    from linkgraph.sources.snapshots import SnapshotTable
    from linkgraph.streaming.ingest import snapshot_edge_ingest

    pages_dir = str(tmp_path / "pages")
    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_dataframe(spark, 80, n_domains=8)
    pages.repartition(8).write.parquet(pages_dir)

    q = snapshot_edge_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q.awaitTermination(120)

    t = SnapshotTable(root)
    n_snaps = t.latest()
    assert n_snaps >= 2  # maxFilesPerTrigger=4 over 8 files → ≥2 batches

    streamed = t.read(spark).groupBy("src", "dst").sum("weight")
    batch = LinkGraph.from_pages(spark.read.parquet(pages_dir)).edges
    s = {(r["src"], r["dst"], r["sum(weight)"]) for r in streamed.collect()}
    b = {(r["src"], r["dst"], r["weight"]) for r in batch.collect()}
    assert s == b

    # incremental scans tile the table exactly: union of per-snapshot
    # added_since == full read, disjoint file sets
    total = 0
    for sid in range(1, n_snaps + 1):
        total += t.added_since(sid - 1, until=sid, spark=spark).count()
    assert total == t.read(spark).count()

    # restart on the same checkpoint: no input left → no new snapshot
    q2 = snapshot_edge_ingest(spark, pages_dir, root, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert SnapshotTable(root).latest() == n_snaps
