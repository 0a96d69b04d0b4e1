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
