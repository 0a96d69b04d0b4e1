"""Graph persistence: parquet sink/source for LinkGraph.

Layout under one directory: ``edges/`` (all edge columns, written
hash-distributed by ``src`` so a reload feeds src-keyed joins with
balanced files), ``vertices/``, and ``meta/`` (a 1-row parquet with
the directedness flag and counts — parquet rather than a JSON side
file so the format needs nothing but the warehouse filesystem and
works on any URI Spark can write). No metastore dependency; for
bucket-pruned co-located joins use ``saveAsTable`` with bucketBy on
top of these frames instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def save_graph(graph: LinkGraph, path: str, edge_partitions: int | None = None) -> None:
    """Persist edges, vertices and directedness under ``path``
    (overwrites). ``edge_partitions`` sizes the edge files (default:
    the edge frame's current partitioning)."""
    e = graph.edges
    if edge_partitions is not None:
        e = e.repartition(edge_partitions, "src")
    e.write.mode("overwrite").parquet(f"{path}/edges")
    graph.vertices.write.mode("overwrite").parquet(f"{path}/vertices")
    spark = graph.edges.sparkSession
    spark.createDataFrame(
        [(bool(graph.directed), graph.name, 1)],
        "directed boolean, name string, version int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_graph(spark: SparkSession, path: str) -> LinkGraph:
    """Reload a graph written by :func:`save_graph` — edge payload
    columns (weight, edge_id, attrs) and explicit isolated vertices
    survive the roundtrip."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    edges = spark.read.parquet(f"{path}/edges")
    vertices = spark.read.parquet(f"{path}/vertices")
    return LinkGraph(
        edges, vertices, directed=bool(meta["directed"]), name=meta["name"] or ""
    )
