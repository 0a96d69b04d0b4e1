"""save_graph/load_graph parquet roundtrip: payload columns, explicit
isolated vertices, directedness and name all survive."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph.sources.io import load_graph, save_graph


def _edge_set(g):
    return {
        tuple(r[c] for c in sorted(g.edges.columns)) for r in g.edges.collect()
    }


def test_roundtrip_directed_with_payload(spark):
    g = graph_from_edges(
        spark, [(1, 2, 3.0), (2, 3, 1.5), (3, 1, 2.0)], directed=True,
        vertices=[1, 2, 3, 99],
    )
    g = type(g)(g.edges.withColumn("attr", F.lit("x")), g.vertices,
                directed=True, name="web")
    with tempfile.TemporaryDirectory() as d:
        save_graph(g, f"{d}/g", edge_partitions=4)
        back = load_graph(spark, f"{d}/g")
        assert back.directed and back.name == "web"
        assert _edge_set(back) == _edge_set(g)
        assert {r["id"] for r in back.vertices.collect()} == {1, 2, 3, 99}


def test_roundtrip_undirected_multigraph_ids(spark):
    g = graph_from_edges(spark, [(1, 2, 1.0), (1, 2, 2.0)], directed=False)
    g = g.with_edge_ids()
    with tempfile.TemporaryDirectory() as d:
        save_graph(g, f"{d}/g")
        back = load_graph(spark, f"{d}/g")
        assert not back.directed
        assert "edge_id" in back.edges.columns
        assert _edge_set(back) == _edge_set(g)
        assert back.edge_count() == g.edge_count()
