"""Minimum spanning forest — Borůvka on DataFrames.

The reference's benchmark surface calls a (never-shipped) Kruskal MST
(/root/reference/benchmarks/src/benchmark_networkx_rs.rs:401-412;
NetworkX side benchmarks/src/benchmark_networkx.py:263-271). Kruskal's
global edge sort + sequential union-find doesn't distribute; Borůvka
does: each round every component picks its minimum outgoing edge
(one groupBy), components merge (min-label propagation over chosen
edges), rounds = O(log n). Deterministic tie-break: min by
(weight, src, dst)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import truncate_lineage
from linkgraph.operators.components import weakly_connected_components


def minimum_spanning_forest(graph: LinkGraph, max_rounds: int = 40) -> DataFrame:
    """Returns the forest's edge set DataFrame(src, dst, weight) with
    canonical src<dst rows (one per chosen undirected edge)."""
    spark = graph.edges.sparkSession
    edges = (
        graph.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .persist()
    )
    # current component label per vertex
    comp = graph.vertices.select("id", F.col("id").alias("comp")).persist()
    chosen = spark.createDataFrame([], "src long, dst long, weight double")

    for _ in range(max_rounds):
        ca = comp.select(F.col("id").alias("src"), F.col("comp").alias("comp_src"))
        cb = comp.select(F.col("id").alias("dst"), F.col("comp").alias("comp_dst"))
        cross = (
            edges.join(ca, "src")
            .join(cb, "dst")
            .filter(F.col("comp_src") != F.col("comp_dst"))
        )
        if cross.limit(1).count() == 0:
            break
        # min outgoing edge per component (both endpoints' components bid)
        bids = cross.select(F.col("comp_src").alias("comp"), "weight", "src", "dst").unionAll(
            cross.select(F.col("comp_dst").alias("comp"), "weight", "src", "dst")
        )
        picks = (
            bids.groupBy("comp")
            .agg(F.min(F.struct("weight", "src", "dst")).alias("m"))
            .select(F.col("m.src").alias("src"), F.col("m.dst").alias("dst"), F.col("m.weight").alias("weight"))
            .distinct()
        )
        # truncate_lineage (not just persist): each round's plan nests
        # the previous round's WCC plan — without truncation the
        # logical plan grows multiplicatively and optimization time
        # explodes after ~2 rounds
        chosen = chosen.unionAll(picks).transform(truncate_lineage)
        # merge components: WCC over the chosen forest so far
        forest = LinkGraph(chosen, graph.vertices.select("id"), directed=False)
        new_comp = (
            weakly_connected_components(forest)
            .state.select("id", F.col("component").alias("comp"))
            .transform(truncate_lineage)
        )
        comp.unpersist()
        comp = new_comp

    edges.unpersist()
    return chosen.dropDuplicates(["src", "dst"])
