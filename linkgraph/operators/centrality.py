"""Multi-source traversal + closeness centrality.

The reference's benchmark surface calls closeness/betweenness
centrality (/root/reference/benchmarks/src/benchmark_networkx_rs.rs:383-390,
benchmarks/src/benchmark_networkx.py:235-247) — both are n×SSSP at
heart, infeasible exactly at 10^12 vertices (SURVEY §2.5). The
scalable form is SAMPLED-source estimation: run a batched
multi-source BFS (source id rides along as a key column, so k
sources cost one frontier loop, not k), then aggregate per vertex.
With sources = all vertices this is exact and matches NetworkX;
with a sample it is the standard unbiased estimator.

Frontier rows are (source, id) pairs — the shuffle key spreads hot
vertices across sources, and each level is one join + one anti-join,
identical machinery to single-source BFS at k× row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import truncate_lineage


def multi_source_bfs(
    graph: LinkGraph,
    sources: DataFrame,
    max_depth: int = 10_000,
    reverse: bool = False,
) -> DataFrame:
    """Hop distances from every source: DataFrame(source, id, level),
    reached pairs only. ``sources``: DataFrame with an id column.
    ``reverse=True`` walks edges backwards (distance TO the source —
    what directed closeness wants)."""
    edges = graph.sym_edges.select("src", "dst")
    if reverse:
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = edges.persist()
    visited = sources.select(
        F.col(sources.columns[0]).cast("long").alias("source")
    ).select("source", F.col("source").alias("id"), F.lit(0).alias("level"))
    visited = visited.transform(truncate_lineage)
    frontier = visited
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(edges, frontier.id == edges.src)
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(visited, ["source", "id"], "left_anti")
            .withColumn("level", F.lit(depth))
            .transform(truncate_lineage)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionAll(nxt).transform(truncate_lineage)
        frontier = nxt
    edges.unpersist()
    return visited


def closeness_centrality(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    wf_improved: bool = True,
) -> DataFrame:
    """Hop-distance closeness: DataFrame(id, closeness).

    closeness(v) = (r-1) / Σ_u d(u,v) over the r vertices u that
    reach v; with ``wf_improved`` (NetworkX default) scaled by
    (r-1)/(n-1). Exact (= ``networkx.closeness_centrality``) when
    ``sources`` is None (all vertices); estimated from a source
    sample otherwise — at web scale pass a sampled source set.
    Directed graphs use incoming distance, like NetworkX."""
    n = graph.vertices.count()
    src = sources if sources is not None else graph.vertices.select("id")
    # distance TO v from each source = forward BFS when undirected,
    # reverse... no: walking FORWARD from u reaches v with d(u,v);
    # grouping by destination vertex v gives incoming distances.
    dists = multi_source_bfs(graph, src, reverse=False)
    agg = dists.filter(F.col("level") > 0).groupBy("id").agg(
        F.sum("level").alias("dsum"), F.count("*").alias("r1")
    )
    scale = (F.col("r1") / F.col("dsum")) * (
        (F.col("r1") / F.lit(float(max(n - 1, 1)))) if wf_improved else F.lit(1.0)
    )
    return (
        graph.vertices.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.when(F.col("dsum").isNotNull(), scale).otherwise(F.lit(0.0)).alias("closeness"),
        )
    )
