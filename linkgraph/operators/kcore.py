"""k-core decomposition by distributed iterative peeling.

A standard link-graph analytic alongside PageRank/WCC/LPA/triangles
(the capability family the reference benchmarks through NetworkX,
/root/reference/benchmarks/src/benchmark_networkx.py): the k-core is
the maximal subgraph where every vertex has degree >= k; the core
number of a vertex is the largest k whose k-core contains it.

The peeling formulation needs only degree aggregations — no
per-vertex neighbor arrays — so hub vertices cost O(deg) rows spread
across partitions, never a collected list. Each inner round is one
groupBy(count) + one anti-join; vertices removed while peeling at
threshold k get core number k-1. Web graphs have small degeneracy
relative to max degree, so the outer loop is short; lineage is
truncated by persist/unpersist per round like the other iterative
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import truncate_lineage


def k_core(graph: LinkGraph, k: int, max_rounds: int = 1000) -> LinkGraph:
    """The maximal subgraph with all simple-undirected degrees >= k;
    returned as an induced subgraph of the original graph."""
    simple = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    sym = simple.unionAll(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # truncate_lineage per round: hard lineage cut so the peel loop's
    # plan depth stays O(1) (SURVEY §4.2 risk #1).
    edges = sym.transform(truncate_lineage)
    for _ in range(max_rounds):
        deg = edges.groupBy("src").agg(F.count("*").alias("d"))
        low = deg.filter(F.col("d") < k).select(F.col("src").alias("id"))
        if low.limit(1).count() == 0:
            break
        edges = (
            edges.join(low, edges.src == low.id, "left_anti")
            .join(low, F.col("dst") == low.id, "left_anti")
            .transform(truncate_lineage)
        )
    kept = edges.select(F.col("src").alias("id")).distinct()
    return graph.subgraph(kept)


def core_numbers(graph: LinkGraph, max_k: int = 10_000) -> DataFrame:
    """DataFrame(id, core): largest k such that id is in the k-core.

    Outer loop over k; inner loop peels to the k-core, assigning
    core = k-1 to everything that falls out. Isolated vertices (and
    vertices only touching self-loops) get core 0. Undirected-degree
    semantics on the symmetrized edge set, matching
    ``networkx.core_number`` (which rejects self-loop graphs; we drop
    self-loops first, the same preprocessing NetworkX documents).
    """
    spark = graph.edges.sparkSession
    # Simple undirected projection (networkx.core_number semantics):
    # drop self-loops, collapse parallel/reciprocal edges.
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = sym.transform(truncate_lineage)
    all_vertices = graph.vertices.select("id").transform(truncate_lineage)

    assigned = spark.createDataFrame([], "id long, core long")
    remaining = all_vertices
    k = 0
    while k < max_k:
        k += 1
        # peel to the k-core of the remaining graph
        while True:
            deg = edges.groupBy("src").agg(F.count("*").alias("d"))
            present = remaining.join(
                deg.select(F.col("src").alias("id"), "d"), "id", "left"
            ).select("id", F.coalesce("d", F.lit(0)).alias("d"))
            # truncate_lineage (not persist) everywhere: each round's
            # frames derive from the last round's, so without hard
            # lineage cuts the logical plan grows multiplicatively
            # across peels and kills the driver long before data size
            # matters (SURVEY §4.2 risk #1).
            low = present.filter(F.col("d") < k).select("id").transform(truncate_lineage)
            if low.limit(1).count() == 0:
                break
            assigned = assigned.unionAll(
                low.select("id", F.lit(k - 1).alias("core"))
            ).transform(truncate_lineage)
            nxt_remaining = remaining.join(low, "id", "left_anti").transform(truncate_lineage)
            nxt_edges = (
                edges.join(low, edges.src == low.id, "left_anti")
                .join(low, F.col("dst") == low.id, "left_anti")
                .transform(truncate_lineage)
            )
            remaining, edges = nxt_remaining, nxt_edges
        if remaining.limit(1).count() == 0:
            break
    return assigned
