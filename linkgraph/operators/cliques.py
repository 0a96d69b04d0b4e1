"""4-clique census on the degree-oriented DAG (kClist-style).

Extends the triangle orientation trick (triangles.py) one level: order
vertices by (degree, id), orient every undirected edge low->high, and
enumerate each 4-clique exactly once as an oriented chain
a->b, a->c, a->d, b->c, b->d, c->d. Fan-out at every join is bounded
by the ORIENTED out-degree (O(sqrt m) on any graph, arboricity-bounded
in general) so hub vertices never explode the intermediate — the same
reason the reference's clustering benchmark surface stays feasible on
power-law graphs (/root/reference/benchmarks/src/benchmark_networkx.py:249-254,
generalized per Danisch-Balalau-Sozio kClist).

Plan shape: the oriented edge list is built once and persisted; the
census is 3 equi-joins + 2 semi-joins on (u, v) pairs — all
broadcast-eligible when the oriented list fits, AQE decides. No
Python, no windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.triangles import _oriented


def four_clique_list(graph: LinkGraph) -> DataFrame:
    """DataFrame(w, x, y, z): each 4-clique of the simple undirected
    projection exactly once, corners sorted ascending by id."""
    _, o = _oriented(graph)
    o = o.persist()
    # oriented triangles (a,b,c): a->b, a->c, b->c — each triangle
    # once, a = orientation-minimum corner
    e_ab = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e_ac = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    close_bc = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = e_ab.join(e_ac, "a").join(close_bc, ["b", "c"])
    # extend by d: out-neighbor of c (bounded fan-out), then require
    # a->d and b->d — d is the orientation-maximum corner, so every
    # 4-clique appears exactly once
    e_cd = o.select(F.col("u").alias("c"), F.col("v").alias("d"))
    cand = tri.join(e_cd, "c")
    e_ad = o.select(F.col("u").alias("a"), F.col("v").alias("d"))
    e_bd = o.select(F.col("u").alias("b"), F.col("v").alias("d"))
    quads = cand.join(e_ad, ["a", "d"], "left_semi").join(
        e_bd, ["b", "d"], "left_semi"
    )
    corners = F.array_sort(F.array("a", "b", "c", "d"))
    return quads.select(
        corners.getItem(0).alias("w"),
        corners.getItem(1).alias("x"),
        corners.getItem(2).alias("y"),
        corners.getItem(3).alias("z"),
    )


def four_clique_counts(graph: LinkGraph) -> DataFrame:
    """Per-vertex 4-clique participation counts, 0 for vertices in no
    4-clique: DataFrame(id, four_cliques)."""
    quads = four_clique_list(graph)
    corners = (
        quads.select(F.col("w").alias("id"))
        .unionAll(quads.select(F.col("x").alias("id")))
        .unionAll(quads.select(F.col("y").alias("id")))
        .unionAll(quads.select(F.col("z").alias("id")))
    )
    per_vertex = corners.groupBy("id").agg(F.count("*").alias("q"))
    return (
        graph.vertices.select("id")
        .join(per_vertex, "id", "left")
        .select("id", F.coalesce("q", F.lit(0)).alias("four_cliques"))
    )


def total_four_cliques(graph: LinkGraph) -> int:
    return four_clique_list(graph).count()
