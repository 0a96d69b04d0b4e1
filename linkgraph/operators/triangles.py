"""Triangle counting by degree-ordered wedge joins (north rule).

The naive edge self-join is O(Σ deg²) — fatal on power-law graphs
where one hub contributes deg² wedges. Degree-ordering (orient every
undirected edge from the lower-(degree,id) endpoint to the higher)
bounds per-vertex wedge fan-out by O(√m) arboricity-style, the
standard trick (cf. the clustering benchmark surface,
/root/reference/benchmarks/src/benchmark_networkx.py:249-254).

Plan shape: 2 joins + 1 semi-join-style closure join, all on (src,
dst) pairs — broadcast-eligible for the oriented edge list when it
fits, AQE decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _oriented(graph: LinkGraph) -> tuple[DataFrame, DataFrame]:
    """(canonical undirected edges, degree-oriented edges u→v with
    (deg,id) of u < of v)."""
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))  # self-loops close no triangles
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionAll(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = canon.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    return canon, oriented


def triangle_list(graph: LinkGraph) -> DataFrame:
    """DataFrame(x, y, z): each triangle once, x<y<z unordered corners."""
    _, o = _oriented(graph)
    o = o.persist()
    e1 = o.select(F.col("u").alias("w_u"), F.col("v").alias("w_m"))
    e2 = o.select(F.col("u").alias("w_m"), F.col("v").alias("w_v"))
    wedges = e1.join(e2, "w_m")
    closer = o.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"))
    tris = wedges.join(closer, ["w_u", "w_v"], "left_semi")
    # sort-based corner ordering: ids are full-range 64-bit hashes,
    # so sum-minus-min-minus-max would overflow long
    corners = F.array_sort(F.array("w_u", "w_m", "w_v"))
    return tris.select(
        corners.getItem(0).alias("x"),
        corners.getItem(1).alias("y"),
        corners.getItem(2).alias("z"),
    )


def triangle_counts(graph: LinkGraph) -> DataFrame:
    """Per-vertex triangle counts, 0 for triangle-free vertices:
    DataFrame(id, triangles)."""
    tris = triangle_list(graph)
    corners = (
        tris.select(F.col("x").alias("id"))
        .unionAll(tris.select(F.col("y").alias("id")))
        .unionAll(tris.select(F.col("z").alias("id")))
    )
    per_vertex = corners.groupBy("id").agg(F.count("*").alias("t"))
    return (
        graph.vertices.select("id")
        .join(per_vertex, "id", "left")
        .select("id", F.coalesce("t", F.lit(0)).alias("triangles"))
    )


def total_triangles(graph: LinkGraph) -> int:
    return triangle_list(graph).count()


def clustering_coefficients(graph: LinkGraph) -> DataFrame:
    """Local clustering coefficient 2T(v)/(d(v)(d(v)-1)) over the
    simple undirected projection; 0 where degree < 2. DataFrame(id,
    clustering)."""
    canon, _ = _oriented(graph)
    deg = (
        canon.select(F.col("a").alias("id"))
        .unionAll(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    t = triangle_counts(graph)
    return (
        t.join(deg, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
