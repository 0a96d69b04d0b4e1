"""k-truss decomposition by iterative support peeling.

The k-truss is the maximal subgraph whose every edge closes at least
k-2 triangles WITHIN the subgraph (``networkx.k_truss`` semantics:
peel low-support edges until fixpoint, then drop isolated vertices).
The distributed form peels in rounds: each round re-enumerates
triangles on the surviving edges with the engine's degree-ordered
wedge join (operators/triangles.py — the orientation that survives
power-law hubs), explodes each triangle to its three edges, and
anti-joins the under-supported edges out. Rounds are bounded by the
peel depth, every step is partition-parallel, and per-round cost is
one triangle enumeration — the standard truss-peeling trade
(support maintenance under deletions is cheaper per round but needs
mutable per-edge state a DataFrame engine does not keep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import ConvergenceError, LineageChain


def _edge_support(canon: DataFrame, schain: LineageChain) -> DataFrame:
    """Materialized DataFrame(a, b, support) over canonical a<b
    edges: the number of triangles each edge closes (0 rows omitted).
    The degree-ordered wedge join of operators/triangles.py, inlined
    so the per-round oriented cache is unpersisted here instead of
    leaking one cached frame per peel round; ``schain`` owns the
    materialized support (one dir per round, GC'd by the next cut)."""
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
    ).persist()
    e1 = oriented.select(F.col("u").alias("w_u"), F.col("v").alias("w_m"))
    e2 = oriented.select(F.col("u").alias("w_m"), F.col("v").alias("w_v"))
    wedges = e1.join(e2, "w_m")
    closer = oriented.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"))
    tris = wedges.join(closer, ["w_u", "w_v"], "left_semi")
    # the triangle's three sides as canonical pairs
    sides = (
        tris.select(
            F.least("w_u", "w_m").alias("a"), F.greatest("w_u", "w_m").alias("b")
        )
        .unionAll(tris.select(
            F.least("w_m", "w_v").alias("a"), F.greatest("w_m", "w_v").alias("b")
        ))
        .unionAll(tris.select(
            F.least("w_u", "w_v").alias("a"), F.greatest("w_u", "w_v").alias("b")
        ))
    )
    support = schain.cut(
        sides.groupBy("a", "b").agg(F.count("*").alias("support"))
    )
    oriented.unpersist()
    return support


def k_truss(graph: LinkGraph, k: int, max_rounds: int = 1000) -> LinkGraph:
    """The k-truss as an edge subgraph of the original graph
    (original edge rows and payloads preserved; isolated vertices
    drop out, matching NetworkX). k < 2 returns the graph's simple
    projection unchanged semantics-wise (every edge has >= 0
    triangles). Exhausting ``max_rounds`` raises — a partially-peeled
    truss is wrong, not degraded."""
    chain, schain = LineageChain(), LineageChain()
    canon = chain.cut(
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    need = max(k - 2, 0)
    for r in range(max_rounds + 1):
        support = _edge_support(canon, schain)
        low = canon.join(support, ["a", "b"], "left").filter(
            F.coalesce("support", F.lit(0)) < need
        ).select("a", "b")
        # fixpoint check BEFORE the exhaustion raise (k_core/mst order)
        if low.limit(1).count() == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"k_truss did not reach a fixpoint in {max_rounds} rounds"
            )
        canon = chain.cut(canon.join(low, ["a", "b"], "left_anti"))
    # both orientations so original rows match regardless of storage order
    pairs = canon.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        canon.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    out = graph.edge_subgraph(pairs)
    # the final canon dir backs `out` lazily — leaked on purpose (the
    # k_core pattern); only the per-round support dirs are dropped
    schain.release()
    return out


def truss_numbers(graph: LinkGraph, max_k: int = 2**31, max_rounds: int = 1000) -> DataFrame:
    """DataFrame(a, b, truss): for each canonical simple edge, the
    largest k such that the edge survives in the k-truss (edges in no
    triangle get truss 2, the NetworkX convention where the 2-truss
    is the whole simple graph). Peels support levels in ascending
    order, jumping straight to the minimum surviving support — rounds
    = distinct truss values × per-level cascades, each one triangle
    enumeration (the core_numbers shape lifted to edges)."""
    spark = graph.edges.sparkSession
    chain, achain, schain = LineageChain(), LineageChain(), LineageChain()
    canon = chain.cut(
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    assigned = spark.createDataFrame([], "a long, b long, truss long")
    key = 2  # current truss level = key
    rounds = 0
    while True:
        support = _edge_support(canon, schain)
        present = canon.join(support, ["a", "b"], "left").select(
            "a", "b", F.coalesce("support", F.lit(0)).alias("s")
        )
        row = present.agg(F.min("s").alias("m"), F.count("*").alias("c")).collect()[0]
        if not row["c"]:
            break
        rounds += 1
        if rounds > max_rounds:
            raise ConvergenceError(
                f"truss_numbers exceeded {max_rounds} peel rounds"
            )
        # every edge of support <= s_min has truss exactly s_min + 2
        # only if it cannot gain support later — support only FALLS
        # under deletions, so the k-core jump argument applies
        key = max(key, int(row["m"]) + 2)
        if key - 2 >= max_k:
            break
        low = present.filter(F.col("s") <= key - 2).select("a", "b")
        assigned = achain.cut(
            assigned.unionAll(
                low.select("a", "b", F.lit(key).cast("long").alias("truss"))
            )
        )
        canon = chain.cut(canon.join(low, ["a", "b"], "left_anti"))
    # assigned (the output) owns its own dirs via achain — its last
    # dir is leaked on purpose; canon/support dirs are all dead here
    chain.release()
    schain.release()
    return assigned
