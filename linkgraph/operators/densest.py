"""Densest-subgraph extraction by parallel greedy peeling.

The densest subgraph (maximizing average degree / 2 = |E|/|V|) is the
classic web-graph mining primitive for link-spam farms and dense
communities — a natural companion to the k-core/k-truss peels already
in the engine (same family the reference exercises through NetworkX,
/root/reference/benchmarks/src/benchmark_networkx.py).

Algorithm: the MapReduce-friendly 2(1+eps)-approximation (Bahmani,
Kumar & Vassilvitskii, VLDB 2012) of Charikar's greedy peel — per
round, remove EVERY vertex of degree <= 2(1+eps)*rho where rho is the
current density; the answer is the highest-density snapshot. Vertices
with degree <= average always exist, so each round strips at least an
eps/(1+eps) fraction of the pool: O(log n / eps) rounds total, each
one degree aggregation + two anti-joins against a symmetrized edge
operand. No per-vertex neighbor arrays, one driver action per round,
lineage hard-cut per round via LineageChain, best snapshot pinned on
its own chain so peels can't garbage-collect it.

Deterministic: thresholds are pure arithmetic on exact integer
(V, sum-degree) aggregates, so the chosen snapshot is identical across
runs, partitionings and engines — closed-form SQL oracles in the
driver contract check it value-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import ConvergenceError, LineageChain


def _sym_edges(graph: LinkGraph) -> DataFrame:
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def densest_subgraph(
    graph: LinkGraph, epsilon: float = 0.05, max_rounds: int = 10_000
) -> DataFrame:
    """DataFrame(id, density): the vertex set of the best-density peel
    snapshot, with the achieved density |E|/|V| (a 2(1+epsilon)-
    approximation of the optimum) repeated per row.

    Simple-undirected semantics: self-loops dropped, parallel and
    reciprocal edges collapsed before peeling. An all-isolated or
    empty graph returns all vertices at density 0.0 (or no rows)."""
    echain, vchain, bchain = LineageChain(), LineageChain(), LineageChain()
    sym = echain.cut(_sym_edges(graph))
    verts = vchain.cut(graph.vertices.select("id"))
    best_rho = -1.0
    best: DataFrame | None = None
    for r in range(max_rounds + 1):
        deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
        present = verts.join(deg, "id", "left").select(
            "id", F.coalesce("d", F.lit(0)).alias("d")
        )
        row = present.agg(
            F.count("*").alias("v"), F.sum("d").alias("sd")
        ).collect()[0]
        n_v = int(row["v"])
        if n_v == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"densest_subgraph did not drain the vertex pool in "
                f"{max_rounds} rounds"
            )
        n_e = int(row["sd"] or 0) // 2
        rho = n_e / n_v
        if rho > best_rho:
            best_rho = rho
            best = bchain.cut(verts)
        thresh = 2.0 * (1.0 + epsilon) * rho
        # min degree <= average degree = 2*rho <= thresh, so `low` is
        # never empty while vertices remain — the pool always shrinks
        low = present.filter(F.col("d") <= thresh).select("id")
        verts = vchain.cut(verts.join(low, "id", "left_anti"))
        kept = verts.select(F.col("id").alias("kid"))
        sym = echain.cut(
            sym.join(kept, sym.src == F.col("kid"), "left_semi").join(
                kept, F.col("dst") == F.col("kid"), "left_semi"
            )
        )
    echain.release()
    vchain.release()
    spark = graph.vertices.sparkSession
    if best is None:
        return spark.createDataFrame([], "id long, density double")
    return best.withColumn("density", F.lit(float(best_rho)))
