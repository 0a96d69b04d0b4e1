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


def suspicious_block(
    graph: LinkGraph,
    epsilon: float = 0.05,
    col_weight_c: float = 5.0,
    max_rounds: int = 10_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """DataFrame(side, id, suspiciousness): the FRAUDAR dense-block
    readout (Hooi et al., KDD 2016 — camouflage-resistant link-farm /
    fake-engagement detection), the weighted bipartite sibling of
    ``densest_subgraph``. The directed edge set is read as a
    bipartite graph (side 0 = source role, side 1 = target role; a
    page appearing in both roles is two nodes), every edge gets the
    paper's column weight 1/ln(c + indeg(dst)) — mass pointed at an
    already-popular target is cheap camouflage, so it counts less —
    and the same Bahmani-style batch peel as ``densest_subgraph``
    maximizes g(S) = Σ w(edges inside S) / |S|. Returns the
    best-g snapshot (both sides) with the achieved suspiciousness
    repeated per row; a 2(1+epsilon)-approximation of the optimum.

    Deterministic cross-engine: column weights are rounded to 9
    decimals at definition (the peel thresholds are then generic
    reals, never ulp-ties), the snapshot rule is strict improvement
    (earliest best round wins), and the driver contract replays the
    whole peel in unrolled SQL. Nodes enter with their full-graph
    weighted degree — column weights are fixed up front (the paper's
    definition), never recomputed mid-peel.

    ``checkpoint_dir``/``checkpoint_every``: durable per-round commits
    of the full loop state (remaining pool, filtered weighted edges,
    best snapshot so far + its g); a restarted call with the same dir
    continues the peel from the committed round — the north rule's
    resumability contract (plans/iterate.PeelCheckpoint)."""
    from linkgraph.plans.iterate import PeelCheckpoint

    echain, vchain, bchain = LineageChain(), LineageChain(), LineageChain()
    spark = graph.vertices.sparkSession
    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    meta = ckpt.latest() if (ckpt and resume) else None
    best_rho = -1.0
    best: DataFrame | None = None
    r0 = 0
    if meta is not None:
        # skip the (eager) weighting + side split entirely on resume
        frames = ckpt.load(meta)
        verts, ewt, best = frames["verts"], frames["ewt"], frames["best"]
        best_rho = float(meta["extra"]["best_rho"])
        r0 = int(meta["extra"]["round"])
    else:
        e0 = graph.edges.select("src", "dst").distinct()
        indeg = e0.groupBy("dst").agg(F.count("*").alias("_d"))
        ewt = echain.cut(
            e0.join(indeg, "dst").select(
                "src",
                "dst",
                F.round(
                    F.lit(1.0) / F.log(F.lit(float(col_weight_c)) + F.col("_d")), 9
                ).alias("w"),
            )
        )
        verts = vchain.cut(
            ewt.select(F.lit(0).alias("side"), F.col("src").alias("id"))
            .distinct()
            .unionAll(
                ewt.select(F.lit(1).alias("side"), F.col("dst").alias("id")).distinct()
            )
        )
    for r in range(r0, max_rounds + 1):
        wd = (
            ewt.select(F.lit(0).alias("side"), F.col("src").alias("id"), "w")
            .unionAll(
                ewt.select(F.lit(1).alias("side"), F.col("dst").alias("id"), "w")
            )
            .groupBy("side", "id")
            .agg(F.sum("w").alias("wd"))
        )
        present = verts.join(wd, ["side", "id"], "left").select(
            "side", "id", F.coalesce("wd", F.lit(0.0)).alias("wd")
        )
        row = present.agg(F.count("*").alias("v"), F.sum("wd").alias("swd")).collect()[
            0
        ]
        nv = int(row["v"])
        if nv == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"suspicious_block did not drain the node pool in "
                f"{max_rounds} rounds"
            )
        rho = float(row["swd"] or 0.0) / 2.0 / nv
        if rho > best_rho:
            best_rho = rho
            best = bchain.cut(verts)
        # min weighted degree <= average = 2*rho <= threshold, so the
        # pool strictly shrinks every round: O(log n / eps) rounds
        thresh = 2.0 * (1.0 + epsilon) * rho
        verts = vchain.cut(
            present.filter(F.col("wd") > thresh).select("side", "id")
        )
        k0 = verts.filter("side = 0").select(F.col("id").alias("kid"))
        k1 = verts.filter("side = 1").select(F.col("id").alias("kid"))
        ewt = echain.cut(
            ewt.join(k0, ewt.src == F.col("kid"), "left_semi").join(
                k1, F.col("dst") == F.col("kid"), "left_semi"
            )
        )
        if ckpt and checkpoint_every and (r + 1) % checkpoint_every == 0:
            ckpt.commit(
                r + 1,
                {"verts": verts, "ewt": ewt, "best": best},
                extra={"round": r + 1, "best_rho": best_rho},
            )
    echain.release()
    vchain.release()
    if best is None:
        return spark.createDataFrame([], "side int, id long, suspiciousness double")
    return best.withColumn("suspiciousness", F.lit(float(best_rho)))
