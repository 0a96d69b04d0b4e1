"""DAG structure operators: topological generations (Kahn layering).

Reference parity: the reference's traversal surface (dfs/bfs,
traversal.rs) covers reachability but has no explicit topological
layering; this is the standard companion for the DAGs its pipelines
produce (condensations, dependency graphs) — generation g holds the
vertices whose longest path from any source has exactly g edges,
i.e. ``networkx.topological_generations`` order.

Physical plan: one Kahn peel per generation — an anti-join of the
remaining vertices against the remaining edge targets (the in-degree-0
frontier), then the frontier's out-edges leave the edge set. Rounds =
DAG depth; per round one parquet materialization (the lineage cut of
the grown assignment, which doubles as the frontier's evaluation) and
one footer-cheap count, all frames disk-GC'd via LineageChain. Cycles
fail loudly: a non-empty remainder with an empty frontier names a
sample of the trapped vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import ConvergenceError, LineageChain
from linkgraph.plans.partitioning import stationary


def topological_generations(graph: LinkGraph, max_rounds: int = 100_000) -> DataFrame:
    """DataFrame(id, generation) over a directed acyclic graph:
    generation 0 = the sources, generation g = vertices all of whose
    predecessors sit in generations < g with at least one in g-1
    (exactly ``networkx.topological_generations``' layering, and the
    longest-path-from-source depth). Raises ``ValueError`` on a cycle
    (including self-loops), ``ConvergenceError`` past ``max_rounds``.
    """
    if not graph.directed:
        raise ValueError("topological_generations requires a directed graph")
    spark = graph.edges.sparkSession
    echain, vchain, achain, fchain = (LineageChain() for _ in range(4))
    edges = echain.cut(graph.edges.select("src", "dst").distinct())
    remaining = vchain.cut(graph.vertices.select("id"))
    n_total = remaining.count()
    assigned = spark.createDataFrame([], "id long, generation long")
    prev_assigned, gen = 0, 0
    while prev_assigned < n_total:
        frontier = fchain.cut(
            remaining.join(
                edges.select("dst"), remaining.id == F.col("dst"), "left_anti"
            )
        )
        assigned = achain.cut(
            assigned.unionAll(
                frontier.select("id", F.lit(gen).cast("long").alias("generation"))
            )
        )
        n_assigned = assigned.count()
        if n_assigned == prev_assigned:
            trapped = [r["id"] for r in remaining.limit(5).collect()]
            raise ValueError(
                f"graph has a cycle: {n_total - prev_assigned} vertices have no "
                f"in-degree-0 ancestor (e.g. {trapped})"
            )
        prev_assigned = n_assigned
        if n_assigned == n_total:
            break
        if gen == max_rounds:
            raise ConvergenceError(
                f"topological_generations exceeded {max_rounds} rounds"
            )
        remaining = vchain.cut(remaining.join(frontier, "id", "left_anti"))
        edges = echain.cut(
            edges.join(frontier, edges.src == frontier.id, "left_anti")
        )
        gen += 1
    echain.release()
    vchain.release()
    fchain.release()
    return assigned


def dag_longest_path(graph: LinkGraph, weighted: bool = True) -> DataFrame:
    """DataFrame(id, dist): the weight of the longest (critical) path
    from any source to each vertex of a DAG — 0 at the sources,
    ``networkx.dag_longest_path_length`` at the sink end. Verifies
    acyclicity first via the Kahn peel (raising ``ValueError`` on a
    cycle, where max-relaxation would diverge silently), then runs
    exactly ``depth`` frontier max-relaxation rounds — the SSSP plan
    shape with max instead of min, over a stationary src-partitioned
    edge operand. Weights must be non-negative (every vertex starts
    from the empty path at 0, as in the NetworkX default).
    """
    if not graph.directed:
        raise ValueError("dag_longest_path requires a directed graph")
    gens = topological_generations(graph)  # loud on cycles
    depth_row = gens.agg(F.max("generation").alias("d")).collect()[0]
    depth = int(depth_row["d"]) if depth_row["d"] is not None else 0
    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    e = stationary(graph.edges.select("src", "dst", w.alias("w")), "src")
    chain = LineageChain()
    dist = chain.cut(graph.vertices.select("id", F.lit(0.0).alias("dist")))
    for _ in range(depth):
        cand = (
            dist.join(e, dist.id == e.src)
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("c"))
            .groupBy("id")
            .agg(F.max("c").alias("c"))
        )
        dist = chain.cut(
            dist.join(cand, "id", "left").select(
                "id", F.greatest("dist", F.coalesce("c", F.lit(0.0))).alias("dist")
            )
        )
    e.unpersist()
    return dist
