"""Deterministic semi-synchronous label propagation communities.

NetworkX's ``asyn_lpa_communities`` is RNG/visit-order dependent —
useless as a distributed spec. We pin the deterministic variant
(SURVEY.md §4.2.6): synchronous rounds; each vertex adopts the most
frequent label among its neighbors (weighted by edge weight), ties
broken by SMALLEST label; isolated vertices keep their own label;
stop at stability or max_iter. The argmax is a window row_number —
one shuffle per round keyed by vertex.

Bipartite-ish structures can 2-cycle under synchronous updates; the
driver loop detects a repeat of the previous delta pattern and stops
(documented deviation — determinism is the contract, matching the
reference's benchmark usage where only community *structure* is
compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import IterationResult, iterate
from linkgraph.plans.partitioning import stationary


def label_propagation(
    graph: LinkGraph,
    max_iter: int = 20,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
) -> IterationResult:
    """Returns IterationResult, state = DataFrame(id, label)."""
    edges = graph.sym_edges if not graph.directed else (
        # directed graphs vote over the weak (symmetrized) structure,
        # the usual community-detection convention
        graph.edges.select("src", "dst", "weight").unionAll(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    )
    # stationary operand: the vote join never re-shuffles the edges
    edges = stationary(edges, "src")
    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    init = graph.vertices.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        votes = (
            state.join(edges, state.id == edges.src)
            .groupBy(F.col("dst").alias("id"), F.col("label").alias("cand"))
            .agg(F.sum(w).alias("votes"))
        )
        win = Window.partitionBy("id").orderBy(F.desc("votes"), F.asc("cand"))
        best = (
            votes.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("cand").alias("new_label"))
        )
        new = (
            state.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", F.col("label")).alias("label"),
                F.col("label").alias("_old"),
            )
            .persist()
        )
        changed = new.filter(F.col("label") != F.col("_old")).count()
        state.unpersist()
        return new.select("id", "label"), float(changed)

    res = iterate(
        init,
        step,
        tol=0.0,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    edges.unpersist()
    return res


def communities_canonical(labels: DataFrame) -> DataFrame:
    """Re-key each community by its minimum member id so community
    assignments compare exactly across engines/runs."""
    canon = labels.groupBy("label").agg(F.min("id").alias("community"))
    return labels.join(canon, "label").select("id", "community")
