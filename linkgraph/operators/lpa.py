"""Deterministic semi-synchronous label propagation communities.

NetworkX's ``asyn_lpa_communities`` is RNG/visit-order dependent —
useless as a distributed spec. We pin the deterministic variant
(SURVEY.md §4.2.6): synchronous rounds; each vertex adopts the most
frequent label among its neighbors (weighted by edge weight), ties
broken by SMALLEST label; isolated vertices keep their own label;
stop at stability or max_iter. The argmax is a window row_number —
one shuffle per round keyed by vertex.

Bipartite-ish structures can 2-cycle under synchronous updates; the
driver loop fingerprints each round's full (id, label) state (a
bit_xor of per-row hashes, folded into the same action as the delta
count) and stops with a loud warning when the state two rounds back
recurs (documented deviation — determinism is the contract, matching
the reference's benchmark usage where only community *structure* is
compared).
"""

from __future__ import annotations

import sys

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkgraph.graph import LinkGraph
from linkgraph.operators.pagerank import _weight_col
from linkgraph.plans.iterate import IterationResult, iterate
from linkgraph.plans.partitioning import stationary


def label_propagation(
    graph: LinkGraph,
    max_iter: int = 20,
    weighted: bool = False,
    weight_expr: Column | str | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
) -> IterationResult:
    """Returns IterationResult, state = DataFrame(id, label).

    ``weight_expr``: optional Column/str evaluated against the edge
    row as the vote weight (overrides ``weighted``) — the same
    weight-closure parameter PageRank/SSSP take, e.g.
    ``F.get_json_object("attrs", "$.cost")``."""
    # vote weight evaluated against the RAW edge row (so weight_expr
    # can reference attr columns), then symmetrized: directed graphs
    # vote over the weak structure, the usual community convention
    w = _weight_col(weighted, weight_expr)
    if graph.directed:
        base = graph.edges.select("src", "dst", w.alias("_w"))
        edges = base.unionAll(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "_w")
        )
    else:
        edges = graph.sym_edges.select("src", "dst", w.alias("_w"))
    # stationary operand: the vote join never re-shuffles the edges
    edges = stationary(edges, "src")
    init = graph.vertices.select("id", F.col("id").alias("label"))
    # last two state fingerprints, for synchronous 2-cycle detection
    fps: list[int] = []

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        votes = (
            state.join(edges, state.id == edges.src)
            .groupBy(F.col("dst").alias("id"), F.col("label").alias("cand"))
            .agg(F.sum("_w").alias("votes"))
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
        # ONE action: delta count + an order-independent state
        # fingerprint (bit_xor of row hashes — no overflow, collision
        # odds 2^-64) for oscillation detection
        row = new.agg(
            F.count(F.when(F.col("label") != F.col("_old"), 1)).alias("chg"),
            F.bit_xor(F.xxhash64("id", "label")).alias("fp"),
        ).collect()[0]
        changed, fp = int(row["chg"]), int(row["fp"] or 0)
        state.unpersist()
        if changed and len(fps) >= 2 and fp == fps[-2]:
            # synchronous 2-cycle (bipartite-ish oscillation): the
            # state two rounds back recurred, so rounds alternate
            # forever. Stop deterministically at the current state.
            print(
                f"WARNING linkgraph.lpa: oscillation detected at round {i} "
                "(state recurrence with period 2); stopping at the current "
                "deterministic state",
                file=sys.stderr,
            )
            changed = 0
        fps.append(fp)
        del fps[:-2]
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
