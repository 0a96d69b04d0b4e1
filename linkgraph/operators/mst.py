"""Minimum spanning forest — Borůvka on DataFrames.

The reference's benchmark surface calls a (never-shipped) Kruskal MST
(/root/reference/benchmarks/src/benchmark_networkx_rs.rs:401-412;
NetworkX side benchmarks/src/benchmark_networkx.py:263-271). Kruskal's
global edge sort + sequential union-find doesn't distribute; Borůvka
does: each round every component picks its minimum outgoing edge
(one groupBy), components merge, rounds = O(log n). Deterministic
tie-break: min by (weight, src, dst) — a total order over edges, which
is what makes the picked edge set acyclic.

Component merging runs min-label propagation over the COMPONENT graph
(vertices = current component labels, edges = this round's picks), not
a full-vertex WCC re-run: the propagation input shrinks geometrically
with the component count, and the full vertex table is touched only by
the final label re-join per round."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import (
    ConvergenceError,
    LineageChain,
    PeelCheckpoint,
    iterate,
)
from linkgraph.plans.partitioning import stationary
from linkgraph.operators.components import _min_label_step


def _merge_components(comp: DataFrame, picks: DataFrame) -> DataFrame:
    """New (id, comp) after contracting this round's picked edges.

    Builds the component-level merge graph from the picks (both
    orientations), min-label-propagates to a fixpoint on THAT graph
    (≤ #components vertices — geometrically shrinking), then maps
    every vertex through its old component's new label."""
    ca = comp.select(F.col("id").alias("src"), F.col("comp").alias("comp_src"))
    cb = comp.select(F.col("id").alias("dst"), F.col("comp").alias("comp_dst"))
    ce = (
        picks.join(ca, "src").join(cb, "dst")
        .select(F.col("comp_src").alias("src"), F.col("comp_dst").alias("dst"))
    )
    ce = ce.unionAll(ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).persist()
    cverts = comp.select(F.col("comp").alias("id")).distinct()
    labels = iterate(
        cverts.select("id", F.col("id").alias("label")),
        _min_label_step(ce),
        tol=0.0,
        max_iter=10_000,
        on_exhaustion="raise",
    ).state
    merged = comp.join(
        labels.select(F.col("id").alias("comp"), "label"), "comp"
    ).select("id", F.col("label").alias("comp"))
    ce.unpersist()
    return merged


def minimum_spanning_forest(
    graph: LinkGraph,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """Returns the forest's edge set DataFrame(src, dst, weight) with
    canonical src<dst rows (one per chosen undirected edge). Raises
    ConvergenceError if the Borůvka loop fails to converge within
    ``max_rounds`` (log2(n) rounds suffice; 64 covers any graph whose
    vertex ids fit in a long).

    ``checkpoint_dir``/``checkpoint_every``: durable per-round commits
    of (comp, chosen) via PeelCheckpoint so an interrupted Borůvka
    resumes from the last committed round (north-rule resumability)."""
    spark = graph.edges.sparkSession
    edges = (
        graph.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    edges = stationary(edges, "src")
    # current component label per vertex
    comp = graph.vertices.select("id", F.col("id").alias("comp")).persist()
    chosen = spark.createDataFrame([], "src long, dst long, weight double")
    cchain, mchain, pchain = LineageChain(), LineageChain(), LineageChain()

    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    start_r = 0
    if ckpt and resume:
        meta = ckpt.latest()
        if meta is not None:
            frames = ckpt.load(meta)
            comp.unpersist()
            comp = frames["comp"].persist()
            chosen = frames["chosen"]
            start_r = meta["round"] + 1

    for r in range(start_r, max_rounds + 1):
        ca = comp.select(F.col("id").alias("src"), F.col("comp").alias("comp_src"))
        cb = comp.select(F.col("id").alias("dst"), F.col("comp").alias("comp_dst"))
        cross = (
            edges.join(ca, "src")
            .join(cb, "dst")
            .filter(F.col("comp_src") != F.col("comp_dst"))
        )
        if cross.limit(1).count() == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"minimum_spanning_forest: {max_rounds} Borůvka rounds exhausted "
                "with cross-component edges remaining — refusing to return a "
                "partial forest"
            )
        # min outgoing edge per component (both endpoints' components bid)
        bids = cross.select(F.col("comp_src").alias("comp"), "weight", "src", "dst").unionAll(
            cross.select(F.col("comp_dst").alias("comp"), "weight", "src", "dst")
        )
        picks = (
            bids.groupBy("comp")
            .agg(F.min(F.struct("weight", "src", "dst")).alias("m"))
            .select(F.col("m.src").alias("src"), F.col("m.dst").alias("dst"), F.col("m.weight").alias("weight"))
            .distinct()
        )
        # LineageChain: each round's plan nests the previous round's
        # merge — without hard cuts the logical plan grows
        # multiplicatively; the chain also GCs superseded trunc dirs.
        # picks is materialized once and feeds both consumers (the
        # forest union and the component merge).
        picks = pchain.cut(picks)
        chosen = cchain.cut(chosen.unionAll(picks))
        new_comp = mchain.cut(_merge_components(comp, picks.select("src", "dst")))
        comp.unpersist()
        comp = new_comp
        if ckpt and checkpoint_every and (r + 1) % checkpoint_every == 0:
            ckpt.commit(r, {"comp": comp, "chosen": chosen})

    edges.unpersist()
    mchain.release()
    pchain.release()
    return chosen.dropDuplicates(["src", "dst"])
