"""Bow-tie decomposition of a directed web graph (Broder et al.,
WWW'00, "Graph structure in the Web"): the canonical macro-structure
of a crawl-derived link graph.

Regions (mutually exclusive, covering all vertices):

- ``CORE``   — the largest SCC (ties broken by min SCC label);
- ``IN``     — reaches the core but is not in it;
- ``OUT``    — reachable from the core but not in it;
- ``TENDRIL``— the rest of the core's weak component (Broder's
  tendrils AND tubes — a tube is reachability IN→OUT around the
  core, indistinguishable from tendrils without per-vertex IN/OUT
  provenance, and lumped with them in the coarse decomposition);
- ``DISCONNECTED`` — every other weak component.

IN ∩ OUT = ∅ outside the core by construction: a vertex that both
reaches and is reached by the core is in the core's SCC.

Scale shape: one SCC run, one WCC run, and two set-BFS sweeps
(forward and on the reversed graph) seeded by the whole core at once
— frontier joins against a stationary src-partitioned edge operand,
never one traversal per source. The region tag is then a single
case-when over four left-semi-join flags. Reference parity: composes
the reference's scc/wcc surface (lib.rs exports) into the standard
web-graph analysis its README motivates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.components import (
    strongly_connected_components,
    weakly_connected_components,
)
from linkgraph.plans.iterate import LineageChain
from linkgraph.plans.partitioning import stationary


def reachable_set(
    edges: DataFrame, sources: DataFrame, max_depth: int = 10_000
) -> DataFrame:
    """Vertices reachable from ANY source (sources included): one
    frontier BFS seeded by the whole set — (id) only. ``edges`` is
    (src, dst) in the direction to traverse; pass it pre-reversed for
    backward reachability."""
    e = stationary(edges.select("src", "dst"), "src")
    visited = sources.select("id").distinct()
    frontier = visited
    fchain, vchain = LineageChain(), LineageChain()
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = fchain.cut(
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
        )
        if nxt.limit(1).count() == 0:
            break
        visited = vchain.cut(visited.unionAll(nxt))
        frontier = nxt
    e.unpersist()
    fchain.release()
    return visited


def bowtie_decomposition(graph: LinkGraph) -> DataFrame:
    """DataFrame(id, region) with region in
    {CORE, IN, OUT, TENDRIL, DISCONNECTED} (see module docstring).
    Raises on graphs with no edges-reachable vertices (empty graph
    has no core to anchor the decomposition)."""
    if not graph.directed:
        raise ValueError("bowtie_decomposition is defined for directed graphs")
    scc = strongly_connected_components(graph)
    top = (
        scc.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()
    )
    if not top:
        raise ValueError("bowtie_decomposition: empty graph has no core")
    core_label = top[0]["component"]
    core = scc.filter(F.col("component") == core_label).select("id")

    edges = graph.edges.select("src", "dst")
    fwd = reachable_set(edges, core)
    bwd = reachable_set(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")), core
    )
    wcc = weakly_connected_components(graph).state
    core_weak = (
        wcc.join(core, "id").agg(F.min("component").alias("c")).collect()[0]["c"]
    )

    flag = lambda df, name: df.select("id").withColumn(name, F.lit(True))
    out = (
        scc.select("id", (F.col("component") == core_label).alias("is_core"))
        .join(flag(fwd, "in_fwd"), "id", "left")
        .join(flag(bwd, "in_bwd"), "id", "left")
        .join(wcc.select("id", (F.col("component") == core_weak).alias("in_weak")), "id")
    )
    return out.select(
        "id",
        F.when(F.col("is_core"), F.lit("CORE"))
        .when(F.coalesce("in_bwd", F.lit(False)), F.lit("IN"))
        .when(F.coalesce("in_fwd", F.lit(False)), F.lit("OUT"))
        .when(F.col("in_weak"), F.lit("TENDRIL"))
        .otherwise(F.lit("DISCONNECTED"))
        .alias("region"),
    )
