"""Leiden community detection (connectivity-guaranteed Louvain).

The reference's community surface is label propagation; Louvain
(``operators/louvain.py``) is the modularity ladder on top of it.
Louvain's known defect (Traag, Waltman & van Eck, "From Louvain to
Leiden", Sci. Rep. 2019 — public) is that its communities can be
INTERNALLY DISCONNECTED: a bridge vertex moves away and strands the
two halves it connected under one label. Leiden inserts a REFINEMENT
phase between local moves and aggregation: inside each community,
recluster from singletons with moves restricted to the community,
aggregate on the refined partition, and seed the collapsed level with
the unrefined partition. Every returned community is then connected
by construction.

Deviation from the paper, for determinism: the paper merges
singletons RANDOMLY proportional to gain; this implementation reuses
the deterministic synchronous argmax of ``louvain_local_moves`` for
the constrained moves and then enforces the connectivity guarantee
exactly with a WCC pass per parent block (``refine_connected``). The
guarantee is identical; only the tie-breaking differs, and every step
replays in SQL.

Spark shape per level: the constrained-move subgraph is one
edges⋈labels⋈labels filter (intra-parent edges only — moves cannot
leave the parent because community membership only ever transfers
along edges of the move graph); refinement WCC runs on that same
intra-parent operand (component labels cannot span parents, so one
distributed WCC covers every block at once — never a per-community
loop); aggregation is the existing ``quotient_graph`` collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, quotient_graph
from linkgraph.operators.components import weakly_connected_components
from linkgraph.operators.louvain import louvain_local_moves


def _intra_edges(graph: LinkGraph, labels: DataFrame) -> DataFrame:
    """Edges whose endpoints share a label: (src, dst, weight, parent).
    Vertices missing a label are dropped with their edges (the
    subgraph-then-collapse semantics quotient_graph uses)."""
    lab = labels.select("id", F.col(labels.columns[1]).alias("_p"))
    sl = lab.select(F.col("id").alias("src"), F.col("_p").alias("_sp"))
    dl = lab.select(F.col("id").alias("dst"), F.col("_p").alias("_dp"))
    return (
        graph.edges.join(sl, "src")
        .join(dl, "dst")
        .filter(F.col("_sp") == F.col("_dp"))
        .select("src", "dst", "weight", F.col("_sp").alias("parent"))
    )


def refine_connected(graph: LinkGraph, labels: DataFrame) -> DataFrame:
    """Split every internally disconnected community: DataFrame(id,
    parent, community) where parent is the input label and community
    is the min vertex id of the member's connected component WITHIN
    the parent — equal to the parent partition wherever communities
    were already connected, strictly finer where they were not.

    One distributed WCC over the union of all intra-community edges
    answers every community at once (components cannot cross parents,
    so no per-community dispatch is needed); labeled vertices with no
    intra-community edge become singletons."""
    lab = labels.select("id", F.col(labels.columns[1]).alias("parent"))
    intra = _intra_edges(graph, lab).select("src", "dst")
    sub = LinkGraph(
        intra.withColumn("weight", F.lit(1.0)),
        lab.select("id"),
        directed=False,
    )
    comp = weakly_connected_components(sub).state
    return lab.join(comp, "id").select(
        "id", "parent", F.col("component").alias("community")
    )


def leiden(
    graph: LinkGraph,
    levels: int = 2,
    rounds: int = 4,
    weighted: bool = False,
) -> DataFrame:
    """The Leiden ladder: local moves → constrained refinement →
    connectivity split → aggregate on the REFINED partition, seeding
    the collapsed level with the UNREFINED partition (the paper's
    §A schedule). Returns DataFrame(id, community) over the ORIGINAL
    vertex ids; every community is internally connected.

    Community ids are the refinement's min-member chain resolved to
    the final level's parent labels — deterministic, no RNG."""
    cur = graph
    lift: DataFrame | None = None  # original id -> current coarse vertex
    final: DataFrame | None = None  # original id -> community so far
    init: DataFrame | None = None
    for level in range(levels):
        w = weighted if level == 0 else True
        parent = louvain_local_moves(
            cur,
            rounds=rounds,
            weighted=w,
            self_loops=(level > 0),
            init=init,
        )
        # constrained moves: singletons over intra-parent edges only —
        # membership can only spread along edges of this subgraph, so
        # refined communities never leave their parent
        intra = _intra_edges(cur, parent)
        gain = louvain_local_moves(
            LinkGraph(
                intra.select("src", "dst", "weight"),
                cur.vertices,
                directed=False,
            ),
            rounds=rounds,
            weighted=w,
            self_loops=(level > 0),
        )
        # Leiden's guarantee, enforced exactly: split any refined
        # community the synchronous argmax left disconnected
        refined = refine_connected(
            LinkGraph(intra.select("src", "dst", "weight"), cur.vertices,
                      directed=False),
            gain.select("id", "community"),
        ).select("id", F.col("community").alias("block"))
        up = parent.select(
            F.col("id").alias("block"), F.col("community").alias("_par")
        )
        if lift is None:
            step = refined.select("id", "block").join(up, "block")
            final = step.select("id", F.col("_par").alias("community"))
            lift = refined.select("id", "block")
        else:
            new_lift = lift.join(
                refined.select(F.col("id").alias("block"),
                               F.col("block").alias("_nb")),
                "block",
                "left",
            ).select("id", F.coalesce("_nb", "block").alias("block"))
            stepped = new_lift.join(up, "block", "left")
            final = stepped.join(
                final.select("id", F.col("community").alias("_prev")), "id"
            ).select("id", F.coalesce("_par", "_prev").alias("community"))
            lift = new_lift
        if level < levels - 1:
            cur = LinkGraph(
                quotient_graph(
                    cur,
                    refined.select(F.col("block").alias("label"), "id")
                    .select("id", "label"),
                    self_loops=True,
                ).edges,
                directed=False,
            )
            # coarse seed: each refined block starts in its parent
            init = (
                refined.join(up.withColumnRenamed("block", "id"), "id")
                .select(F.col("block").alias("id"),
                        F.col("_par").alias("community"))
                .distinct()
            )
    return final
