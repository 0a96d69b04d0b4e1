"""Louvain local-move rounds (modularity-gain community detection).

The reference's community surface is label propagation; Louvain
(Blondel et al. 2008, public) is the standard modularity ladder. This
operator is the distributed phase-1: synchronous local-move rounds in
which every vertex simultaneously picks the neighboring community
with the best modularity gain. Phase-2 (community collapse) is the
engine's existing ``quotient_graph``; alternating the two is the full
Louvain ladder.

Deterministic synchronous rule (round r):
  score(v→c) = w_{v,c} − k_v · (tot_c − k_v·[c = comm_v]) / 2m
over candidate communities c ∈ {communities of v's neighbors} ∪
{comm_v}; v moves to the argmax, ties broken by smaller community
id, strict improvement over the stay score required. By default
rounds alternate vertex-id parity classes (round r moves only
vertices with pmod(id, 2) == r % 2) — the standard semi-synchronous
symmetry break: fully simultaneous gain-max moves let tightly-bound
pairs swap labels forever (the LPA bipartite oscillation in gain
form), while parity alternation makes each sweep a half-sequential
pass. ``alternate=False`` restores fully synchronous moves for
study. Two rounds ≈ one full sweep.

Plan per round: one edges⋈state join + one (v, community) sum, one
community-total aggregation (|communities| starts at |V| and only
shrinks — AQE broadcasts it per round once it fits), one max_by
argmax — the LPA shuffle shape with a gain expression instead of a
count.

Determinism note: with integer edge weights every score is an exact
integer product divided once by 2m, so argmax ordering is
float-order-independent and replays exactly in SQL. With arbitrary
float weights, per-(v,c) sums depend on addition order at last-ulp —
fine in practice, but the oracle-exact contract entry uses weight 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import LineageChain, PeelCheckpoint
from linkgraph.plans.partitioning import stationary


def louvain_local_moves(
    graph: LinkGraph,
    rounds: int = 4,
    weighted: bool = False,
    alternate: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    self_loops: bool = False,
    init: DataFrame | None = None,
) -> DataFrame:
    """DataFrame(id, community) after ``rounds`` local-move rounds
    from singleton communities, undirected semantics (directions
    ignored, self-loops dropped; parallel edges sum).

    ``init``: optional DataFrame(id, community) starting partition
    instead of singletons — the Leiden ladder seeds each collapsed
    level with the previous level's (unrefined) partition so coarse
    moves continue from where the fine level stopped (Traag et al.
    2019 §A; vertices absent from ``init`` start as singletons).

    ``checkpoint_dir``/``checkpoint_every``: durable per-round state
    commits via PeelCheckpoint; a restart with the same dir resumes
    at the next round (round index — and therefore the parity class —
    is preserved across the restart).

    ``self_loops``: when True, a self-loop's weight counts TWICE into
    its vertex's degree k_v (the Louvain convention — required for the
    collapsed levels of the ladder, where a block's internal weight
    rides as a self-loop) while never appearing as a move candidate.
    Level-1 graphs without self-loops are unaffected."""
    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    half = (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    sym = half.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionAll(half.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    # the gather joins on state.id == sym.dst every round
    sym = stationary(sym, key="dst")

    deg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    if self_loops:
        loops = (
            graph.edges.filter(F.col("src") == F.col("dst"))
            .groupBy(F.col("src").alias("id"))
            .agg((F.lit(2.0) * F.sum(w)).alias("k"))
        )
        deg = (
            deg.unionByName(loops)
            .groupBy("id")
            .agg(F.sum("k").alias("k"))
        )
    deg = deg.persist()
    m2 = deg.agg(F.sum("k")).collect()[0][0]
    if not m2:
        sym.unpersist()
        deg.unpersist()
        return graph.vertices.select("id", F.col("id").alias("community"))

    chain = LineageChain()
    # isolated vertices (k=0) keep their singleton community forever
    # but must survive into the output
    seed_comm = F.col("id")
    verts = graph.vertices.select("id")
    if init is not None:
        verts = verts.join(
            init.select("id", F.col("community").alias("_init")), "id", "left"
        )
        seed_comm = F.coalesce(F.col("_init"), F.col("id"))
    state = (
        verts.join(deg, "id", "left")
        .select(
            "id",
            seed_comm.alias("community"),
            F.coalesce("k", F.lit(0.0)).alias("k"),
        )
    )
    state = chain.cut(state)

    spark = graph.edges.sparkSession
    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    start_r = 1
    if ckpt and resume:
        meta = ckpt.latest()
        if meta is not None:
            state = ckpt.load(meta)["state"]
            start_r = meta["round"] + 1

    for r in range(start_r, rounds + 1):
        tot = state.groupBy("community").agg(F.sum("k").alias("tot"))
        # w_{v,c}: weight from v to each neighboring community
        nbr_comm = (
            sym.join(state.select(F.col("id").alias("nid"), "community"),
                     sym["dst"] == F.col("nid"))
            .groupBy(F.col("src").alias("vid"), "community")
            .agg(F.sum("w").alias("wvc"))
        )
        # stay option: the current community always competes, even
        # with zero internal weight
        stay = state.select(
            F.col("id").alias("vid"), "community", F.lit(0.0).alias("wvc")
        )
        cand = (
            nbr_comm.unionByName(stay)
            .groupBy("vid", "community")
            .agg(F.max("wvc").alias("wvc"))
        )
        cur = state.select(
            F.col("id").alias("vid"), F.col("community").alias("cur"), "k"
        )
        # NO broadcast hint on tot: it has |V| rows at round 1 (every
        # vertex a singleton) and only SHRINKS to broadcastable later —
        # AQE picks broadcast per round once the size actually fits
        scored = (
            cand.join(cur, "vid")
            .join(tot, "community")
            .select(
                "vid",
                "community",
                "cur",
                "k",
                (
                    F.col("wvc")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(F.col("community") == F.col("cur"), F.col("k")).otherwise(
                            F.lit(0.0)
                        )
                    )
                    / F.lit(float(m2))
                ).alias("score"),
            )
        )
        best = scored.groupBy("vid").agg(
            F.expr(
                "max_by(struct(community, score), struct(score, -community)) AS b"
            ),
            F.max(F.when(F.col("community") == F.col("cur"), F.col("score"))).alias(
                "stay_score"
            ),
            F.first("cur").alias("cur"),
        )
        active = (
            F.pmod(F.col("vid"), F.lit(2)) == F.lit(r % 2)
            if alternate
            else F.lit(True)
        )
        moved = best.select(
            F.col("vid").alias("id"),
            F.when(
                active & (F.col("b.score") > F.col("stay_score")),
                F.col("b.community"),
            )
            .otherwise(F.col("cur"))
            .alias("community"),
        )
        state = chain.cut(
            moved.join(deg, "id", "left").select(
                "id", "community", F.coalesce("k", F.lit(0.0)).alias("k")
            )
        )
        if ckpt and checkpoint_every and r % checkpoint_every == 0:
            ckpt.commit(r, {"state": state})

    sym.unpersist()
    deg.unpersist()
    return state.select("id", "community")


def louvain(
    graph: LinkGraph,
    levels: int = 2,
    rounds: int = 4,
    weighted: bool = False,
) -> DataFrame:
    """The full Louvain ladder: alternate local-move rounds with a
    community collapse (``quotient_graph`` with self-loops carrying
    each block's internal weight) and map the coarse labels back to
    the original vertices. Collapsed levels always run weighted with
    self-loop-aware degrees — the Louvain phase-2 convention.
    Returns DataFrame(id, community) over the ORIGINAL vertex ids."""
    from linkgraph.graph import quotient_graph

    mapping: DataFrame | None = None
    cur = graph
    for level in range(levels):
        comm = louvain_local_moves(
            cur,
            rounds=rounds,
            weighted=(weighted if level == 0 else True),
            self_loops=(level > 0),
        )
        if mapping is None:
            mapping = comm
        else:
            relabel = comm.select(
                F.col("id").alias("community"), F.col("community").alias("_new")
            )
            mapping = mapping.join(relabel, "community").select(
                "id", F.col("_new").alias("community")
            )
        if level < levels - 1:
            labels = comm.select("id", F.col("community").alias("label"))
            cur = LinkGraph(
                quotient_graph(cur, labels, self_loops=True).edges,
                directed=False,
            )
    return mapping
