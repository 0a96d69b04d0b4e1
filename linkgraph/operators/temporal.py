"""Time-respecting (temporal) graph reachability.

A temporal edge (u, v, t) is usable only at time t; a time-respecting
path's edge times are non-decreasing. Static reachability (the
reference's BFS/DFS surface, `/root/reference/src/lib.rs` traversals)
over-counts aggressively on transaction/contact networks — an edge
that happened BEFORE the infection reached u cannot carry it onward.
``earliest_arrival`` computes, per vertex, the earliest time the
sources can reach it along time-respecting paths — the contact-tracing
/ influence-propagation primitive.

Plan shape per round: one co-partitioned frontier⋈edges join filtered
by ``ts >= arrival`` + one min aggregation — the SSSP frontier
relaxation with time as the monotone key, so the same stationary-edge
and lineage discipline applies. Arrival times only decrease and the
frontier is pruned to just-improved vertices, so rounds converge in
temporal-diameter steps regardless of |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.plans.iterate import ConvergenceError, LineageChain, PeelCheckpoint
from linkgraph.plans.partitioning import stationary


def earliest_arrival(
    edges: DataFrame,
    sources: DataFrame,
    start: int = 0,
    max_rounds: int = 64,
    on_exhaustion: str = "raise",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """DataFrame(id, arrival): earliest time-respecting arrival from
    any source, reached vertices only.

    ``edges``: (src, dst, ts) with an integer/orderable ``ts`` —
    parallel edges with distinct timestamps are the temporal
    multigraph and all participate. ``sources``: DataFrame(id);
    every source starts with ``arrival = start`` (edges at
    ``ts >= start`` are usable from it). Deterministic: min is
    order-free. Converged result is a fixpoint — running more rounds
    changes nothing, which is what makes the unrolled SQL oracle
    value-comparable. ``checkpoint_dir``/``checkpoint_every``: durable
    per-round (state, frontier) commits via PeelCheckpoint; a restart
    with the same dir resumes at the next round."""
    e = edges.select("src", "dst", F.col("ts").cast("long").alias("ts"))
    e = stationary(e, key="src")
    chain_state = LineageChain()
    chain_front = LineageChain()

    state = sources.select("id", F.lit(int(start)).cast("long").alias("arrival"))
    state = chain_state.cut(state)
    frontier = state

    spark = edges.sparkSession
    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    start_round = 0
    if ckpt and resume:
        meta = ckpt.latest()
        if meta is not None:
            frames = ckpt.load(meta)
            state, frontier = frames["state"], frames["frontier"]
            start_round = meta["round"] + 1

    converged = False
    for round_i in range(start_round, max_rounds):
        cand = (
            e.join(frontier, e["src"] == frontier["id"])
            .filter(F.col("ts") >= F.col("arrival"))
            .groupBy(e["dst"].alias("cid"))
            .agg(F.min("ts").alias("t"))
        )
        merged = state.join(cand, state["id"] == cand["cid"], "full_outer").select(
            F.coalesce(state["id"], cand["cid"]).alias("id"),
            F.least(
                F.coalesce(state["arrival"], cand["t"]),
                F.coalesce(cand["t"], state["arrival"]),
            ).alias("arrival"),
            (
                state["arrival"].isNull()
                | (cand["t"] < state["arrival"])
            ).alias("improved"),
        )
        merged = chain_state.cut(merged)
        frontier = chain_front.cut(
            merged.filter(F.coalesce("improved", F.lit(False))).select("id", "arrival")
        )
        state = merged.select("id", "arrival")
        if ckpt and checkpoint_every and (round_i + 1) % checkpoint_every == 0:
            ckpt.commit(round_i, {"state": state, "frontier": frontier})
        if frontier.limit(1).count() == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"earliest_arrival: frontier still active after {max_rounds} rounds "
            "(temporal diameter exceeds max_rounds)"
        )
        if on_exhaustion == "raise":
            e.unpersist()
            raise ConvergenceError(msg)
        import sys

        print(f"WARNING linkgraph.temporal: {msg}", file=sys.stderr)
    e.unpersist()
    return state
