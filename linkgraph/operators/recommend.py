"""Who-to-Follow: personalized-SALSA link recommendation.

Gupta, Goel, Lin, Sharma, Wang & Zadeh, "WTF: The Who to Follow
Service at Twitter" (WWW'13). The reference engine's link-analysis
surface (PageRank / HITS / SALSA, graph.rs + digraph.rs) stops at
global scores; WTF composes the engine's batched personalized
PageRank and SALSA primitives into the per-user recommendation
pipeline those scores exist for:

1. circle of trust: the seed's top-``cot_size`` vertices by k-step
   sparse personalized PageRank (egocentric random walk),
2. a per-seed bipartite graph: hubs = circle of trust, authorities =
   everything the circle links to,
3. ``salsa_k`` rounds of personalized SALSA on that bipartite graph
   (degree-normalized alternating walk, per-seed L1 normalization),
4. top-``topk`` authorities the seed does not already link to.

Scale shape: everything is keyed by ``seed`` — the batch shares ONE
stationary transition operand inside ``personalized_pagerank_batch``,
and the per-seed bipartite frames are bounded by
cot_size × max-outdegree rows, so a million-seed batch is a linear
scan of bounded neighborhoods, never V·|seeds| state. Rankings
round scores to 9 dp BEFORE ordering with ascending-id ties, so the
pipeline replays exactly in the DuckDB oracle
(__spark_entry__._wtf_sql) and across partitionings; per-seed top-k
uses the salted two-level pattern (a hub seed whose circle fans out
to the whole corpus never funnels one window task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.pagerank import personalized_pagerank_batch
from linkgraph.plans.iterate import LineageChain
from linkgraph.plans.partitioning import stationary


def _grouped_topk(df: DataFrame, group: str, order, k: int, salt_col: str) -> DataFrame:
    """Two-level per-group top-k: k per (group, salt) first, then
    rank the ≤16k survivors per group — no single-task group windows."""
    w_local = Window.partitionBy(group, "_s").orderBy(*order)
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("_s", F.xxhash64(salt_col) % 16)
        .withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= k)
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .drop("_s", "_r")
    )


def circle_of_trust(
    graph: LinkGraph,
    seeds: DataFrame,
    ppr_k: int = 4,
    cot_size: int = 10,
    alpha: float = 0.85,
) -> DataFrame:
    """DataFrame(seed, id, rank, pos): each seed's top-``cot_size``
    vertices by ``ppr_k``-step sparse personalized PageRank,
    ordered by (round(rank, 9) DESC, id ASC)."""
    ppr = personalized_pagerank_batch(graph, seeds, k=ppr_k, alpha=alpha, weighted=False)
    return _grouped_topk(
        ppr.withColumn("rank", F.round("rank", 9)),
        "seed",
        [F.desc("rank"), F.asc("id")],
        cot_size,
        "id",
    )


def who_to_follow(
    graph: LinkGraph,
    seeds: DataFrame,
    ppr_k: int = 4,
    cot_size: int = 10,
    salsa_k: int = 5,
    topk: int = 10,
    alpha: float = 0.85,
) -> DataFrame:
    """DataFrame(seed, id, score, pos): WTF recommendations — the
    top-``topk`` personalized-SALSA authorities over each seed's
    circle of trust, excluding the seed and vertices it already has
    an out-edge to. ``seeds`` is DataFrame(seed).

    Fixed iteration counts (``ppr_k``, ``salsa_k``) keep the whole
    composite SQL-replayable; scores are round-9 authority mass.
    """
    if salsa_k < 1:
        raise ValueError("salsa_k must be >= 1")
    cot = circle_of_trust(graph, seeds, ppr_k=ppr_k, cot_size=cot_size, alpha=alpha)

    # per-seed bipartite graph: hubs = circle members with out-edges,
    # authorities = their link targets. Bounded fan-out: ≤ cot_size
    # hubs per seed, each contributing its out-neighborhood.
    e = graph.sym_edges.select("src", "dst")
    bip = cot.select("seed", F.col("id").alias("src")).join(e, "src")
    outd = bip.groupBy("seed", "src").agg((F.lit(1.0) / F.count("*")).alias("wa"))
    ind = bip.groupBy("seed", "dst").agg((F.lit(1.0) / F.count("*")).alias("wh"))
    bipw = stationary(
        bip.join(outd, ["seed", "src"]).join(ind, ["seed", "dst"]).select(
            "seed", "src", "dst", "wa", "wh"
        ),
        ["seed", "src"],
    )

    # hub init: uniform over each seed's hub side
    nh = bipw.select("seed", "src").distinct().groupBy("seed").agg(
        (F.lit(1.0) / F.count("*")).alias("h0")
    )
    # one chain per advancing frame: a shared chain would GC the
    # authority parquet (still needed after the loop) on the next
    # hub cut
    h_chain, a_chain = LineageChain(), LineageChain()
    hub = h_chain.cut(
        bipw.select("seed", "src").distinct().join(nh, "seed").select(
            "seed", F.col("src").alias("id"), F.col("h0").alias("hub")
        )
    )
    auth = None
    for i in range(salsa_k):
        a_raw = (
            hub.join(bipw, (hub.seed == bipw.seed) & (hub.id == bipw.src))
            .select(bipw.seed, "dst", (F.col("hub") * F.col("wa")).alias("c"))
            .groupBy("seed", "dst")
            .agg(F.sum("c").alias("a_raw"))
        )
        asum = a_raw.groupBy("seed").agg(F.sum("a_raw").alias("s"))
        auth = a_chain.cut(
            a_raw.join(asum, "seed").select(
                "seed", F.col("dst").alias("id"), (F.col("a_raw") / F.col("s")).alias("authority")
            )
        )
        h_raw = (
            auth.join(bipw, (auth.seed == bipw.seed) & (auth.id == bipw.dst))
            .select(bipw.seed, "src", (F.col("authority") * F.col("wh")).alias("c"))
            .groupBy("seed", "src")
            .agg(F.sum("c").alias("h_raw"))
        )
        hsum = h_raw.groupBy("seed").agg(F.sum("h_raw").alias("s"))
        hub = h_chain.cut(
            h_raw.join(hsum, "seed").select(
                "seed", F.col("src").alias("id"), (F.col("h_raw") / F.col("s")).alias("hub")
            )
        )
    bipw.unpersist()

    # drop the seed itself and anything it already links to
    follows = e.select(F.col("src").alias("seed"), F.col("dst").alias("id"))
    cand = (
        auth.join(follows, ["seed", "id"], "left_anti")
        .filter(F.col("seed") != F.col("id"))
        .withColumn("score", F.round("authority", 9))
    )
    return _grouped_topk(
        cand, "seed", [F.desc("score"), F.asc("id")], topk, "id"
    ).select("seed", "id", "score", "pos")
