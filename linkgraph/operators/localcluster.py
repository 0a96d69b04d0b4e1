"""Local community detection: the PPR sweep cut (Andersen, Chung,
Lang, FOCS 2006 "Local Graph Partitioning using PageRank Vectors").

Seed-set expansion is the web-scale community primitive: given ONE
page/host, find its low-conductance neighborhood WITHOUT touching the
rest of the graph. The ACL recipe: compute a personalized-PageRank
vector from the seed, order candidates by degree-normalized score
(the sweep order), and cut at the prefix of minimum conductance
φ(S) = cut(S) / min(vol(S), vol(V∖S)).

Reference parity: networkx-rust has no community surface beyond what
LPA/Louvain cover globally (SURVEY §2.5); this adds the LOCAL variant
the reference's whole-graph algorithms cannot express at 10^12 pages
(global LPA touches every edge; the sweep touches only the seed's
PPR support).

Scale shape:
- the PPR vector is ``personalized_pagerank_batch`` with one seed —
  sparse by construction (the ≤k-hop out-neighborhood, never V rows),
  one stationary transition operand.
- the sweep runs entirely on the candidate set (PPR support): the
  ordering window and prefix sums are over those ≤ support-size rows
  — a deliberate, documented small-frame global window, NOT a
  V-sized one (the whole point of a local method).
- conductance terms come from degree prefix-sums and one
  candidates⋈candidates edge join (internal edges keyed by the LATER
  sweep position, then a cumulative count) — no per-prefix rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.pagerank import personalized_pagerank_batch


def local_community(
    graph: LinkGraph,
    seed: int,
    alpha: float = 0.85,
    k: int = 6,
    max_size: int | None = None,
    order_round: int | None = None,
) -> DataFrame:
    """DataFrame(pos, id, ppr, degree, vol, cut, conductance,
    in_community): the full ACL sweep from ``seed``.

    ``pos``: 1-based sweep position (degree-normalized PPR desc, id
    asc tiebreak — deterministic and SQL-replayable). ``vol``/``cut``/
    ``conductance``: the prefix {pos' ≤ pos} measured on the
    UNDIRECTED simple projection (distinct symmetrized edges,
    self-loops dropped; degrees unweighted — the classic sweep).
    ``in_community`` marks the minimum-conductance prefix (ties → the
    smallest prefix); prefixes beyond ``max_size`` are still reported
    but not eligible for the cut. The PPR vector is the fixed-``k``
    push (personalized_pagerank_batch), so the whole result is
    deterministic for a given (seed, alpha, k).

    ``order_round``: round the sweep-order key to this many digits
    before ranking (the weighted_sample/kmeans replay trick) — float
    summation order may differ across engines by an ulp, and the id
    tiebreak on the ROUNDED key makes the sweep order identical in
    ANSI SQL. None (default) orders on the raw key.
    """
    sym = (
        graph.sym_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        sym.select(F.col("u").alias("id"))
        .unionAll(sym.select("v"))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    vol_total = deg.agg(F.sum("degree").alias("vt"))

    spark = graph.edges.sparkSession
    seeds = spark.createDataFrame([(int(seed),)], "seed long")
    ppr = (
        personalized_pagerank_batch(graph, seeds, k=k, alpha=alpha)
        .filter(F.col("rank") > 0.0)
        .select("id", F.col("rank").alias("ppr"))
    )

    cand = ppr.join(deg, "id", "left").fillna({"degree": 0})
    # sweep order: degree-normalized score; isolated candidates (deg 0
    # on the simple projection) sort by raw score at the tail
    order_key = F.when(
        F.col("degree") > 0, F.col("ppr") / F.col("degree")
    ).otherwise(F.col("ppr") - 1.0)
    if order_round is not None:
        order_key = F.round(order_key, order_round)
    w = Window.orderBy(F.desc_nulls_last("ok"), F.asc("id"))
    ranked = (
        cand.withColumn("ok", order_key)
        .withColumn("pos", F.row_number().over(w))
        .drop("ok")
    )

    wcum = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    swept = ranked.withColumn("vol", F.sum("degree").over(wcum))

    # internal edges enter the prefix at the LATER endpoint's position
    pu = ranked.select(F.col("id").alias("u"), F.col("pos").alias("pu"))
    pv = ranked.select(F.col("id").alias("v"), F.col("pos").alias("pv"))
    enters = (
        sym.join(pu, "u").join(pv, "v")
        .select(F.greatest("pu", "pv").alias("mpos"))
        .groupBy("mpos")
        .agg(F.count("*").alias("n_enter"))
    )
    swept = (
        swept.join(enters, swept["pos"] == enters["mpos"], "left")
        .drop("mpos")
        .withColumn(
            "internal",
            F.sum(F.coalesce("n_enter", F.lit(0))).over(wcum),
        )
        .drop("n_enter")
        .withColumn("cut", F.col("vol") - 2 * F.col("internal"))
        .crossJoin(F.broadcast(vol_total))
        .withColumn(
            "conductance",
            F.when(
                F.least(F.col("vol"), F.col("vt") - F.col("vol")) > 0,
                F.col("cut")
                / F.least(F.col("vol"), F.col("vt") - F.col("vol")),
            ).otherwise(F.lit(1.0)),
        )
    )
    eligible = F.col("pos") <= max_size if max_size else F.lit(True)
    best = Window.orderBy(
        F.when(eligible, F.col("conductance")).otherwise(F.lit(float("inf"))),
        F.col("pos"),
    )
    return (
        swept.withColumn("_r", F.row_number().over(best))
        .withColumn(
            "best_pos", F.max(F.when(F.col("_r") == 1, F.col("pos"))).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        )
        .withColumn("in_community", F.col("pos") <= F.col("best_pos"))
        .select(
            "pos", "id", "ppr", "degree", "vol", "cut",
            "conductance", "in_community",
        )
    )
