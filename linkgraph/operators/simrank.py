"""SimRank similarity via Monte-Carlo coupled reverse walks.

SimRank (Jeh & Widom, KDD 2002): two pages are similar when they are
pointed to by similar pages — s(u,v) is the expected value of
C^tau(u,v), where tau is the FIRST time two independent uniform
reverse random walks started at u and v occupy the same vertex at the
same step. The exact fixpoint is O(V^2) state — never materializable
at web scale — so the engine implements the fingerprint estimator of
Fogaras & Racz (WWW 2005, "Scaling link-based similarity search"):
draw ``samples`` coupled reverse-walk pairs per vertex pair and
average C^(first meeting step).

Reference parity: the reference has no SimRank (networkx-rust stops
at PageRank-family link analysis, src/lib.rs exports); this operator
extends the same link-analysis surface the reference benchmarks
(benchmarks/src/benchmark_networkx.py:217-222 runs the centrality
family) with the classic link-based *similarity* measure over the
identical edge-table model.

Scale shape (10^12 pages):
- the walk table is the deterministic counter-hash machinery of
  operators/walks.py run on the REVERSED graph — O(V * samples *
  length) rows, embarrassingly partition-parallel, no RNG state.
- the meeting join keys on (walk_no, step, vertex): with a query
  ``sources`` frame (the production mode — "find pages similar to
  these") the left side is tiny and broadcasts; the full V x V mode
  exists for small graphs / labeled oracles only and is documented
  as such. Hub meeting-cells fan out as O(walkers_at_hub^2) ONLY in
  all-pairs mode, which is exactly why the query-set mode is the
  scale path.
- determinism: the walk picks replay in ANSI SQL (portable md5
  counter hash, operators/walks.py docstring) and with a dyadic
  ``decay`` (0.5, 0.25, ...) the score sum is exact dyadic-rational
  arithmetic — the whole estimate is reproducible bit-for-bit across
  engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.walks import random_walks


def simrank_scores(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    decay: float = 0.5,
    walk_length: int = 5,
    samples: int = 4,
    seed: int = 42,
    top_k: int | None = None,
) -> DataFrame:
    """DataFrame(u, v, score): Monte-Carlo SimRank estimates.

    ``sources``: optional one-column frame of query vertex ids — the
    scale mode: only pairs (u in sources, v anywhere) are scored and
    the source-walk side of the meeting join broadcasts. Without it
    every co-walking pair is scored (small graphs / oracles only;
    emitted once per unordered pair as u < v).

    ``decay``: SimRank C in (0,1); dyadic values make the estimate
    exactly reproducible in SQL. ``samples`` coupled walk pairs per
    vertex pair; walkers at vertices with no in-neighbors stop (the
    random_walks convention — unmet walks contribute 0, matching the
    estimator's C^inf = 0). Pairs that never co-occur are absent
    (score 0 rows are not materialized). ``top_k``: keep the k
    highest-scoring v per u (ties broken by smaller v id, so the cut
    is deterministic and SQL-replayable).
    """
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0,1), got {decay}")
    if samples < 1 or walk_length < 1:
        raise ValueError("samples and walk_length must be >= 1")

    walks = random_walks(
        graph.reverse(),
        length=walk_length,
        walks_per_node=samples,
        seed=seed,
    ).filter(F.col("step") >= 1)

    if sources is not None:
        src_ids = sources.select(F.col(sources.columns[0]).alias("start_id"))
        # the explicit hint pins the build side: the |sources|·samples·
        # length walk rows are the hash table, the V-sized walk table
        # only streams (without it the optimizer is free to build the
        # big side — observed on small inputs)
        left = F.broadcast(walks.join(F.broadcast(src_ids), "start_id"))
        pair_filter = F.col("u") != F.col("v")
    else:
        left = walks
        pair_filter = F.col("u") < F.col("v")

    a, b = left.alias("a"), walks.alias("b")
    meetings = (
        a.join(
            b,
            (F.col("a.walk_no") == F.col("b.walk_no"))
            & (F.col("a.step") == F.col("b.step"))
            & (F.col("a.id") == F.col("b.id")),
        )
        .select(
            F.col("a.start_id").alias("u"),
            F.col("b.start_id").alias("v"),
            F.col("a.walk_no").alias("walk_no"),
            F.col("a.step").alias("step"),
        )
        .filter(pair_filter)
    )
    first_meet = meetings.groupBy("u", "v", "walk_no").agg(
        F.min("step").alias("t")
    )
    scores = first_meet.groupBy("u", "v").agg(
        (F.sum(F.pow(F.lit(float(decay)), F.col("t"))) / float(samples)).alias(
            "score"
        )
    )
    if top_k is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("v"))
        scores = (
            scores.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_k)
            .drop("rn")
        )
    return scores
