"""Balanced label-propagation graph partitioning — assign every
vertex to one of ``n_parts`` balanced buckets while maximizing the
fraction of edges whose endpoints land together (edge locality), the
preprocessing step that turns a 100 TB web graph into a layout where
iterative algorithms (PageRank, WCC, BFS) shuffle a small fraction of
their edges instead of all of them. The algorithm is the
constrained-label-propagation family used at production scale:
balanced label propagation (Ugander & Backstrom WSDM'13, Facebook's
people-graph sharding) and Spinner (Martella et al. ICDE'17,
Giraph/Pregel partitioning) — vertices greedily adopt the partition
where most of their neighbors live, subject to per-partition capacity
caps.

Per round, entirely as dataflow:

  1. neighbor-partition counts: one state⋈edges join against the
     STATIONARY symmetrized operand (cached hash-partitioned by src —
     the per-round join never re-shuffles the edge table) + one
     (id, candidate-part) count, map-side combined.
  2. per-vertex argmax and the count of neighbors in the CURRENT
     partition in one aggregation (min_by struct idiom, no per-id
     window — a hub's candidate rows never funnel into one task).
  3. movers = vertices whose best partition beats their current one
     (gain = best_cnt − cur_cnt > 0, ties on partition id).
  4. capacity admission against cap = ceil(V/p · (1 + slack)), with
     remaining room R_t = max(0, cap − size_t) from a p-row driver
     agg. Two admission modes:
       * ``admission="rank"`` (default): arrivals to each target rank
         by (gain desc, id asc) and the top R_t win — a strict
         deterministic cap (sizes NEVER exceed cap once under it,
         since departures only free room). The ranking window
         partitions by target part: with small p and a huge
         first-round mover set this is the one potentially-hot stage,
         so at 10^9-vertex scale run the first rounds with
         ``admission="hash"`` and switch to "rank" to finish.
       * ``admission="hash"``: admit a mover iff
         md5(id, round) mod demand_t < R_t — no ranking anywhere,
         perfectly parallel, admits ≈ R_t arrivals in expectation
         (hash-binomial deviation; caps are soft by O(√demand)).
     Both modes are deterministic and parallelism-invariant.
  5. ONE LineageChain cut per round (via plans/iterate.iterate, which
     also provides durable checkpoint/resume and per-round
     moved-vertex stats).

Convergence: delta = admitted-move count; the loop stops at 0 moves
or ``max_iter`` (a partition at iteration budget is still a valid
partition — ``on_exhaustion="ok"`` semantics, unlike the
fixed-point operators that raise).

Every admitted move strictly increases the number of the mover's
edges that are co-located AT THE SNAPSHOT it was decided on;
simultaneous moves of adjacent vertices can still cross (the standard
synchronous-LPA caveat), which later rounds repair — the engine's
pytest asserts final locality ≥ hash-random locality on clustered
inputs, the replica asserts exact trajectory parity.

Reference scope: networkx-rust has no partitioner (single-process
adjacency maps need none); this operator exists for the 1000-executor
regime the north rule targets, where partition layout IS the
dominant cost of every downstream shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.functions.text import md5int_col
from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import IterationResult, iterate
from linkgraph.plans.partitioning import stationary


def _sym_edges(graph: LinkGraph) -> DataFrame:
    base = graph.edges.select("src", "dst")
    if graph.directed:
        return base.unionAll(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return graph.sym_edges.select("src", "dst")


def _init_part(n_parts: int, seed: int) -> F.Column:
    return (
        md5int_col(
            F.concat_ws(
                ":", F.lit("bp"), F.lit(str(int(seed))), F.col("id").cast("string")
            )
        )
        % F.lit(int(n_parts))
    ).cast("int")


def balanced_partition(
    graph: LinkGraph,
    n_parts: int,
    max_iter: int = 10,
    slack: float = 0.1,
    seed: int = 42,
    admission: str = "rank",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> IterationResult:
    """IterationResult, state = DataFrame(id, part) with part in
    [0, n_parts); per-round stats carry the admitted-move counts.
    See the module docstring for the algorithm, plan shape, the two
    admission modes and the capacity contract
    (cap = ceil(V / n_parts · (1 + slack)))."""
    if n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    if admission not in ("rank", "hash"):
        raise ValueError(f"admission must be 'rank' or 'hash', got {admission!r}")
    edges = stationary(_sym_edges(graph), "src")
    verts = graph.vertices.select("id")
    n_v = verts.count()
    cap = math.ceil(n_v / n_parts * (1.0 + slack))
    init = verts.select("id", _init_part(n_parts, seed).alias("part"))
    # Handle to the frame WE persisted last round. iterate() calls
    # unpersist() on whatever step returned — but we return a
    # projection of the persisted frame, whose logical plan differs,
    # so that call is a no-op and without this handle one cached
    # vertex-state frame would leak PER ROUND (exactly the
    # long-running regime this operator targets). The previous
    # round's cache is safe to drop at the START of the next step:
    # iterate's truncate_every=1 lineage cut has already materialized
    # the projection to parquet by then.
    persisted: list[DataFrame] = []

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        while persisted:
            persisted.pop().unpersist()
        counts = (
            state.join(edges, state.id == edges.src)
            .groupBy(F.col("dst").alias("id"), F.col("part").alias("cand"))
            .agg(F.count("*").alias("cnt"))
        )
        summ = (
            counts.join(state.withColumnRenamed("part", "cur"), "id")
            .groupBy("id")
            .agg(
                F.expr("min_by(cand, struct(-cnt, cand))").alias("best"),
                F.expr("min_by(cnt, struct(-cnt, cand))").alias("best_cnt"),
                F.max(
                    F.when(F.col("cand") == F.col("cur"), F.col("cnt"))
                ).alias("cur_cnt"),
                F.min("cur").alias("cur"),
            )
        )
        movers = summ.filter(
            (F.col("best") != F.col("cur"))
            & (F.col("best_cnt") > F.coalesce("cur_cnt", F.lit(0)))
        ).select(
            "id",
            "best",
            (F.col("best_cnt") - F.coalesce("cur_cnt", F.lit(0))).alias("gain"),
        )
        if admission == "hash":
            # the mover set feeds both the demand readout and the
            # admission filter — cache it so the counts⋈state
            # aggregation chain runs once per round
            movers = movers.persist()
        sizes = {
            int(r["part"]): int(r["n"])
            for r in state.groupBy("part").agg(F.count("*").alias("n")).collect()
        }
        room = {
            t: max(0, cap - sizes.get(t, 0)) for t in range(n_parts)
        }
        room_col = F.create_map(
            *[F.lit(x) for t in range(n_parts) for x in (t, room[t])]
        )[F.col("best")]
        if admission == "rank":
            w = Window.partitionBy("best").orderBy(F.col("gain").desc(), F.col("id"))
            admitted = (
                movers.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= room_col)
                .select("id", "best")
            )
        else:
            demand = {
                int(r["best"]): int(r["n"])
                for r in movers.groupBy("best").agg(F.count("*").alias("n")).collect()
            }
            dem_col = F.create_map(
                *[
                    F.lit(x)
                    for t in range(n_parts)
                    for x in (t, max(1, demand.get(t, 0)))
                ]
            )[F.col("best")]
            adm_hash = md5int_col(
                F.concat_ws(
                    ":",
                    F.lit("bpadm"),
                    F.lit(str(int(seed))),
                    F.lit(str(int(i))),
                    F.col("id").cast("string"),
                )
            )
            admitted = movers.filter(
                # admit all when there is room for the whole demand;
                # otherwise hash-thin to ≈ room/demand of the movers
                (dem_col <= room_col)
                | ((adm_hash % dem_col) < room_col)
            ).select("id", "best")
        new = (
            state.join(admitted, "id", "left")
            .select(
                "id",
                F.coalesce("best", F.col("part")).alias("part"),
                F.col("part").alias("_old"),
            )
            .persist()
        )
        # ONE action materializes the whole round's chain: the moved
        # count reads from the persisted frame, and iterate's lineage
        # cut re-reads the same cache
        moved = int(
            new.agg(
                F.count(F.when(F.col("part") != F.col("_old"), 1)).alias("m")
            ).collect()[0]["m"]
        )
        if admission == "hash":
            movers.unpersist()
        persisted.append(new)
        return new.select("id", "part"), float(moved)

    result = iterate(
        init,
        step,
        tol=0.0,
        max_iter=max_iter,
        truncate_every=1,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        on_exhaustion="ok",
    )
    # final round's cache: the result state is already lineage-cut
    # (truncate_every=1 → disk-backed parquet read), so dropping the
    # cache cannot force a recompute of the returned frame
    while persisted:
        persisted.pop().unpersist()
    edges.unpersist()
    return result


def edge_locality(graph: LinkGraph, parts: DataFrame) -> DataFrame:
    """1-row DataFrame(n_edges, colocated, locality): the fraction of
    (directed-view) edges whose endpoints share a partition under the
    (id, part) assignment ``parts`` — the objective
    ``balanced_partition`` maximizes and the number that prices every
    downstream co-partitioned join."""
    e = graph.edges.select("src", "dst")
    ps = parts.select(F.col("id").alias("src"), F.col("part").alias("_ps"))
    pd = parts.select(F.col("id").alias("dst"), F.col("part").alias("_pd"))
    return (
        e.join(ps, "src")
        .join(pd, "dst")
        .agg(
            F.count("*").alias("n_edges"),
            F.count(F.when(F.col("_ps") == F.col("_pd"), 1)).alias("colocated"),
        )
        .select(
            "n_edges",
            "colocated",
            F.when(
                F.col("n_edges") > 0, F.col("colocated") / F.col("n_edges")
            )
            .otherwise(F.lit(0.0))
            .alias("locality"),
        )
    )
