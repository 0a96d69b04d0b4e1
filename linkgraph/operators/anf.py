"""Approximate neighborhood function (ANF / HyperBall family).

The reference's only distance-profile surface is exact APSP
(`/root/reference/benchmarks/src/benchmark_networkx.py:206-210`,
``all_pairs_shortest_path``) — O(V·E) work and O(V²) output, fatal at
web scale. The scale path for "how big is the h-ball around every
vertex / what is the effective diameter" is probabilistic counting:
one Flajolet–Martin bit sketch per vertex, OR-merged along edges each
round (Palmer/Gibbons/Faloutsos ANF, Boldi/Vigna HyperBall — public
papers). Per round the plan is ONE co-partitioned state⋈edges join +
ONE map-side-combined ``bit_or`` aggregation — identical shuffle
shape to a PageRank iteration, so everything the engine knows about
stationary operands applies unchanged.

Determinism: sketch bits derive from ``md5(id:​j:seed)`` (no RNG), so
runs — and the DuckDB oracle, which replays the same bit arithmetic —
reproduce exactly. Estimates use the classic FM correction
``2^R / 0.77351`` averaged over ``n_sketches`` independent sketches;
relative error ~ 0.78/sqrt(n_sketches). Like all FM estimators it is
biased HIGH for tiny cardinalities (ball size ≲ 4, i.e. h=0 rows);
from h≥1 on realistic graphs the estimate lands within a few percent
(tests/test_anf.py pins the band).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import LineageChain, PeelCheckpoint
from linkgraph.plans.partitioning import stationary

PHI = 0.77351  # Flajolet–Martin small-range correction constant


def _sketch_cols(n_sketches: int, seed: int) -> list[str]:
    """SQL expressions building the h=0 sketch columns s0..s{r-1}:
    one FM bit per (vertex, sketch) pair, bit index = number of
    trailing zeros of a 60-bit md5-derived hash (geometric with
    p=1/2), capped at 59 so the single-long sketch never overflows."""
    cols = []
    for j in range(n_sketches):
        h = (
            "cast(conv(substring(md5(concat(cast(id as string), "
            f"':{j}:{seed}')), 1, 15), 16, 10) as bigint)"
        )
        cols.append(
            f"shiftleft(1L, cast(least(59, bit_count(({h} & -{h}) - 1)) as int)) as s{j}"
        )
    return cols


def _rho_expr(n_sketches: int) -> str:
    """Sum over sketches of R_j = index of the lowest UNSET bit of
    s_j (trailing ones), the FM register: bit_count of the mask below
    the lowest zero bit ``(~s) & (s+1)``."""
    terms = [f"bit_count(((~s{j}) & (s{j} + 1)) - 1)" for j in range(n_sketches)]
    return " + ".join(terms)


def _pow_expr(n_sketches: int) -> str:
    terms = [
        f"shiftleft(1L, cast(bit_count(((~s{j}) & (s{j} + 1)) - 1) as int))"
        for j in range(n_sketches)
    ]
    return " + ".join(terms)


@dataclass
class ANFResult:
    """``stats``: DataFrame(h, vertices, sum_rho, sum_pow, est_pairs)
    — one row per radius 0..max_h; ``sum_rho``/``sum_pow`` are
    integer-exact sketch digests (oracle-comparable), ``est_pairs``
    the FM estimate of Σ_v |ball(v, h)|. ``sketches``: the final
    per-vertex sketch frame (id, s0..)."""

    stats: DataFrame
    sketches: DataFrame
    rounds_run: int


def neighborhood_function(
    graph: LinkGraph,
    max_h: int = 8,
    n_sketches: int = 8,
    seed: int = 0,
    direction: str = "out",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> ANFResult:
    """Estimate the neighborhood function N(h) = Σ_v |ball(v, h)| for
    h = 0..max_h.

    ``direction``: "out" counts vertices REACHABLE from v in ≤ h hops,
    "in" vertices that reach v, "und" ignores orientation. Once the
    sketches reach a fixpoint (diameter exhausted) the remaining rows
    repeat the converged values — N(h) is constant past the diameter —
    without running further joins.

    ``checkpoint_dir``/``checkpoint_every``: durable per-round commits
    (sketch frame + the accumulated per-h digests) via PeelCheckpoint;
    a restarted call with the same dir resumes at the next radius —
    including EXTENDING a finished run to a larger ``max_h`` without
    recomputing the completed rounds."""
    spark = graph.edges.sparkSession
    r = int(n_sketches)
    if direction == "out":
        edges = graph.edges.select("src", "dst")
    elif direction == "in":
        edges = graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "und":
        fwd = graph.edges.select("src", "dst")
        edges = fwd.unionAll(
            graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:  # pragma: no cover - guarded API
        raise ValueError(f"direction must be out|in|und, got {direction!r}")
    edges = edges.filter(F.col("src") != F.col("dst")).distinct()
    # gather joins on state.id == edges.dst every round: publish that
    # partitioning once so the edge operand never re-shuffles.
    edges = stationary(edges, key="dst")

    chain = LineageChain()
    state = graph.vertices.selectExpr("id", *_sketch_cols(r, seed))
    state = chain.cut(state)

    stat_cols = [
        F.count("*").alias("vertices"),
        F.sum(F.expr(_rho_expr(r))).alias("sum_rho"),
        F.sum(F.expr(_pow_expr(r))).alias("sum_pow"),
        F.sum(
            F.pow(F.lit(2.0), F.expr(_rho_expr(r)) / F.lit(float(r))) / F.lit(PHI)
        ).alias("est_pairs"),
    ]

    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    rows: list[tuple] = []
    start_h = 1
    if ckpt and resume:
        meta = ckpt.latest()
        if meta is not None:
            state = ckpt.load(meta)["state"]
            rows = [
                (int(r[0]), int(r[1]), int(r[2]), int(r[3]), float(r[4]))
                for r in meta["extra"]["rows"]
            ]
            start_h = meta["round"] + 1
    if not rows:
        row0 = state.agg(*stat_cols).collect()[0]
        rows.append((0, row0.vertices, row0.sum_rho, row0.sum_pow, float(row0.est_pairs)))

    rounds_run = start_h - 1
    for h in range(start_h, max_h + 1):
        gathered = (
            edges.join(state, edges["dst"] == state["id"])
            .groupBy(edges["src"].alias("gid"))
            .agg(*[F.expr(f"bit_or(s{j})").alias(f"g{j}") for j in range(r)])
        )
        # a vertex changed iff a gathered sketch carries a bit its own
        # sketch lacks — computable inside the merge select, so the
        # fixpoint test costs no extra join or pass.
        chg = F.expr(
            " or ".join(f"(coalesce(g{j}, 0L) & ~s{j}) != 0" for j in range(r))
        )
        merged = state.join(gathered, state["id"] == gathered["gid"], "left").select(
            state["id"],
            *[
                (state[f"s{j}"].bitwiseOR(F.coalesce(gathered[f"g{j}"], F.lit(0)))).alias(
                    f"s{j}"
                )
                for j in range(r)
            ],
            chg.cast("int").alias("chg"),
        )
        merged = chain.cut(merged)
        # one action per round: the h-level digest plus the fixpoint test
        stat_row = merged.agg(*stat_cols, F.sum("chg").alias("changed")).collect()[0]
        rows.append(
            (h, stat_row.vertices, stat_row.sum_rho, stat_row.sum_pow, float(stat_row.est_pairs))
        )
        state = merged.drop("chg")
        rounds_run = h
        if ckpt and checkpoint_every and h % checkpoint_every == 0:
            ckpt.commit(h, {"state": state}, extra={"rows": rows})
        if stat_row.changed == 0:
            # past the diameter: N is constant — replicate, don't compute
            for hh in range(h + 1, max_h + 1):
                rows.append(
                    (hh, stat_row.vertices, stat_row.sum_rho, stat_row.sum_pow, float(stat_row.est_pairs))
                )
            break

    edges.unpersist()
    stats = spark.createDataFrame(
        rows, "h INT, vertices BIGINT, sum_rho BIGINT, sum_pow BIGINT, est_pairs DOUBLE"
    )
    return ANFResult(stats=stats, sketches=state, rounds_run=rounds_run)


def effective_diameter(result: ANFResult, q: float = 0.9) -> int:
    """Smallest h whose estimated N(h) reaches a fraction ``q`` of
    N(max_h) — the standard effective-diameter readout of ANF."""
    rows = sorted(result.stats.collect(), key=lambda x: x["h"])
    target = q * rows[-1]["est_pairs"]
    for row in rows:
        if row["est_pairs"] >= target:
            return int(row["h"])
    return int(rows[-1]["h"])  # pragma: no cover - q <= 1 always hits


def effective_diameter_table(result: ANFResult, q: float = 0.9) -> DataFrame:
    """``effective_diameter`` as a 1-row DataFrame(eff_diameter) —
    the contract-comparable form: estimates round to 6 dp BEFORE the
    threshold test (both engines then compare identical doubles, so
    the h readout replays exactly in SQL), and nothing collects."""
    st = result.stats.select("h", F.round("est_pairs", 6).alias("e"))
    mx = st.agg(F.max("e").alias("m"))
    return (
        st.crossJoin(mx)
        .filter(F.col("e") >= F.lit(q) * F.col("m"))
        .agg(F.min("h").cast("int").alias("eff_diameter"))
    )


def hyperball_centralities(
    graph: LinkGraph,
    max_h: int = 8,
    n_sketches: int = 8,
    seed: int = 0,
    direction: str = "in",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """HyperBall centralities (Boldi & Vigna, "In-Core Computation of
    Geometric Centralities with HyperBall", ICDMW 2013): per-vertex
    APPROXIMATE harmonic centrality, sum-of-distances and closeness
    for EVERY vertex in O(diameter) rounds — where exact closeness
    costs one multi-source traversal per source and is hopeless for
    "all vertices" at web scale. The ball-size deltas fall out of the
    same FM sketches ``neighborhood_function`` propagates:

        harmonic(v)  = Σ_{h≥1} (|B(v,h)| - |B(v,h-1)|) / h
        dist_sum(v)  = Σ_{h≥1} (|B(v,h)| - |B(v,h-1)|) · h
        closeness(v) = (|B(v,∞)| - 1) / dist_sum(v)   (0 when isolated)

    with |B| the FM estimate (2^(Σρ/r)/φ). Sketch bits only ever OR
    in, so the per-vertex estimate is monotone and the deltas are
    nonnegative by construction — no clamping. ``direction`` defaults
    to "in": counting vertices that REACH v gives the standard
    d(u, v)-oriented centralities on a directed graph ("out" scores
    the reverse; "und" ignores orientation).

    Returns DataFrame(id, rho_sum, reachable_est, harmonic_est,
    dist_sum_est, closeness_est): ``rho_sum`` is the integer-exact
    final sketch digest (the oracle anchor); the estimates carry the
    usual FM relative error ~0.78/sqrt(n_sketches).

    Plan: identical shuffle shape to ``neighborhood_function`` — one
    co-partitioned gather join + one bit_or agg per round — plus
    three carried double columns; ONE action total (no per-round
    collect: the fixpoint test rides the accumulators, and rounds are
    bounded by ``max_h``).

    ``checkpoint_dir``/``checkpoint_every``: durable per-round
    commits of the single state frame (sketches + accumulators) via
    PeelCheckpoint — the north-rule resumability contract, same as
    ``neighborhood_function``: a restarted call with the same dir
    resumes at the next radius, including extending a finished run to
    a larger ``max_h``.
    """
    spark = graph.edges.sparkSession
    r = int(n_sketches)
    if direction == "in":
        edges = graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "out":
        edges = graph.edges.select("src", "dst")
    elif direction == "und":
        fwd = graph.edges.select("src", "dst")
        edges = fwd.unionAll(
            graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:  # pragma: no cover - guarded API
        raise ValueError(f"direction must be in|out|und, got {direction!r}")
    edges = edges.filter(F.col("src") != F.col("dst")).distinct()
    edges = stationary(edges, key="dst")

    est = F.pow(F.lit(2.0), F.expr(_rho_expr(r)) / F.lit(float(r))) / F.lit(PHI)

    chain = LineageChain()
    state = (
        graph.vertices.selectExpr("id", *_sketch_cols(r, seed))
        .withColumn("prev_est", est)
        .withColumn("harm", F.lit(0.0))
        .withColumn("dsum", F.lit(0.0))
    )
    state = chain.cut(state)

    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    start_h = 1
    if ckpt and resume:
        meta = ckpt.latest()
        if meta is not None:
            state = ckpt.load(meta)["state"]
            start_h = meta["round"] + 1

    for h in range(start_h, max_h + 1):
        gathered = (
            edges.join(state, edges["dst"] == state["id"])
            .groupBy(edges["src"].alias("gid"))
            .agg(*[F.expr(f"bit_or(s{j})").alias(f"g{j}") for j in range(r)])
        )
        merged = state.join(gathered, state["id"] == gathered["gid"], "left").select(
            state["id"],
            *[
                (state[f"s{j}"].bitwiseOR(F.coalesce(gathered[f"g{j}"], F.lit(0)))).alias(
                    f"s{j}"
                )
                for j in range(r)
            ],
            state["prev_est"],
            state["harm"],
            state["dsum"],
        )
        delta = (est - F.col("prev_est")).alias("_d")
        merged = merged.withColumn("_d", delta).select(
            "id",
            *[f"s{j}" for j in range(r)],
            est.alias("prev_est"),
            (F.col("harm") + F.col("_d") / F.lit(float(h))).alias("harm"),
            (F.col("dsum") + F.col("_d") * F.lit(float(h))).alias("dsum"),
        )
        state = chain.cut(merged)
        if ckpt and checkpoint_every and h % checkpoint_every == 0:
            ckpt.commit(h, {"state": state})

    out = state.select(
        "id",
        F.expr(_rho_expr(r)).cast("long").alias("rho_sum"),
        F.col("prev_est").alias("reachable_est"),
        F.col("harm").alias("harmonic_est"),
        F.col("dsum").alias("dist_sum_est"),
        F.when(F.col("dsum") > 0.0, (F.col("prev_est") - 1.0) / F.col("dsum"))
        .otherwise(F.lit(0.0))
        .alias("closeness_est"),
    )
    return out
