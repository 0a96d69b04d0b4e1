"""PageRank as partition-parallel SpMV — the flagship operator.

Matches NetworkX ``nx.pagerank(G, alpha=0.85, weight='weight')``
semantics exactly (the oracle the reference benchmarks against,
/root/reference/benchmarks/src/benchmark_networkx.py:217-222):

- contributions out-weight-normalized: rank(u) * w(u,v) / Σ_x w(u,x)
- dangling (no-out-edge) mass redistributed uniformly
- rank' = (1-α)/N + α·(Σ contribs + dangling_mass/N)
- stop when Σ|rank'-rank| < N·tol

Per iteration exactly ONE big shuffle (the contribution sum keyed by
dst); the ranks⋈edges join co-partitions when the edge table is
pre-partitioned by src (LinkGraph.partitioned), so at 1000 executors
the join is shuffle-free on the edge side and the edge table never
moves. Dangling mass and delta are tiny scalar aggs. Hub skew on the
dst-sum is handled by map-side partial aggregation + AQE; see
plans/skew.py for the explicit salting variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import IterationResult, iterate, truncate_lineage


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = True,
    personalization: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    truncate_every: int = 3,
) -> IterationResult:
    """Returns IterationResult whose state is DataFrame(id, rank).

    ``personalization``: optional DataFrame(id, p) — the teleport
    distribution (NetworkX ``personalization=`` semantics: normalized
    over the given vertices, unlisted vertices get 0; dangling mass
    also redistributes by p). None = uniform.
    """
    spark = graph.edges.sparkSession
    edges = graph.sym_edges
    vertices = graph.vertices.select("id")
    n = vertices.count()
    if n == 0:
        return IterationResult(state=spark.createDataFrame([], "id long, rank double"))

    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    out_sums = edges.groupBy("src").agg(F.sum(w).alias("out_w"))
    # Normalized transition edges: weight column becomes P(u→v).
    # Built once — the invariant operand of every iteration. The
    # parquet roundtrip UNDER the cache matters: persisting a frame
    # whose lineage contains AQE shuffles is fragile on long runs
    # (an evicted/lazily-missing cache partition recomputes through
    # shuffle files the cleaner may have already removed —
    # "shuffle_N.data does not exist"). With the roundtrip, any
    # recompute path is a durable parquet scan.
    trans = truncate_lineage(
        edges.join(out_sums, "src")
        .select("src", "dst", (w / F.col("out_w")).alias("p"))
    ).persist()
    # Vertex table with dangling flag (out-degree 0) and teleport
    # probability column, cached once.
    verts = (
        vertices.join(out_sums.select(F.col("src").alias("id")), "id", "left_semi")
        .withColumn("dangling", F.lit(False))
        .unionByName(
            vertices.join(out_sums.select(F.col("src").alias("id")), "id", "left_anti")
            .withColumn("dangling", F.lit(True))
        )
    )
    if personalization is None:
        verts = verts.withColumn("tp", F.lit(1.0 / n))
    else:
        pn = personalization.select("id", F.col("p").cast("double").alias("p"))
        psum = pn.agg(F.sum("p")).collect()[0][0]
        verts = verts.join(pn, "id", "left").withColumn(
            "tp", F.coalesce(F.col("p") / psum, F.lit(0.0))
        ).drop("p")
    verts = truncate_lineage(verts).persist()
    verts.count()

    # uniform start regardless of personalization (NetworkX nstart=None)
    init = verts.select("id", F.lit(1.0 / n).alias("rank"), "dangling", "tp")

    fixed_iters = tol < 0  # pagerank_fixed_iterations: skip the delta action

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        # dangling mass as an in-plan scalar (1-row cross join), no collect
        dangling = state.filter("dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contribs = (
            state.join(trans, state.id == trans.src)
            .select(F.col("dst").alias("id"), (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("csum"))
        )
        new = verts.join(contribs, "id", "left").crossJoin(F.broadcast(dangling)).select(
            "id",
            (
                F.lit(1.0 - alpha) * F.col("tp")
                + F.lit(alpha)
                * (F.coalesce(F.col("csum"), F.lit(0.0)) + F.col("dm") * F.col("tp"))
            ).alias("rank"),
            "dangling",
            "tp",
        )
        if fixed_iters:
            # no convergence check wanted: keep the plan lazy; the
            # iterate() driver's periodic lineage truncation bounds depth
            return new, float("inf")
        new = new.persist()
        delta = (
            new.join(state.select("id", F.col("rank").alias("old")), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"))
            .collect()[0]["d"]
        )
        state.unpersist()
        return new, float(delta)

    res = iterate(
        init,
        step,
        tol=n * tol,
        max_iter=max_iter,
        truncate_every=truncate_every,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        spark=spark,
    )
    res.state = res.state.select("id", "rank")
    trans.unpersist()
    verts.unpersist()
    return res


def pagerank_fixed_iterations(
    graph: LinkGraph,
    k: int,
    alpha: float = 0.85,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """Exactly-k-iteration PageRank (no convergence check) — the
    SQL-oracle-comparable variant (an unrolled k-deep plan matches a
    k-level recursive SQL exactly, up to float summation order).
    truncate_every=1: each state feeds TWO consumers next round
    (dangling agg + contributions), so without per-iteration
    materialization the join tree recomputes 2^depth times."""
    res = pagerank(
        graph, alpha=alpha, tol=-1.0, max_iter=k, truncate_every=1,
        personalization=personalization,
    )
    return res.state
