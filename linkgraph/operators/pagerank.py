"""PageRank as partition-parallel SpMV — the flagship operator.

Matches NetworkX ``nx.pagerank(G, alpha=0.85, weight='weight')``
semantics exactly (the oracle the reference benchmarks against,
/root/reference/benchmarks/src/benchmark_networkx.py:217-222):

- contributions out-weight-normalized: rank(u) * w(u,v) / Σ_x w(u,x)
- dangling (no-out-edge) mass redistributed by the teleport dist
- rank' = (1-α)·tp + α·(Σ contribs + dangling_mass·tp)
- stop when Σ|rank'-rank| < N·tol (raises ConvergenceError when the
  iteration budget runs out, like NetworkX's
  PowerIterationFailedConvergence)

Physical plan per iteration (the 100 TB shape):

- the transition table is built ONCE, hash-partitioned by ``src``
  and persisted — the EDGE data never moves again. The per-iteration
  ranks⋈trans join co-partitions (ranks come out of the previous
  iteration's groupBy("id") with the same hash partitioning), so the
  only shuffle per iteration is the contribution sum keyed by dst:
  O(V·P) pre-combined rows, not O(E).
- the convergence delta rides the rank update itself (old rank is a
  carried column) — ONE agg action per iteration, no second join.
- dangling mass is an in-plan 1-row broadcast, no collect.
- hub skew on the dst-sum: map-side partial aggregation covers the
  sum itself; ``salt_contribs`` adds an explicit two-level salted
  aggregation (plans/skew.salted_sum) for plans where partial agg
  degrades — "auto" turns it on when the max in-degree dominates
  the mean by 64x (degree-stats-driven switch, north-rule skew item).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import IterationResult, iterate, truncate_lineage
from linkgraph.plans.partitioning import broadcast_state_rows, shuffle_width
from linkgraph.plans.skew import salted_sum


def _weight_col(weighted: bool, weight_expr: Column | str | None) -> Column:
    """The reference takes weight closures ``Fn(&E) -> f64``
    (graph.rs:1054-1061) and duck-typed JSON extraction
    (layout.rs:38-52); our analog is a Column expression over the
    edge row — e.g. ``F.get_json_object("attrs", "$.cost")``."""
    if weight_expr is not None:
        expr = F.col(weight_expr) if isinstance(weight_expr, str) else weight_expr
        return expr.cast("double")
    return F.col("weight").cast("double") if weighted else F.lit(1.0)


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = True,
    weight_expr: Column | str | None = None,
    personalization: DataFrame | None = None,
    init_ranks: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    truncate_every: int = 3,
    salt_contribs: int | str = 0,
    on_exhaustion: str = "raise",
    rank_broadcast: bool | str = "auto",
    rank_broadcast_max: int = 50_000_000,
    rank_broadcast_auto_max: int | None = None,
) -> IterationResult:
    """Returns IterationResult whose state is DataFrame(id, rank).

    ``personalization``: optional DataFrame(id, p) — the teleport
    distribution (NetworkX ``personalization=`` semantics: normalized
    over the given vertices, unlisted vertices get 0; dangling mass
    also redistributes by p). None = uniform.

    ``weight_expr``: optional Column/str evaluated against the edge
    row as the weight (overrides ``weighted``) — the weight-closure
    parameter of the reference API.

    ``init_ranks``: optional DataFrame(id, rank) warm start (NetworkX
    ``nstart=`` semantics) — the incremental-update path: seed with
    yesterday's converged scores after a crawl delta and the power
    iteration re-converges in the few iterations the perturbation
    needs instead of from-uniform's dozens (tests/test_incremental.py
    measures the gap). Vertices missing from ``init_ranks`` (newly
    discovered pages) start at the uniform share; the vector is
    renormalized to sum 1, so any positive scale works. The fixpoint
    is start-independent — warm and cold runs agree to solver
    tolerance.

    ``salt_contribs``: 0 = plain groupBy (map-side combine handles
    hubs); int n = explicit n-salt two-level aggregation; "auto" =
    decide from the in-degree distribution.

    ``rank_broadcast``: the V≪E broadcast-SpMV plan (the north
    star's "broadcast-aware shuffle join"). The transition table is
    cached hash-partitioned by DST and the V-row rank frame is
    BROADCAST into the join each iteration: the ranks⋈edges join,
    the contribution sum (already dst-partitioned) and the rank
    update all run exchange-free — per-iteration shuffle bytes drop
    from O(E) to ZERO, at the cost of shipping V rows to every
    executor per iteration. Right when V·16B ≪ E·16B/executors
    (e.g. 10^7 vertices vs 10^8.5 edges); WRONG at 10^10+ vertices,
    so forcing it on is guarded by ``rank_broadcast_max`` (raises
    rather than silently OOMing the driver). The default ``"auto"``
    takes the broadcast plan when the estimated rank-frame size
    (V × 16 B) fits ``spark.sql.autoBroadcastJoinThreshold`` —
    literally the same judgment, and the same already-tuned knob, as
    Spark's own AQE broadcast conversion
    (plans/partitioning.broadcast_state_rows). With the engine
    session's 64 MB that is ~4M vertices — the regime where the
    broadcast plan measured 3.1x over shuffle SpMV at 160M Zipf
    edges on local[32] (BENCH/BASELINE.md Job 4) — while Spark's
    stock 10 MB keeps untuned many-executor clusters conservative
    (per-round broadcast bytes scale with executor count; the
    crossover is topology-dependent, and on process-isolated
    executors broadcast measured a loss). Pass an int
    ``rank_broadcast_auto_max`` to pin the auto threshold
    explicitly.

    Repeat calls on the SAME graph object reuse the stationary
    transition/vertex operands via ``LinkGraph.operand`` (keyed by
    weighted/plan; skipped when ``weight_expr``/``personalization``
    make the operand call-specific), so a standing rank service —
    re-rank after a crawl delta, PPR sweeps, warm restarts — pays
    the build once. ``graph.release_operands()`` frees them."""
    spark = graph.edges.sparkSession
    edges = graph.sym_edges
    vertices = graph.vertices.select("id")
    n = graph.operand(("count", "vertices"), vertices.count)
    if n == 0:
        return IterationResult(state=spark.createDataFrame([], "id long, rank double"))
    # Partition the stationary transition table by DATA, capped at the
    # session's shuffle width: ~2M edge rows (~50 MB) per partition.
    # A fixed wide layout costs real scheduler floor per iteration on
    # small graphs (64 near-empty tasks × k iterations) while big
    # graphs hit the cap and behave like the shuffle setting.
    m = graph.operand(("count", "sym_edges"), edges.count)
    n_parts = max(1, min(
        shuffle_width(spark),
        (m + 1_999_999) // 2_000_000,
    ))

    w = _weight_col(weighted, weight_expr)
    out_sums = edges.groupBy("src").agg(F.sum(w).alias("out_w"))
    # Normalized transition edges: weight column becomes P(u→v).
    # Built once — the invariant operand of every iteration. The
    # parquet roundtrip UNDER the cache matters: persisting a frame
    # whose lineage contains AQE shuffles is fragile on long runs
    # (an evicted/lazily-missing cache partition recomputes through
    # shuffle files the cleaner may have already removed —
    # "shuffle_N.data does not exist"). With the roundtrip, any
    # recompute path is a durable parquet scan. The explicit
    # repartition(src) gives the cache HashPartitioning(src, P): the
    # per-iteration ranks⋈trans join then co-partitions and the edge
    # table NEVER re-shuffles — only the (small) rank frame moves.
    if rank_broadcast == "auto":
        auto_max = (
            rank_broadcast_auto_max
            if rank_broadcast_auto_max is not None
            else broadcast_state_rows(spark)
        )
        rank_broadcast = n <= auto_max
    if rank_broadcast and n > rank_broadcast_max:
        raise ValueError(
            f"rank_broadcast requires collecting the {n}-row vertex frame to "
            f"the driver each iteration (> rank_broadcast_max={rank_broadcast_max}); "
            "use the default shuffle plan at this vertex count"
        )
    # Broadcast plan partitions the stationary operand by DST so the
    # contribution sum needs no exchange; shuffle plan partitions by
    # SRC so the per-iteration ranks⋈trans join co-partitions.
    trans_key = "dst" if rank_broadcast else "src"

    def _build_trans() -> DataFrame:
        return (
            truncate_lineage(
                edges.join(out_sums, "src")
                .select("src", "dst", (w / F.col("out_w")).alias("p"))
            )
            .repartition(n_parts, trans_key)
            .persist()
        )

    # memoize the stationary operand on the graph object when it is a
    # pure function of the graph (a weight EXPRESSION is call-local —
    # Columns aren't stable cache keys); caller-specific operands are
    # built fresh and unpersisted on exit as before
    trans_memo = weight_expr is None
    trans = (
        graph.operand(("pr_trans", bool(weighted), trans_key, n_parts), _build_trans)
        if trans_memo
        else _build_trans()
    )

    if salt_contribs == "auto":
        # degree-stats-driven switch: explicit salting only when one
        # hub's in-degree dwarfs the mean (otherwise map-side combine
        # already bounds the per-reducer row count at V·P).
        stats = trans.groupBy("dst").agg(F.count("*").alias("d")).agg(
            F.max("d").alias("mx"), F.avg("d").alias("av")
        ).collect()[0]
        salt_contribs = 16 if (stats["mx"] or 0) > 64 * max(stats["av"] or 1.0, 1.0) else 0

    # Vertex table with dangling flag (out-degree 0) and teleport
    # probability column, cached once. The uniform-teleport variant is
    # a pure function of the graph — memoized like the transition
    # table; a personalization frame is call-local.
    verts = (
        vertices.join(out_sums.select(F.col("src").alias("id")), "id", "left_semi")
        .withColumn("dangling", F.lit(False))
        .unionByName(
            vertices.join(out_sums.select(F.col("src").alias("id")), "id", "left_anti")
            .withColumn("dangling", F.lit(True))
        )
    )
    verts_memo = personalization is None
    if personalization is None:
        verts = verts.withColumn("tp", F.lit(1.0 / n))
    else:
        pn = personalization.select("id", F.col("p").cast("double").alias("p"))
        psum = pn.agg(F.sum("p")).collect()[0][0]
        if psum is None or not (float(psum) > 0.0) or psum != psum or psum == float("inf"):
            raise ValueError(
                f"personalization must have a positive finite sum, got {psum} "
                "(empty/zero/NaN teleport distributions silently decay every "
                "rank to 0 — NetworkX raises here too)"
            )
        verts = verts.join(pn, "id", "left").withColumn(
            "tp", F.coalesce(F.col("p") / psum, F.lit(0.0))
        ).drop("p")

    def _build_verts(vframe: DataFrame = verts) -> DataFrame:
        out = truncate_lineage(vframe).repartition(n_parts, "id").persist()
        out.count()
        return out

    verts = (
        graph.operand(("pr_verts", n_parts), _build_verts)
        if verts_memo
        else _build_verts()
    )

    if init_ranks is None:
        # uniform start regardless of personalization (NetworkX nstart=None)
        init = verts.select("id", F.lit(1.0 / n).alias("rank"), "dangling", "tp")
    else:
        ir = init_ranks.select("id", F.col("rank").cast("double").alias("r0"))
        seeded = verts.join(ir, "id", "left").withColumn(
            "r0", F.coalesce("r0", F.lit(1.0 / n))
        )
        s0 = seeded.agg(F.sum("r0")).collect()[0][0]
        if s0 is None or not (float(s0) > 0.0) or s0 != s0 or s0 == float("inf"):
            raise ValueError(
                f"init_ranks must sum to a positive finite value, got {s0}"
            )
        init = seeded.select(
            "id", (F.col("r0") / F.lit(float(s0))).alias("rank"), "dangling", "tp"
        )

    fixed_iters = tol < 0  # pagerank_fixed_iterations: skip the delta action

    def step(state: DataFrame, i: int) -> tuple[DataFrame, float]:
        # dangling mass as an in-plan scalar (1-row cross join), no collect
        dangling = state.filter("dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = state.select("id", "rank")
        if rank_broadcast:
            # broadcast-hash join against the dst-partitioned operand:
            # no exchange for the join, none for the dst sum below
            ranks = F.broadcast(ranks)
        pre = ranks.join(trans, ranks.id == trans.src).select(
            F.col("dst").alias("id"), (F.col("rank") * F.col("p")).alias("c")
        )
        if salt_contribs:
            contribs = salted_sum(pre, "id", "c", "csum", n_salts=int(salt_contribs))
        else:
            contribs = pre.groupBy("id").agg(F.sum("c").alias("csum"))
        # old rank rides along as a column: delta needs no second join
        new = (
            state.select("id", F.col("rank").alias("_old"), "dangling", "tp")
            .join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - alpha) * F.col("tp")
                    + F.lit(alpha)
                    * (F.coalesce(F.col("csum"), F.lit(0.0)) + F.col("dm") * F.col("tp"))
                ).alias("rank"),
                "dangling",
                "tp",
                "_old",
            )
        )
        if fixed_iters:
            # no convergence check wanted: keep the plan lazy; the
            # iterate() driver's periodic lineage truncation bounds depth
            return new.drop("_old"), float("inf")
        new = new.persist()
        delta = new.agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d")).collect()[0]["d"]
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
        on_exhaustion="ok" if fixed_iters else on_exhaustion,
    )
    res.state = res.state.select("id", "rank")
    if not trans_memo:
        trans.unpersist()
    if not verts_memo:
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


def trustrank(
    graph: LinkGraph,
    seeds: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    **kwargs,
) -> IterationResult:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB'04): biased
    PageRank whose teleport distribution is uniform over a trusted
    seed set — the standard web-spam-demotion score over a host
    graph. Exactly ``pagerank`` with
    ``personalization = uniform(seeds)``; dangling mass also returns
    to the seeds, so trust never leaks to unreachable spam clusters.

    ``seeds``: DataFrame with an ``id`` column (extra columns
    ignored). Must be non-empty — an empty seed frame has no valid
    teleport distribution and raises (loud-failure policy).

    Inherits every ``pagerank`` scale lever (stationary cached
    transition table, broadcast-SpMV plan, salting switch) via
    ``**kwargs``.
    """
    p = seeds.select(F.col("id"), F.lit(1.0).alias("p")).distinct()
    if p.limit(1).count() == 0:
        raise ValueError("trustrank requires a non-empty seed set")
    return pagerank(
        graph, alpha=alpha, tol=tol, max_iter=max_iter,
        personalization=p, **kwargs,
    )


def personalized_pagerank_batch(
    graph: LinkGraph,
    seeds: DataFrame,
    k: int = 4,
    alpha: float = 0.85,
    weighted: bool = True,
    weight_expr: Column | str | None = None,
) -> DataFrame:
    """Batched sparse personalized PageRank — the "related pages"
    primitive: DataFrame(seed, id, rank) with one PPR vector per seed,
    all seeds advanced together through ``k`` power-iteration steps of
    x' = α·(Pᵀx + dangling(x)·δ_seed) + (1−α)·δ_seed from x₀ = δ_seed.
    As k→∞ each vector converges to
    ``pagerank(personalization={seed: 1})``'s fixpoint (init-
    independent); the fixed-k form is the SQL-oracle-comparable one.

    SPARSE by construction: the state carries only (seed, id) pairs
    with nonzero mass, i.e. each seed's ≤k-hop out-neighborhood —
    never |seeds|·V rows — so a 1000-seed batch on a web graph costs
    ~1000 bounded neighborhood expansions sharing ONE stationary
    src-partitioned transition operand. Per iteration: one
    co-partitioned state⋈trans join + one (seed, id) groupBy; the
    per-seed dangling mass folds back onto the seed row (NetworkX's
    personalized dangling redistribution for a δ teleport vector).
    ``seeds`` is DataFrame(seed) (a column of vertex ids).
    """
    from linkgraph.plans.iterate import LineageChain
    from linkgraph.plans.partitioning import stationary

    if k < 0:
        raise ValueError("k must be >= 0")
    w = _weight_col(weighted, weight_expr)
    e = graph.sym_edges.select("src", "dst", w.alias("w"))
    out_sums = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = stationary(
        e.join(out_sums, "src").select(
            "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
        ),
        "src",
    )
    srcs = trans.select("src").distinct()
    chain = LineageChain()
    state = chain.cut(
        seeds.select(F.col("seed"), F.col("seed").alias("id"), F.lit(1.0).alias("rank"))
    )
    teleport = seeds.select(
        F.col("seed"), F.col("seed").alias("id"), F.lit(1.0 - alpha).alias("r")
    )
    for _ in range(k):
        contrib = (
            state.join(trans, state.id == trans.src)
            .select(
                "seed",
                F.col("dst").alias("id"),
                (F.lit(alpha) * F.col("rank") * F.col("p")).alias("r"),
            )
        )
        dangling = (
            state.join(srcs, state.id == srcs.src, "left_anti")
            .groupBy("seed")
            .agg((F.lit(alpha) * F.sum("rank")).alias("r"))
            .select("seed", F.col("seed").alias("id"), "r")
        )
        state = chain.cut(
            contrib.unionAll(dangling)
            .unionAll(teleport)
            .groupBy("seed", "id")
            .agg(F.sum("r").alias("rank"))
        )
    trans.unpersist()
    return state


def blockrank(
    graph: LinkGraph,
    blocks: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    block_tol: float | None = None,
    **kwargs,
) -> IterationResult:
    """BlockRank (Kamvar/Haveliwala/Manning/Golub 2003, "Exploiting
    the Block Structure of the Web for Computing PageRank"): most web
    links are intra-host, so PageRank over the tiny host-level block
    graph, spread across each block's pages, is an excellent starting
    vector — the global power iteration converges to the SAME
    fixpoint (PageRank is start-independent) in a fraction of the
    iterations a cold uniform start needs. The classic two-level
    Common-Crawl production trick: a 10^8-host rank job is ~free next
    to a 10^12-page one, and every global iteration it saves is an
    O(E)-scan saved.

    ``blocks``: DataFrame(id, block) mapping vertices to blocks (the
    host of the page — any type; hashed to 64-bit block vertex ids).
    Vertices absent from ``blocks`` start at the uniform share (the
    ``init_ranks`` contract). Stage 1 runs ``pagerank`` on the
    block-collapsed graph (weight = summed page-level weight) to
    ``block_tol`` (default: same ``tol``); stage 2 distributes each
    block's rank uniformly over its pages (the paper's "local
    PageRank" refined here to the uniform intra-block start — the
    block mass placement is what drives the speedup) and runs the
    page-level ``pagerank`` from it. Every page-level scale lever
    (stationary transition cache, broadcast-SpMV, salting) passes
    through ``**kwargs``; the returned IterationResult's stats are
    the page-level iterations only, so the saving is measurable
    (tests/test_pagerank.py asserts warm <= cold and value equality).
    """
    bmap = blocks.select(
        F.col("id"),
        F.xxhash64(F.col("block").cast("string")).alias("b"),
    )
    e = graph.sym_edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    be = (
        e.join(bmap.withColumnRenamed("id", "src").withColumnRenamed("b", "bsrc"), "src")
        .join(bmap.withColumnRenamed("id", "dst").withColumnRenamed("b", "bdst"), "dst")
        .groupBy("bsrc", "bdst")
        .agg(F.sum("w").alias("weight"))
        .select(F.col("bsrc").alias("src"), F.col("bdst").alias("dst"), "weight")
    )
    bverts = bmap.select(F.col("b").alias("id")).distinct()
    bgraph = LinkGraph(be, bverts, directed=graph.directed)
    # truncate_every=1: the block stage is tiny (10^8 hosts at most)
    # and may run in fixed-iteration mode where each state feeds two
    # consumers per round — per-iteration materialization is the
    # pagerank_fixed_iterations discipline.
    brank = pagerank(
        bgraph, alpha=alpha, tol=block_tol if block_tol is not None else tol,
        max_iter=max_iter, truncate_every=1,
    ).state
    sizes = bmap.groupBy("b").agg(F.count("*").alias("n_pages"))
    init = (
        bmap.join(brank.withColumnRenamed("id", "b"), "b")
        .join(sizes, "b")
        .select("id", (F.col("rank") / F.col("n_pages")).alias("rank"))
    )
    return pagerank(
        graph, alpha=alpha, tol=tol, max_iter=max_iter,
        init_ranks=init, **kwargs,
    )
