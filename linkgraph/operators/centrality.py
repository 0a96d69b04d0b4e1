"""Multi-source traversal + closeness centrality.

The reference's benchmark surface calls closeness/betweenness
centrality (/root/reference/benchmarks/src/benchmark_networkx_rs.rs:383-390,
benchmarks/src/benchmark_networkx.py:235-247) — both are n×SSSP at
heart, infeasible exactly at 10^12 vertices (SURVEY §2.5). The
scalable form is SAMPLED-source estimation: run a batched
multi-source BFS (source id rides along as a key column, so k
sources cost one frontier loop, not k), then aggregate per vertex.
With sources = all vertices this is exact and matches NetworkX;
with a sample it is the standard unbiased estimator.

Frontier rows are (source, id) pairs — the shuffle key spreads hot
vertices across sources, and each level is one join + one anti-join,
identical machinery to single-source BFS at k× row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from linkgraph.graph import LinkGraph
from linkgraph.operators.pagerank import _weight_col
from linkgraph.plans.iterate import ConvergenceError, LineageChain, truncate_lineage
from linkgraph.plans.partitioning import stationary


def multi_source_bfs(
    graph: LinkGraph,
    sources: DataFrame,
    max_depth: int = 10_000,
    reverse: bool = False,
) -> DataFrame:
    """Hop distances from every source: DataFrame(source, id, level),
    reached pairs only. ``sources``: DataFrame with an id column.

    Orientation: a FORWARD walk (reverse=False) from source u reaches
    v at d(u, v); grouping by the REACHED vertex v therefore yields
    v's incoming distances — exactly what directed closeness needs
    (closeness_centrality below uses reverse=False for this reason).
    ``reverse=True`` walks edges backwards, giving distances FROM the
    reached vertex TO the source (distance-to-source use cases)."""
    edges = graph.sym_edges.select("src", "dst")
    if reverse:
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = stationary(edges, "src")
    visited = sources.select(
        F.col(sources.columns[0]).cast("long").alias("source")
    ).select("source", F.col("source").alias("id"), F.lit(0).alias("level"))
    visited = visited.transform(truncate_lineage)
    frontier = visited
    fchain, vchain = LineageChain(), LineageChain()
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = fchain.cut(
            frontier.join(edges, frontier.id == edges.src)
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(visited, ["source", "id"], "left_anti")
            .withColumn("level", F.lit(depth))
        )
        if nxt.limit(1).count() == 0:
            break
        visited = vchain.cut(visited.unionAll(nxt))
        frontier = nxt
    edges.unpersist()
    fchain.release()
    return visited


def _relax(edges: DataFrame, sources: DataFrame, max_iter: int) -> DataFrame:
    """Shared Bellman-Ford frontier relaxation keyed by (source, id)
    over an ``edges(src, dst, w)`` frame (stationary by src):
    DataFrame(source, id, dist), reached pairs only. Raises
    ConvergenceError if the frontier is still non-empty after
    ``max_iter`` rounds — a silent exit here would return WRONG
    (unconverged) distances."""
    state = sources.select(
        F.col(sources.columns[0]).cast("long").alias("source")
    ).select("source", F.col("source").alias("id"), F.lit(0.0).alias("dist"))
    state = state.transform(truncate_lineage)
    frontier = state
    mchain = LineageChain()
    for _ in range(max_iter):
        cand = (
            frontier.join(edges, frontier.id == edges.src)
            .select(
                "source",
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("w")).alias("nd"),
            )
            .groupBy("source", "id")
            .agg(F.min("nd").alias("nd"))
        )
        merged = mchain.cut(
            state.join(cand, ["source", "id"], "full")
            .select(
                "source", "id",
                F.when(
                    F.col("dist").isNull() | (F.col("nd") < F.col("dist")),
                    F.struct(F.col("nd").alias("dist"), F.lit(1).alias("chg")),
                )
                .otherwise(F.struct("dist", F.lit(0).alias("chg")))
                .alias("s"),
            )
            .select("source", "id", "s.dist", "s.chg")
        )
        frontier = merged.filter("chg = 1").select("source", "id", "dist")
        state = merged.select("source", "id", "dist")
        if frontier.limit(1).count() == 0:
            return state
    raise ConvergenceError(
        f"multi-source relaxation did not converge in {max_iter} rounds"
    )


def multi_source_shortest_paths(
    graph: LinkGraph,
    sources: DataFrame,
    max_iter: int = 200,
    weight_expr: Column | str | None = None,
    reverse: bool = False,
) -> DataFrame:
    """Weighted distances from every source in one frontier loop:
    DataFrame(source, id, dist), reached pairs only. The weighted
    analog of ``multi_source_bfs``, generalizing ``shortest_paths``'
    Bellman-Ford frontier relaxation with the source id riding along
    as a key column — k sources cost one loop, not k (the batching
    the reference's weighted closeness/betweenness benchmarks imply,
    benchmarks/src/benchmark_networkx.py:235-247). Non-negative
    weights assumed (the reference's Dijkstra contract,
    graph.rs:1054-1061). ``weight_expr``: optional Column/str over
    the edge row (defaults to the weight column).

    Orientation matches multi_source_bfs: a forward walk reaches v at
    d(source, v); grouping by v gives incoming distances."""
    wcol = _weight_col(True, weight_expr)
    edges = graph.sym_edges.select("src", "dst", wcol.cast("double").alias("w"))
    if reverse:
        edges = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    edges = stationary(edges, "src")
    try:
        return _relax(edges, sources, max_iter)
    finally:
        edges.unpersist()


def closeness_centrality(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    wf_improved: bool = True,
    weighted: bool = False,
    weight_expr: Column | str | None = None,
) -> DataFrame:
    """Closeness: DataFrame(id, closeness).

    closeness(v) = (r-1) / Σ_u d(u,v) over the r vertices u that
    reach v; with ``wf_improved`` (NetworkX default) scaled by
    (r-1)/(n-1). Exact (= ``networkx.closeness_centrality``) when
    ``sources`` is None (all vertices); estimated from a source
    sample otherwise — at web scale pass a sampled source set.
    Directed graphs use incoming distance, like NetworkX.

    ``weighted``/``weight_expr`` switch the distance from hop count
    to weighted shortest-path length (the batched multi-source
    relaxation) — ``networkx.closeness_centrality(distance='weight')``
    semantics, the reference's weighted benchmark op
    (benchmark_networkx.py:235-247)."""
    n = graph.vertices.count()
    src = sources if sources is not None else graph.vertices.select("id")
    # forward walk from each source u reaches v at d(u, v); grouping
    # by the reached vertex v yields v's INCOMING distances — the
    # directed-closeness definition (see multi_source_bfs docstring)
    if weighted or weight_expr is not None:
        dists = multi_source_shortest_paths(
            graph, src, weight_expr=weight_expr
        ).select("source", "id", F.col("dist").alias("level"))
    else:
        dists = multi_source_bfs(graph, src, reverse=False)
    # exclude each source's own row; a zero-WEIGHT distance to a
    # distinct vertex still counts (NetworkX sums over all u != v)
    agg = dists.filter(F.col("source") != F.col("id")).groupBy("id").agg(
        F.sum("level").alias("dsum"), F.count("*").alias("r1")
    )
    scale = (F.col("r1") / F.col("dsum")) * (
        (F.col("r1") / F.lit(float(max(n - 1, 1)))) if wf_improved else F.lit(1.0)
    )
    return (
        graph.vertices.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.when(F.col("dsum").isNotNull(), scale).otherwise(F.lit(0.0)).alias("closeness"),
        )
    )


def harmonic_centrality(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    weighted: bool = False,
    weight_expr: Column | str | None = None,
) -> DataFrame:
    """Harmonic centrality: DataFrame(id, harmonic).

    harmonic(v) = Σ_{u != v} 1/d(u, v) over the sources u that reach
    v — the disconnect-robust closeness variant (unreachable pairs
    contribute 0 instead of poisoning the sum). Exact
    (= ``networkx.harmonic_centrality``) when ``sources`` is None;
    an unbiased estimator scaled by n_sources when sampled. Directed
    graphs use incoming distance, like NetworkX. Distances of exactly
    0 to a distinct vertex (zero-weight edges) are skipped, matching
    NetworkX's ``if d > 0`` guard.

    ``weighted``/``weight_expr``: hop count → weighted shortest-path
    length via the same batched multi-source relaxation closeness
    uses (``networkx.harmonic_centrality(distance='weight')``)."""
    src = sources if sources is not None else graph.vertices.select("id")
    if weighted or weight_expr is not None:
        dists = multi_source_shortest_paths(
            graph, src, weight_expr=weight_expr
        ).select("source", "id", F.col("dist").alias("level"))
    else:
        dists = multi_source_bfs(graph, src, reverse=False)
    agg = (
        dists.filter((F.col("source") != F.col("id")) & (F.col("level") > 0))
        .groupBy("id")
        .agg(F.sum(F.lit(1.0) / F.col("level")).alias("h"))
    )
    return (
        graph.vertices.select("id")
        .join(agg, "id", "left")
        .select("id", F.coalesce("h", F.lit(0.0)).alias("harmonic"))
    )


def eccentricity(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    weighted: bool = False,
    weight_expr: Column | str | None = None,
) -> DataFrame:
    """Eccentricity per source: DataFrame(id, eccentricity).

    ecc(u) = max_v d(u, v) over the vertices v REACHABLE from u
    (forward/outgoing distances) — equal to ``networkx.eccentricity``
    on (strongly) connected graphs, and the standard reachable-set
    generalization where NetworkX raises (an exception on
    disconnection doesn't distribute; callers who need the strict
    behavior check connectivity first). One batched multi-source
    frontier loop for all sources — k sources cost one loop, not k.
    ``sources``: optional id frame for a sampled estimate at web
    scale; None = all vertices (exact). ``weighted``/``weight_expr``
    switch hop count → weighted shortest-path length."""
    src = sources if sources is not None else graph.vertices.select("id")
    if weighted or weight_expr is not None:
        dists = multi_source_shortest_paths(
            graph, src, weight_expr=weight_expr
        ).select("source", F.col("dist").alias("level"))
    else:
        dists = multi_source_bfs(graph, src).select(
            "source", F.col("level").cast("double").alias("level")
        )
    # every source carries its own level-0 row, so the groupBy covers
    # all sources (isolated vertices get ecc 0, NetworkX's convention
    # for a single-vertex component)
    return dists.groupBy("source").agg(
        F.max("level").alias("eccentricity")
    ).select(F.col("source").alias("id"), "eccentricity")


def distance_summary(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    weighted: bool = False,
    weight_expr: Column | str | None = None,
) -> DataFrame:
    """Global distance metrics as ONE row: DataFrame(diameter,
    radius, n_center, n_periphery).

    diameter = max eccentricity, radius = min eccentricity, center/
    periphery = #vertices attaining radius/diameter — NetworkX's
    ``diameter``/``radius``/``center``/``periphery`` surface folded
    into a single aggregation over the eccentricity frame (exact on
    connected graphs; reachable-set semantics otherwise, see
    ``eccentricity``). One extra groupBy over the multi-source
    frontier output — no second traversal."""
    ecc = eccentricity(graph, sources, weighted, weight_expr)
    stats = ecc.agg(
        F.max("eccentricity").alias("diameter"),
        F.min("eccentricity").alias("radius"),
    )
    # 1-row broadcast rides into the scan; grouping by the two
    # constants keeps the whole thing a single map-side-combined agg
    return (
        ecc.join(F.broadcast(stats), how="cross")
        .groupBy("diameter", "radius")
        .agg(
            F.sum(
                F.when(F.col("eccentricity") == F.col("radius"), 1).otherwise(0)
            ).alias("n_center"),
            F.sum(
                F.when(F.col("eccentricity") == F.col("diameter"), 1).otherwise(0)
            ).alias("n_periphery"),
        )
        .select("diameter", "radius", "n_center", "n_periphery")
    )


def _brandes_forward(
    edges: DataFrame, sources: DataFrame, max_depth: int
) -> tuple[DataFrame, int]:
    """Batched shortest-path counting (Brandes forward pass): BFS per
    source with sigma accumulation. Returns (DataFrame(source, id,
    level, sigma), max_level). sigma(s,v) = number of shortest s→v
    paths = Σ sigma(s,u) over level-(d-1) predecessors u of v."""
    visited = sources.select(
        F.col(sources.columns[0]).cast("long").alias("source")
    ).select(
        "source", F.col("source").alias("id"), F.lit(0).alias("level"),
        F.lit(1.0).alias("sigma"),
    )
    visited = truncate_lineage(visited)
    frontier = visited
    fchain, vchain = LineageChain(), LineageChain()
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = fchain.cut(
            frontier.join(edges, frontier.id == edges.src)
            .select("source", F.col("dst").alias("id"), "sigma")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["source", "id"], "left_anti")
            .withColumn("level", F.lit(depth))
            .select("source", "id", "level", "sigma")
        )
        if nxt.limit(1).count() == 0:
            depth -= 1
            break
        visited = vchain.cut(visited.unionAll(nxt))
        frontier = nxt
    fchain.release()
    return visited, depth


def _brandes_forward_weighted(
    edges: DataFrame, sources: DataFrame, max_iter: int
) -> tuple[DataFrame, int, DataFrame, DataFrame]:
    """Weighted shortest-path counting for Brandes: Bellman-Ford
    frontier relaxation for distances, then sigma propagated over the
    shortest-path DAG in longest-path-level order (a DAG edge u→v
    has level(u) < level(v), so processing levels ascending finalizes
    every predecessor before its successors — the weighted analog of
    BFS levels, which weighted DAGs lack because edges can skip
    distance ranks).

    Returns (nodes(source, id, level, sigma), max_level,
    dag_by_src(source, src, dst, lev_dst) and dag_by_dst(source, src,
    dst, lev_src)) — the two DAG copies are cached hash-partitioned
    on the key their loop joins by ((source, src) for the sigma-up
    pass, (source, dst) for the delta-down pass) so the per-level
    loops only shuffle the state side. Caller unpersists both.

    DAG membership uses dist(u) + w == dist(v) within 1e-9 relative
    tolerance: the relaxation stores dist(v) as exactly one such sum,
    but ties along other equally-short paths can differ in the last
    ulp (integer-valued weights are exact). Requires positive
    weights — zero-weight cycles would make the "DAG" cyclic and the
    leveling loop raises ConvergenceError."""
    dist = _relax(edges, sources, max_iter).persist()

    # shortest-path DAG: (source, u→v) where dist(u) + w(u,v) = dist(v)
    du = dist.select("source", F.col("id").alias("src"), F.col("dist").alias("du"))
    dv = dist.select("source", F.col("id").alias("dst"), F.col("dist").alias("dv"))
    dag = (
        du.join(edges, "src")
        .join(dv, ["source", "dst"])
        .filter(
            F.abs(F.col("du") + F.col("w") - F.col("dv"))
            <= 1e-9 * F.greatest(F.lit(1.0), F.abs(F.col("dv")))
        )
        .select("source", "src", "dst")
    )
    dag_by_src0 = stationary(dag, ["source", "src"])

    # longest-path DAG levels via max-propagation (diameter-bounded)
    lev = sources.select(
        F.col(sources.columns[0]).cast("long").alias("source")
    ).select("source", F.col("source").alias("id"), F.lit(0).alias("level"))
    lev = lev.transform(truncate_lineage)
    lfront, lchain = lev, LineageChain()
    for _ in range(max_iter):
        cand = (
            lfront.join(
                dag_by_src0,
                (lfront.source == dag_by_src0.source) & (lfront.id == dag_by_src0.src),
            )
            .select(lfront.source, F.col("dst").alias("id"),
                    (F.col("level") + 1).alias("nl"))
            .groupBy("source", "id")
            .agg(F.max("nl").alias("nl"))
        )
        merged = lchain.cut(
            lev.join(cand, ["source", "id"], "full")
            .select(
                "source", "id",
                F.when(
                    F.col("level").isNull() | (F.col("nl") > F.col("level")),
                    F.struct(F.col("nl").alias("level"), F.lit(1).alias("chg")),
                )
                .otherwise(F.struct("level", F.lit(0).alias("chg")))
                .alias("s"),
            )
            .select("source", "id", "s.level", "s.chg")
        )
        lfront = merged.filter("chg = 1").select("source", "id", "level")
        lev = merged.select("source", "id", "level")
        if lfront.limit(1).count() == 0:
            break
    else:
        raise ConvergenceError(
            f"DAG leveling did not converge in {max_iter} rounds — "
            "zero-weight cycle on a shortest path?"
        )
    lev = lev.persist()
    max_level = lev.agg(F.max("level")).collect()[0][0] or 0

    # annotate DAG edges with src/dst levels; two copies, each cached
    # partitioned on the key its loop joins by
    lsrc = lev.select("source", F.col("id").alias("src"), F.col("level").alias("lev_src"))
    ldst = lev.select("source", F.col("id").alias("dst"), F.col("level").alias("lev_dst"))
    dag_lv = dag.join(lsrc, ["source", "src"]).join(ldst, ["source", "dst"])
    dag_by_src = stationary(
        dag_lv.select("source", "src", "dst", "lev_dst"), ["source", "src"]
    )
    dag_by_dst = stationary(
        dag_lv.select("source", "src", "dst", "lev_src"), ["source", "dst"]
    )
    dag_by_src0.unpersist()

    # sigma ascending levels: every DAG predecessor of a level-L node
    # sits at a strictly lower level, hence is already final
    nodes = (
        lev.filter(F.col("source") == F.col("id"))
        .select("source", "id", "level", F.lit(1.0).alias("sigma"))
        .transform(truncate_lineage)
    )
    schain = LineageChain()
    for L in range(1, max_level + 1):
        nxt = (
            dag_by_src.filter(F.col("lev_dst") == L)
            .alias("e")
            .join(
                nodes.alias("n"),
                (F.col("e.source") == F.col("n.source"))
                & (F.col("e.src") == F.col("n.id")),
            )
            .groupBy(F.col("e.source").alias("source"), F.col("e.dst").alias("id"))
            .agg(F.sum("n.sigma").alias("sigma"))
            .withColumn("level", F.lit(L))
            .select("source", "id", "level", "sigma")
        )
        nodes = schain.cut(nodes.unionAll(nxt))
    nodes = nodes.persist()
    nodes.count()
    dist.unpersist()
    lev.unpersist()
    return nodes, max_level, dag_by_src, dag_by_dst


def betweenness_centrality(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    normalized: bool = False,
    max_depth: int = 10_000,
    weighted: bool = False,
    weight_expr: Column | str | None = None,
) -> DataFrame:
    """Brandes betweenness centrality over hop-shortest paths:
    DataFrame(id, betweenness).

    Exact (= ``networkx.betweenness_centrality(G, normalized=...)``,
    unweighted) when ``sources`` is None; with a sampled source set it
    is the standard Brandes-subset estimator scaled by n/|S|. Backward
    dependency accumulation runs level-by-level as joins keyed by
    (source, id): delta(s,v) = Σ_{w: succ} sigma_v/sigma_w·(1+delta_w),
    accumulated from the deepest BFS level upward — the driver loop is
    bounded by the diameter, every step is partition-parallel.

    ``weighted``/``weight_expr`` switch the paths from hop-shortest to
    weight-shortest (= ``networkx.betweenness_centrality(weight=...)``,
    the reference's weighted benchmark op, benchmark_networkx.py:
    235-247): the forward pass becomes Bellman-Ford relaxation + sigma
    over the shortest-path DAG in longest-path-level order, and the
    backward pass joins each level's out-edges against the finished
    successor set (weighted DAG edges can skip levels, so successors
    live at ANY higher level, not just the next — see
    _brandes_forward_weighted). ~4 diameter-bounded driver loops
    instead of 2; at web scale pass a sampled source set. Positive
    weights required; parallel edges collapse to min weight."""
    n = graph.vertices.count()
    src = sources if sources is not None else graph.vertices.select("id")
    n_sources = src.count()
    if weighted or weight_expr is not None:
        return _betweenness_weighted(
            graph, src, n, n_sources, normalized, max_depth, weight_expr
        )
    edges = stationary(graph.sym_edges.select("src", "dst").distinct(), "src")
    dist, max_level = _brandes_forward(edges, src, max_depth)
    dist = dist.persist()

    spark = graph.edges.sparkSession
    cchain, dchain = LineageChain(), LineageChain()
    delta_done = spark.createDataFrame([], "source long, id long, delta double")
    # rows of the level currently holding finished deltas
    cur = (
        dist.filter(F.col("level") == max_level)
        .withColumn("delta", F.lit(0.0))
        .select("source", "id", "sigma", "delta")
        .persist()
    )
    for lev in range(max_level, 0, -1):
        prev = dist.filter(F.col("level") == lev - 1).select("source", "id", "sigma")
        contrib = (
            cur.alias("w")
            .join(edges.alias("e"), F.col("w.id") == F.col("e.dst"))
            .select(
                F.col("w.source").alias("source"),
                F.col("e.src").alias("pid"),
                ((F.lit(1.0) + F.col("w.delta")) / F.col("w.sigma")).alias("share"),
            )
            .groupBy("source", F.col("pid").alias("id"))
            .agg(F.sum("share").alias("share_sum"))
        )
        # dchain cut FIRST: it consumes cur, whose backing dir the
        # cchain cut below deletes once new_cur is materialized
        delta_done = dchain.cut(
            delta_done.unionAll(cur.select("source", "id", "delta"))
        )
        new_cur = cchain.cut(
            prev.join(contrib, ["source", "id"], "left")
            .select(
                "source", "id", "sigma",
                (F.coalesce("share_sum", F.lit(0.0)) * F.col("sigma")).alias("delta"),
            )
        )
        cur.unpersist()
        cur = new_cur.persist()
    delta_done = delta_done.unionAll(cur.select("source", "id", "delta"))

    # accumulate over sources, excluding the source's own row
    raw = (
        delta_done.filter(F.col("source") != F.col("id"))
        .groupBy("id")
        .agg(F.sum("delta").alias("b"))
    )
    scale = 1.0
    if not graph.directed:
        scale *= 0.5  # each unordered pair counted from both endpoints
    if n_sources < n:
        scale *= n / float(n_sources)  # subset-sampling estimator
    if normalized:
        denom = (n - 1) * (n - 2) if graph.directed else (n - 1) * (n - 2) / 2.0
        scale *= 1.0 / denom if denom > 0 else 1.0
    out = (
        graph.vertices.select("id")
        .join(raw, "id", "left")
        .select("id", (F.coalesce("b", F.lit(0.0)) * F.lit(scale)).alias("betweenness"))
    )
    cur.unpersist()
    dist.unpersist()
    edges.unpersist()
    return out


def _betweenness_weighted(
    graph: LinkGraph,
    src: DataFrame,
    n: int,
    n_sources: int,
    normalized: bool,
    max_iter: int,
    weight_expr: Column | str | None,
) -> DataFrame:
    """Weighted Brandes (see betweenness_centrality docstring)."""
    wcol = _weight_col(True, weight_expr)
    edges = stationary(
        graph.sym_edges.select("src", "dst", wcol.cast("double").alias("w"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w")),
        "src",
    )
    nodes, max_level, dag_by_src, dag_by_dst = _brandes_forward_weighted(
        edges, src, max_iter
    )

    # backward pass, levels descending: a level-L node's DAG successors
    # all sit at levels > L, hence are already in `finished`
    fchain = LineageChain()
    finished = (
        nodes.filter(F.col("level") == max_level)
        .select("source", "id", "sigma", F.lit(0.0).alias("delta"))
        .transform(truncate_lineage)
    )
    for L in range(max_level - 1, 0, -1):
        contrib = (
            dag_by_dst.filter(F.col("lev_src") == L)
            .alias("e")
            .join(
                finished.alias("f"),
                (F.col("e.source") == F.col("f.source"))
                & (F.col("e.dst") == F.col("f.id")),
            )
            .groupBy(F.col("e.source").alias("source"), F.col("e.src").alias("id"))
            .agg(
                F.sum((F.lit(1.0) + F.col("f.delta")) / F.col("f.sigma")).alias(
                    "share_sum"
                )
            )
        )
        new = (
            nodes.filter(F.col("level") == L)
            .join(contrib, ["source", "id"], "left")
            .select(
                "source", "id", "sigma",
                (F.coalesce("share_sum", F.lit(0.0)) * F.col("sigma")).alias("delta"),
            )
        )
        finished = fchain.cut(finished.unionAll(new))

    raw = (
        finished.filter(F.col("source") != F.col("id"))
        .groupBy("id")
        .agg(F.sum("delta").alias("b"))
    )
    scale = 1.0
    if not graph.directed:
        scale *= 0.5
    if n_sources < n:
        scale *= n / float(n_sources)
    if normalized:
        denom = (n - 1) * (n - 2) if graph.directed else (n - 1) * (n - 2) / 2.0
        scale *= 1.0 / denom if denom > 0 else 1.0
    out = (
        graph.vertices.select("id")
        .join(raw, "id", "left")
        .select(
            "id", (F.coalesce("b", F.lit(0.0)) * F.lit(scale)).alias("betweenness")
        )
    )
    out = out.persist()
    out.count()
    nodes.unpersist()
    dag_by_src.unpersist()
    dag_by_dst.unpersist()
    edges.unpersist()
    return out
