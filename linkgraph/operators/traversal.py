"""Traversals: level-synchronous BFS, reachability, iterative SSSP.

The reference's own parallel BFS (graph.rs:1289-1341) is already
level-synchronous — Rayon fan-out per level, sequential merge — which
IS the Spark shape: frontier⋈edges per level (executors), visited-set
anti-join (shuffle), driver loop control. Its recursive DFS
(graph.rs:1015-1033) doesn't distribute order-preservingly; the
visit-SET semantics (all the reference tests assert beyond
start-first, lib.rs:124-127) is `reachable_from`. Dijkstra
(graph.rs:1054-1134) becomes Bellman-Ford-style iterative relaxation
with parent pointers for path reconstruction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import LineageChain, truncate_lineage
from linkgraph.plans.partitioning import stationary


def bfs_levels(
    graph: LinkGraph,
    start: int,
    max_depth: int = 10_000,
    direction_optimizing: bool = False,
    alpha: float = 4.0,
    beta: float = 24.0,
) -> DataFrame:
    """DataFrame(id, level): minimum hop distance from start, only
    reached vertices. Level ordering is the reference's only BFS
    guarantee (depth k before k+1).

    ``direction_optimizing`` enables Beamer's hybrid BFS (Beamer,
    Asanović & Patterson SC'12, the Graph500 web-graph optimization)
    recast for dataflow: the TOP-DOWN step's cost is the edges OUT of
    the frontier (on a web graph the middle levels touch nearly all
    of E, and every frontier∩in-neighbor hit becomes a shuffled row
    before the distinct), while the BOTTOM-UP step joins the
    UNVISITED set against a second dst-keyed stationary operand and
    semi-checks in-neighbors against the frontier — rows flowing =
    edges incident to the unvisited remainder, the (much smaller)
    other side of the asymmetry at peak levels. Switch heuristic on
    the known per-level counts: bottom-up while |frontier| >
    |unvisited| / alpha, back to top-down when |frontier| < |V| /
    beta — a vertex-count proxy loosely after Beamer SC'12 (the
    paper thresholds on EDGE counts, m_f vs m_u/alpha, with
    alpha=14, beta=24; edge-exact bookkeeping here would cost an
    extra degree join per level, so this parameterization is a
    different, cheaper heuristic than the one cited).
    Both steps compute the identical next level set, so the result is
    exactly plain BFS; the option only changes which operand the
    level's join reads. Costs one extra edge-operand cache (keyed
    dst) and one frontier count action per level.

    MEASURED (BENCH/BIGOPS.md bfs_diropt_zipf): on a 40M-edge
    5-level Zipf graph the hybrid is 2.7x SLOWER than plain top-down.
    The Graph500 win comes mostly from per-vertex early exit while
    probing in-neighbors, which a hash join cannot express: in
    dataflow the bottom-up step only wins when the unvisited
    remainder's incident edges are far fewer than the frontier's out
    edges AND the second operand cache amortizes — a narrow regime
    (very deep graphs with a long small-tail phase). Default stays
    False; the option is the honest ablation, not the recommended
    plan."""
    spark = graph.edges.sparkSession
    # stationary operands memoize on the immutable graph (the
    # pagerank pattern): repeat traversals on a standing graph skip
    # the operand build and shuffle
    edges = graph.operand(
        ("trav_src",),
        lambda: stationary(graph.sym_edges.select("src", "dst"), "src"),
    )
    e_dst = (
        graph.operand(
            ("trav_dst",),
            lambda: stationary(graph.sym_edges.select("src", "dst"), "dst"),
        )
        if direction_optimizing
        else None
    )
    verts = graph.vertices.select("id") if direction_optimizing else None
    n_v = verts.count() if direction_optimizing else 0
    visited = spark.createDataFrame([(int(start), 0)], "id long, level int")
    frontier = visited
    n_frontier, n_visited = 1, 1
    fchain, vchain = LineageChain(), LineageChain()
    depth = 0
    bottom_up = False
    while depth < max_depth:
        depth += 1
        if direction_optimizing:
            n_unvisited = n_v - n_visited
            if not bottom_up and n_frontier * alpha > n_unvisited:
                bottom_up = True
            elif bottom_up and n_frontier * beta < n_v:
                bottom_up = False
        if bottom_up:
            unvisited = verts.join(visited, "id", "left_anti")
            nxt_ids = (
                unvisited.join(e_dst, unvisited.id == e_dst.dst)
                .join(
                    frontier.select(F.col("id").alias("src")),
                    "src",
                    "left_semi",
                )
                .select(F.col("dst").alias("id"))
                .distinct()
            )
        else:
            nxt_ids = (
                frontier.join(edges, frontier.id == edges.src)
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited, "id", "left_anti")
            )
        # chain cuts per level: persist alone leaves a depth-deep
        # join/union nest in the logical plan, and the chain GCs the
        # previous level's trunc dir once this one is durable
        nxt = fchain.cut(nxt_ids.withColumn("level", F.lit(depth)))
        if direction_optimizing:
            n_frontier = nxt.count()
            empty = n_frontier == 0
        else:
            empty = nxt.limit(1).count() == 0
        if empty:
            break
        n_visited += n_frontier
        visited = vchain.cut(visited.unionAll(nxt))
        frontier = nxt
    fchain.release()
    return visited


def reachable_from(graph: LinkGraph, start: int) -> DataFrame:
    """Visit set of DFS/BFS from start (id column only)."""
    return bfs_levels(graph, start).select("id")


def shortest_paths(
    graph: LinkGraph,
    source: int,
    max_iter: int = 200,
    weight_expr=None,
) -> DataFrame:
    """Single-source shortest path lengths + parent pointers by
    frontier-based iterative relaxation: DataFrame(id, dist, via).
    Weighted, non-negative weights assumed (same contract as the
    reference's Dijkstra). ``weight_expr``: optional Column/str
    evaluated against the edge row as the weight — the reference's
    weight-closure parameter (graph.rs:1054-1061), e.g.
    ``F.get_json_object("attrs", "$.cost")``.

    Only vertices improved in round i-1 relax their out-edges in
    round i (Bellman-Ford with a frontier) — after the wavefront
    passes, later rounds touch a vanishing fraction of the graph
    instead of re-joining every settled vertex against the full edge
    table. The per-round frontier⋈edges join is the only big shuffle;
    the merge keys both sides by id."""
    spark = graph.edges.sparkSession
    if weight_expr is None:
        wcol = F.col("weight")
    elif isinstance(weight_expr, str):
        wcol = F.col(weight_expr)
    else:
        wcol = weight_expr
    def _build_edges():
        return stationary(
            graph.sym_edges.select("src", "dst", wcol.cast("double").alias("w")),
            "src",
        )

    edges_memo = weight_expr is None
    edges = (
        graph.operand(("sssp_edges",), _build_edges)
        if edges_memo
        else _build_edges()
    )
    state = spark.createDataFrame(
        [(int(source), 0.0, None)], "id long, dist double, via long"
    )
    frontier = state
    mchain = LineageChain()
    cached: list[DataFrame] = []
    cut_every = 3
    for r in range(max_iter):
        cand = (
            frontier.join(edges, frontier.id == edges.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("w")).alias("nd"),
                F.col("src").alias("nvia"),
            )
            .groupBy("id")
            .agg(F.min_by(F.struct("nd", "nvia"), F.struct("nd", "nvia")).alias("m"))
            .select("id", F.col("m.nd").alias("nd"), F.col("m.nvia").alias("nvia"))
        )
        plan = (
            state.join(cand, "id", "full")
            .select(
                "id",
                F.when(
                    F.col("dist").isNull() | (F.col("nd") < F.col("dist")),
                    F.struct(F.col("nd").alias("dist"), F.col("nvia").alias("via"), F.lit(1).alias("chg")),
                )
                .otherwise(F.struct("dist", "via", F.lit(0).alias("chg")))
                .alias("s"),
            )
            .select("id", "s.dist", "s.via", "s.chg")
        )
        # Hard (parquet) lineage cut every cut_every rounds, persist in
        # between: the plan nests at most cut_every join levels (SURVEY
        # §4.2 risk #1 stays bounded) while the loop pays ONE driver
        # action per uncut round — the frontier count doubles as the
        # cache materialization (a filtered scan of a caching frame
        # still builds every partition it reads). Superseded caches are
        # released at each cut, AFTER the cut is durable, so no live
        # frame ever references a GC'd trunc dir.
        if (r + 1) % cut_every == 0:
            merged = mchain.cut(plan)
            for df in cached:
                df.unpersist()
            cached.clear()
            advanced = merged.filter("chg = 1").limit(1).count() > 0
        else:
            merged = plan.persist()
            cached.append(merged)
            advanced = merged.filter("chg = 1").count() > 0
        frontier = merged.filter("chg = 1").select("id", "dist", "via")
        state = merged.select("id", "dist", "via")
        if not advanced:
            break
    if cached:
        # rebase the result onto durable parquet before releasing the
        # caches it was built from
        state = mchain.cut(state)
        for df in cached:
            df.unpersist()
    if not edges_memo:
        edges.unpersist()
    return state


def dfs_preorder(graph: LinkGraph, start: int, max_nodes: int = 100_000) -> list[int]:
    """Exact preorder DFS (graph.rs:1015-1033) — the driver-side
    small-graph fallback SURVEY §2.5 commits to: exact visit ORDER is
    inherently sequential (the distributed answer is
    ``reachable_from``'s visit set), so collect the reachable
    adjacency and run an iterative stack DFS. Deterministic neighbor
    order: ascending id (the reference's HashMap order is
    nondeterministic; its tests only assert start-first + visit set,
    lib.rs:124-127). Raises on graphs over ``max_nodes``."""
    n = graph.vertices.count()
    if n > max_nodes:
        raise ValueError(
            f"exact preorder DFS is driver-side; graph has {n} > {max_nodes} "
            "nodes — use reachable_from (visit-set semantics) at scale"
        )
    adj: dict[int, list[int]] = {}
    for r in graph.sym_edges.select("src", "dst").collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    for k in adj:
        adj[k].sort()
    seen: set[int] = set()
    order: list[int] = []
    stack = [int(start)]
    while stack:
        u = stack.pop()
        if u in seen:
            continue
        seen.add(u)
        order.append(u)
        # push reversed so the smallest neighbor pops first
        for v in reversed(adj.get(u, [])):
            if v not in seen:
                stack.append(v)
    return order


def dijkstra_exact(
    graph: LinkGraph, source: int, target: int | None = None, max_nodes: int = 100_000
) -> dict[int, tuple[float, list[int]]]:
    """Exact binary-heap Dijkstra (graph.rs:1054-1134) — the
    driver-side small-graph fallback; the distributed path is
    ``shortest_paths`` (frontier relaxation). Returns
    {vertex: (cost, path)}; restricted to ``target`` when given
    (early exit, like the reference). Deterministic tie-break:
    (dist, vertex id)."""
    import heapq

    n = graph.vertices.count()
    if n > max_nodes:
        raise ValueError(
            f"exact Dijkstra is driver-side; graph has {n} > {max_nodes} nodes — "
            "use shortest_paths at scale"
        )
    adj: dict[int, list[tuple[int, float]]] = {}
    for r in graph.sym_edges.select("src", "dst", "weight").collect():
        adj.setdefault(r["src"], []).append((r["dst"], float(r["weight"])))
    dist: dict[int, float] = {int(source): 0.0}
    prev: dict[int, int | None] = {int(source): None}
    heap: list[tuple[float, int]] = [(0.0, int(source))]
    settled: set[int] = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in settled:
            continue
        settled.add(u)
        if target is not None and u == target:
            break
        for v, w in sorted(adj.get(u, [])):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, v))

    def path_to(v: int) -> list[int]:
        out = []
        node: int | None = v
        while node is not None:
            out.append(node)
            node = prev[node]
        return out[::-1]

    keys = [target] if target is not None and target in dist else (
        [] if target is not None else list(dist)
    )
    return {k: (dist[k], path_to(k)) for k in keys}


def reconstruct_path(
    dists: DataFrame,
    source: int,
    target: int,
    max_len: int = 10_000,
    collect_threshold: int = 100_000,
) -> tuple[list[int], float] | None:
    """Path [source..target] + cost from a parent-pointer frame
    (id, dist, via).

    Small frames (< 100k rows) collect once and walk in the driver —
    the same asymmetry Dijkstra's ``prev`` map exploits
    (graph.rs:1098-1109). Large frames use POINTER DOUBLING over the
    parent table: per round, the known chain segment from ``target``
    extends by jumping ``2^k`` parents at once (one join against the
    doubled pointer table), so a length-L path materializes in
    ⌈log₂ L⌉ rounds — a handful of small Spark jobs per round (the
    lineage-cut write plus AQE's per-shuffle sub-jobs, ~90 total for
    a 10k-hop path) instead of the ~10k point-lookup jobs a per-hop
    walk costs.
    The doubled pointer table stays V-rows; the chain frame stays
    ≤ path-length rows."""
    lookup = {r["id"]: (r["dist"], r["via"]) for r in
              dists.filter(F.col("id").isNotNull()).collect()} if dists.count() < collect_threshold else None
    path: list[int] = []
    node = target
    if lookup is not None:
        if target not in lookup:
            return None
        cost = lookup[target][0]
        while node is not None and len(path) < max_len:
            path.append(node)
            node = lookup[node][1]
        return path[::-1], cost
    # large-graph path: pointer doubling, O(log path-length) jobs
    rows = dists.filter(F.col("id") == target).take(1)
    if not rows:
        return None
    cost = rows[0]["dist"]
    spark = dists.sparkSession
    chain = LineageChain()
    # combined per-round frame: kind 'd' rows = the 2^k-step pointer
    # table (id → ancestor 2^k hops up, source's NULL via drops out),
    # kind 's' rows = chain members as (node, hops-from-target)
    d0 = dists.filter(F.col("via").isNotNull()).select(
        F.lit("d").alias("kind"), "id", F.col("via").alias("anc"),
        F.lit(None).cast("long").alias("hops"),
    )
    s0 = spark.createDataFrame([(int(target), 0)], "id long, hops long").select(
        F.lit("s").alias("kind"), "id", F.lit(None).cast("long").alias("anc"), "hops"
    )
    cur = chain.cut(d0.unionByName(s0))
    step, n_chain = 1, 1
    while step < max_len:
        d = cur.filter(F.col("kind") == "d").select("id", "anc")
        s = cur.filter(F.col("kind") == "s").select("id", "hops")
        # extend the chain by one 2^k jump from every known member
        # (dedup keeps the first-discovered = minimal hops per node)
        ext = (
            s.join(d, "id")
            .select(F.col("anc").alias("id"), (F.col("hops") + step).alias("hops"))
            .filter(F.col("hops") < max_len)
        )
        s_new = (
            s.unionByName(ext)
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
            .select(F.lit("s").alias("kind"), "id",
                    F.lit(None).cast("long").alias("anc"), "hops")
        )
        # double the pointer table: anc' = anc(anc), 2^(k+1) hops up
        d2 = (
            d.alias("a")
            .join(d.alias("b"), F.col("a.anc") == F.col("b.id"))
            .select(F.lit("d").alias("kind"), F.col("a.id").alias("id"),
                    F.col("b.anc").alias("anc"),
                    F.lit(None).cast("long").alias("hops"))
        )
        cur = chain.cut(d2.unionByName(s_new))
        n_new = cur.filter(F.col("kind") == "s").count()
        if n_new == n_chain:
            break  # no extension possible — source (NULL via) reached
        n_chain = n_new
        step *= 2
    members = (
        cur.filter(F.col("kind") == "s").orderBy(F.col("hops").desc()).collect()
    )
    chain.release()
    return [int(r["id"]) for r in members], cost
