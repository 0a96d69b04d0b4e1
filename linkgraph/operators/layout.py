"""Graph layout operators (reference src/layout.rs, SURVEY.md §2.7).

circular / shell / spiral / random / rescale are pure column math —
a row_number and trigonometry, embarrassingly parallel. The force
layouts (spring/Fruchterman-Reingold, Kamada-Kawai) are O(n²)-dense
by nature (layout.rs:513-569, 679-853); the honest web-scale answer
is sample-then-local: collect a bounded subgraph and lay it out on
the driver (NetworkX when available). Positions: DataFrame(id, x, y).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkgraph.graph import LinkGraph

TWO_PI = 2.0 * math.pi


def _indexed(vertices: DataFrame) -> DataFrame:
    """Dense 0..n-1 rank by ascending id WITHOUT a global
    single-partition window (a Window.orderBy with no partitionBy
    funnels every vertex through one task — fine for a 30-node
    oracle, a scale-killer on a 10^8-vertex circle).

    Distributed zipWithIndex: bucket ids by their HIGH BITS (an
    arithmetic right shift is monotone, so bucket order = id order),
    rank within each bucket's window, and add per-bucket offsets
    from a tiny driver-side cumulative sum. For xxhash64 web ids the
    buckets are uniform by construction; for dense sequential ids
    the shift adapts to the observed id span. Two small driver
    actions (min/max, bucket counts); no single-reducer stage."""
    v = vertices.select("id")
    row = v.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect()[0]
    if row["lo"] is None:
        return v.withColumn("i", F.lit(0).cast("long"))
    span = int(row["hi"]) - int(row["lo"])
    # ≤ ~2048 ordered buckets over the observed span
    shift = max(0, span.bit_length() - 10)
    b = F.shiftright(F.col("id"), shift).alias("_b")
    counts = {
        r["_b"]: r["c"]
        for r in v.select(b).groupBy("_b").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("_b")]
    w = Window.partitionBy("_b").orderBy("id")
    return (
        v.select("id", b)
        .withColumn("i", F.row_number().over(w) - 1 + off)
        .drop("_b")
    )


def circular_layout(graph: LinkGraph, scale: float = 1.0, center=(0.0, 0.0)) -> DataFrame:
    """Equidistant points on a circle (layout.rs:220-254). Single
    vertex sits at center, matching the reference convention."""
    v = _indexed(graph.vertices)
    n = graph.vertices.count()
    if n == 0:
        return v.select("id", F.lit(0.0).alias("x"), F.lit(0.0).alias("y"))
    if n == 1:
        return v.select("id", F.lit(center[0]).alias("x"), F.lit(center[1]).alias("y"))
    theta = TWO_PI * F.col("i") / n
    return v.select(
        "id",
        (F.lit(scale) * F.cos(theta) + center[0]).alias("x"),
        (F.lit(scale) * F.sin(theta) + center[1]).alias("y"),
    )


def shell_layout(
    graph: LinkGraph, nlist: list[list[int]], scale: float = 1.0, center=(0.0, 0.0)
) -> DataFrame:
    """Concentric circles per shell (layout.rs:138-201): shell k has
    radius scale·(k+1)/nshells; one shell of one node sits at center."""
    spark = graph.edges.sparkSession
    rows = [(int(v), k) for k, shell in enumerate(nlist) for v in shell]
    shells = spark.createDataFrame(rows, "id long, shell int")
    nshells = len(nlist)
    w = Window.partitionBy("shell").orderBy("id")
    counts = shells.groupBy("shell").agg(F.count("*").alias("cnt"))
    v = shells.withColumn("j", F.row_number().over(w) - 1).join(counts, "shell")
    radius = F.lit(scale) * (F.col("shell") + 1) / nshells
    theta = TWO_PI * F.col("j") / F.col("cnt")
    return v.select(
        "id",
        F.when(F.col("cnt") == 1, F.lit(center[0]))
        .otherwise(radius * F.cos(theta) + center[0]).alias("x"),
        F.when(F.col("cnt") == 1, F.lit(center[1]))
        .otherwise(radius * F.sin(theta) + center[1]).alias("y"),
    )


def spiral_layout(
    graph: LinkGraph,
    scale: float = 1.0,
    center=(0.0, 0.0),
    resolution: float = 0.35,
    equidistant: bool = False,
) -> DataFrame:
    """Archimedean spiral (layout.rs:276-314)."""
    v = _indexed(graph.vertices)
    if equidistant:
        theta = F.lit(resolution) * F.sqrt(F.col("i").cast("double")) + 1.0
        r = F.sqrt(F.col("i").cast("double"))
    else:
        theta = F.lit(resolution) * F.col("i")
        r = F.col("i").cast("double")
    raw = v.select("id", (r * F.cos(theta)).alias("x"), (r * F.sin(theta)).alias("y"))
    return rescale_layout(raw, scale=scale, center=center)


def random_layout(graph: LinkGraph, seed: int = 42, scale: float = 1.0, center=(0.0, 0.0)) -> DataFrame:
    """Uniform positions in the unit square, seeded (layout.rs:621-643)."""
    v = graph.vertices.select("id")
    return v.select(
        "id",
        (F.lit(scale) * (F.rand(seed) * 2 - 1) + center[0]).alias("x"),
        (F.lit(scale) * (F.rand(seed + 1) * 2 - 1) + center[1]).alias("y"),
    )


def rescale_layout(pos: DataFrame, scale: float = 1.0, center=(0.0, 0.0)) -> DataFrame:
    """Center on the mean, scale max |coord| to ``scale``
    (layout.rs:81-119) — two aggs and a projection."""
    stats = pos.agg(F.avg("x").alias("mx"), F.avg("y").alias("my")).collect()[0]
    mx, my = stats["mx"] or 0.0, stats["my"] or 0.0
    lim_row = pos.agg(
        F.max(F.greatest(F.abs(F.col("x") - mx), F.abs(F.col("y") - my))).alias("lim")
    ).collect()[0]
    lim = lim_row["lim"] or 0.0
    k = scale / lim if lim > 0 else 1.0
    return pos.select(
        "id",
        ((F.col("x") - mx) * k + center[0]).alias("x"),
        ((F.col("y") - my) * k + center[1]).alias("y"),
    )


def kamada_kawai_layout(
    graph: LinkGraph,
    max_nodes: int = 2000,
    iterations: int = 300,
    scale: float = 1.0,
    center=(0.0, 0.0),
    weighted: bool = False,
) -> DataFrame:
    """Kamada-Kawai stress layout (reference layout.rs:679-853: APSP
    precompute + Newton steps on the stress function) via the survey's
    sample-then-local policy (§2.7): APSP is O(n²) output by nature,
    so the layout runs driver-side on a bounded subgraph — at web
    scale you lay out a sampled neighborhood, not the crawl.

    Driver-side implementation: APSP (numpy over the collected edge
    list), then gradient descent on the KK stress
    E = Σ_{i<j} (|p_i-p_j| - d_ij)² / d_ij², deterministic circular
    init (the reference's own init, layout.rs:714-721). No scipy
    dependency.

    ``weighted=True`` uses WEIGHTED shortest-path distances (heap
    Dijkstra per source; parallel edges collapse to min weight) —
    the reference's KK distance semantics through its WeightExtractor
    (layout.rs:856-881). Default stays hop-distance, matching
    NetworkX's ``kamada_kawai_layout`` default (weight=None when the
    graph has no weight data)."""
    import numpy as np

    n = graph.vertices.count()
    if n > max_nodes:
        raise ValueError(
            f"kamada_kawai layout needs O(n²) all-pairs distances; graph has "
            f"{n} > {max_nodes} nodes — sample a subgraph first (LinkGraph.subgraph)"
        )
    spark = graph.edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, x double, y double")
    ids = sorted(r["id"] for r in graph.vertices.select("id").collect())
    idx = {v: i for i, v in enumerate(ids)}
    if n == 1:
        return spark.createDataFrame(
            [(ids[0], float(center[0]), float(center[1]))], "id long, x double, y double"
        )
    dist = np.full((n, n), np.inf)
    if weighted:
        # weighted APSP: heap Dijkstra per source over an undirected
        # adjacency with min-collapsed parallel edges
        import heapq

        wadj: dict[int, dict[int, float]] = {i: {} for i in range(n)}
        for r in graph.edges.select("src", "dst", "weight").collect():
            a, b = idx.get(r["src"]), idx.get(r["dst"])
            if a is None or b is None or a == b:
                continue
            w = float(r["weight"])
            for u, v2 in ((a, b), (b, a)):
                if v2 not in wadj[u] or w < wadj[u][v2]:
                    wadj[u][v2] = w
        for s in range(n):
            dist[s, s] = 0.0
            heap = [(0.0, s)]
            while heap:
                d, u = heapq.heappop(heap)
                if d > dist[s, u]:
                    continue
                for v2, w in wadj[u].items():
                    nd = d + w
                    if nd < dist[s, v2]:
                        dist[s, v2] = nd
                        heapq.heappush(heap, (nd, v2))
    else:
        # hop-distance APSP via repeated BFS over an adjacency list
        adj: list[list[int]] = [[] for _ in range(n)]
        for r in graph.edges.select("src", "dst").collect():
            a, b = idx.get(r["src"]), idx.get(r["dst"])
            if a is None or b is None or a == b:
                continue
            adj[a].append(b)
            adj[b].append(a)
        for s in range(n):
            dist[s, s] = 0.0
            frontier = [s]
            d = 0
            while frontier:
                d += 1
                nxt = []
                for u in frontier:
                    for v2 in adj[u]:
                        if dist[s, v2] == np.inf:
                            dist[s, v2] = d
                            nxt.append(v2)
                frontier = nxt
    # disconnected pairs: NetworkX uses max finite distance as filler
    finite = dist[np.isfinite(dist)]
    filler = float(finite.max()) if finite.size else 1.0
    dist[~np.isfinite(dist)] = max(filler, 1.0)
    np.fill_diagonal(dist, 0.0)

    theta = 2.0 * np.pi * np.arange(n) / n
    pos = np.stack([np.cos(theta), np.sin(theta)], axis=1) * max(dist.max() / 2.0, 1.0)
    w = np.zeros_like(dist)
    nz = dist > 0
    w[nz] = 1.0 / dist[nz] ** 2
    lr = 0.1
    for _ in range(iterations):
        delta = pos[:, None, :] - pos[None, :, :]
        norm = np.sqrt((delta**2).sum(-1))
        np.fill_diagonal(norm, 1.0)
        coef = w * (norm - dist) / norm
        grad = (coef[:, :, None] * delta).sum(axis=1)
        pos -= lr * grad
    rows = [(int(ids[i]), float(pos[i, 0]), float(pos[i, 1])) for i in range(n)]
    raw = spark.createDataFrame(rows, "id long, x double, y double")
    return rescale_layout(raw, scale=scale, center=center)


def spring_layout_sampled(
    graph: LinkGraph,
    max_nodes: int = 5000,
    seed: int = 42,
    iterations: int = 50,
    scale: float = 1.0,
) -> DataFrame:
    """Fruchterman-Reingold via sample-then-local (SURVEY §2.7): the
    O(n²) force loop is driver-side on a bounded subgraph; positions
    come back as a DataFrame. Raises on graphs over max_nodes — at
    web scale you lay out a sampled neighborhood, not the crawl."""
    n = graph.vertices.count()
    if n > max_nodes:
        raise ValueError(
            f"spring layout is O(n²); graph has {n} > {max_nodes} nodes — "
            "sample a subgraph first (LinkGraph.subgraph)"
        )
    spark = graph.edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, x double, y double")
    try:
        import networkx as nx

        G = nx.Graph()
        G.add_nodes_from(r["id"] for r in graph.vertices.select("id").collect())
        G.add_weighted_edges_from(
            (r["src"], r["dst"], r["weight"]) for r in graph.edges.collect()
        )
        pos = nx.spring_layout(G, seed=seed, iterations=iterations, scale=scale)
        rows = [(int(k), float(v[0]), float(v[1])) for k, v in pos.items()]
    except ImportError:  # deterministic fallback: circular
        return circular_layout(graph, scale=scale)
    return spark.createDataFrame(rows, "id long, x double, y double")
