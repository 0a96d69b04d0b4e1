"""Landmark (2-hop style) distance oracle.

The reference's only point-to-point distance surface is exact
Dijkstra / APSP (`/root/reference/src/graph/algorithms.rs` shortest
paths; `benchmarks/src/benchmark_networkx.py:206-210` runs
``all_pairs_shortest_path``) — O(V·E) work and O(V²) output, fatal at
10^12 vertices. The standard scale substitute (Potamias et al.,
"Fast Shortest Path Distance Estimation in Large Networks", CIKM'09 —
public) is a LANDMARK ORACLE: pick k high-coverage vertices, run one
batched multi-source BFS toward and one away from them, store the
2k·V label table, and answer any (u, v) query as

    d̂(u, v) = min over landmarks l of  d(u→l) + d(l→v)

an upper bound on the true distance that is exact whenever some
shortest path passes a landmark (and always exact when u or v IS a
landmark, because d(u→u) = 0 participates in the min).

Spark shape: landmark selection is one partial-agg degree count plus
a TakeOrderedAndProject top-k (no full sort shuffle); the index is
two frontier loops where all k sources ride along as a key column
(`multi_source_bfs` — k sources cost one loop, not k); query
answering is two hash joins against the label table keyed on the
probe vertex then (landmark, probe) — no BFS at query time. Label
table size k·V is the only state, linear in V.

Determinism: landmark choice orders by (degree DESC, id ASC); BFS
levels are exact min-hop values — a DuckDB recursive CTE replays the
whole pipeline value-exactly (contract query
``landmark_distances_suppdir``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.centrality import multi_source_bfs


def select_landmarks(graph: LinkGraph, k: int) -> DataFrame:
    """Top-k vertices by total degree (each directed edge counts once
    per endpoint), ties broken by ascending id — deterministic.
    Degree-ranked landmarks are the best simple coverage heuristic
    (Potamias §4: degree beats random by a wide margin on web graphs).

    Plan: endpoint explode → partial-agg count → TakeOrderedAndProject
    (map-side top-k, driver merges k·P rows — never a full sort)."""
    if k < 1:
        raise ValueError(f"need at least one landmark, got k={k}")
    ends = graph.edges.select(F.col("src").alias("id")).unionAll(
        graph.edges.select(F.col("dst").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.orderBy(F.col("deg").desc(), F.col("id").asc())
        .limit(k)
        .select("id")
    )


def landmark_index(
    graph: LinkGraph,
    landmarks: DataFrame | None = None,
    num_landmarks: int = 8,
    max_depth: int = 10_000,
) -> DataFrame:
    """The oracle's label table: DataFrame(landmark, id, d_from, d_to)
    with d_from = hop distance landmark→id and d_to = id→landmark
    (equal for undirected graphs). Rows exist where at least one
    direction reaches; the unreached direction is NULL. k·V rows max.

    Two batched multi-source BFS passes — the forward walk gives
    d(l, v) directly; the reverse walk follows edges backwards so its
    level is d(v, l) in the original orientation."""
    if landmarks is None:
        landmarks = select_landmarks(graph, num_landmarks)
    fwd = multi_source_bfs(graph, landmarks, max_depth=max_depth).select(
        F.col("source").alias("landmark"),
        "id",
        F.col("level").alias("d_from"),
    )
    rev = multi_source_bfs(
        graph, landmarks, max_depth=max_depth, reverse=True
    ).select(
        F.col("source").alias("landmark"),
        "id",
        F.col("level").alias("d_to"),
    )
    return fwd.join(rev, ["landmark", "id"], "full_outer")


def estimate_distances(
    graph: LinkGraph,
    pairs: DataFrame,
    landmarks: DataFrame | None = None,
    num_landmarks: int = 8,
    max_depth: int = 10_000,
    index: DataFrame | None = None,
) -> DataFrame:
    """Answer a batch of (src, dst) distance queries from the
    landmark oracle: DataFrame(src, dst, est_distance) where
    est_distance = min_l d(src→l) + d(l→dst), an upper bound on the
    true hop distance; NULL when no landmark connects the pair.
    ``pairs``: first two columns are the query endpoints. Pass a
    prebuilt ``index`` (from :func:`landmark_index`) to amortize the
    BFS across many query batches — the production pattern."""
    if index is None:
        index = landmark_index(
            graph, landmarks=landmarks,
            num_landmarks=num_landmarks, max_depth=max_depth,
        )
    s, d = pairs.columns[0], pairs.columns[1]
    q = pairs.select(
        F.col(s).cast("long").alias("src"), F.col(d).cast("long").alias("dst")
    ).distinct()
    to_l = index.filter(F.col("d_to").isNotNull()).select(
        "landmark", F.col("id").alias("src"), "d_to"
    )
    from_l = index.filter(F.col("d_from").isNotNull()).select(
        "landmark", F.col("id").alias("dst"), "d_from"
    )
    legs = q.join(to_l, "src").join(from_l, ["landmark", "dst"])
    est = legs.groupBy("src", "dst").agg(
        F.min(F.col("d_to") + F.col("d_from")).alias("est_distance")
    )
    return q.join(est, ["src", "dst"], "left")
