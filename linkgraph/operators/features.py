"""Neighborhood feature assembly for GNN/link-prediction training:
per-vertex aggregates of neighbor features (the GraphSAGE mean/pool
aggregation step, as one Catalyst plan).

One edge⋈feature hash join keyed on the neighbor id + one
map-side-combined groupBy on the vertex id — the exact shape of a
PageRank contribution step, so everything known about that plan at
scale (stationary edge operand, partial aggregation over hubs)
applies here unchanged.

Reference scope: networkx-rust carries per-node payloads
(graph.rs node data) but has no aggregation over them; this serves
the training-pipeline surface (SURVEY §2.8b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

_AGGS = {
    "mean": F.avg,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
}


def aggregate_neighbor_features(
    graph: LinkGraph,
    features: DataFrame,
    id_col: str = "id",
    feature_cols: list[str] | None = None,
    direction: str = "in",
    aggs: tuple[str, ...] = ("mean", "max"),
) -> DataFrame:
    """DataFrame(id, nbr_count, <agg>_<col>…): for every vertex, the
    aggregated features of its neighborhood.

    ``direction`` picks the neighborhood on directed graphs: "in"
    aggregates over predecessors (who links to me — the PageRank-style
    message direction), "out" over successors, "both" over the union
    with multiplicity; undirected graphs always use the symmetric
    adjacency. Neighbors missing from ``features`` contribute nothing
    (inner join — the standard sparse-feature convention); vertices
    with no featured neighbor get nbr_count 0 and NULL aggregates.
    Multi-edges count with multiplicity, mirroring weighted message
    passing with unit weights.
    """
    feature_cols = feature_cols or [
        c for c in features.columns if c != id_col
    ]
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise ValueError(f"unknown aggs {bad}; supported: {sorted(_AGGS)}")
    e = graph.edges.select("src", "dst")
    if not graph.directed:
        pairs = graph.sym_edges.select(
            F.col("src").alias("v"), F.col("dst").alias("nbr")
        )
    elif direction == "in":
        pairs = e.select(F.col("dst").alias("v"), F.col("src").alias("nbr"))
    elif direction == "out":
        pairs = e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
    elif direction == "both":
        pairs = e.select(F.col("dst").alias("v"), F.col("src").alias("nbr")).unionAll(
            e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    feats = features.select(F.col(id_col).alias("nbr"), *feature_cols)
    exprs = [F.count("*").alias("nbr_count")] + [
        _AGGS[a](F.col(c)).alias(f"{a}_{c}") for c in feature_cols for a in aggs
    ]
    agged = pairs.join(feats, "nbr").groupBy(F.col("v").alias("id")).agg(*exprs)
    return (
        graph.vertices.select("id")
        .join(agged, "id", "left")
        .withColumn("nbr_count", F.coalesce("nbr_count", F.lit(0)))
    )


def aggregate_neighbor_embeddings(
    graph: LinkGraph,
    embeddings: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    direction: str = "in",
) -> DataFrame:
    """DataFrame(id, nbr_count, mean_vec): per-vertex elementwise mean
    of the neighbors' embedding vectors — the GraphSAGE mean
    aggregator over an ``array<float/double>`` feature column.
    Direction semantics match :func:`aggregate_neighbor_features`;
    vertices with no embedded neighbor get nbr_count 0 and NULL
    mean_vec.

    Scale shape: the neighbor join fans each matched edge out by one
    row PER DIMENSION (posexplode before the shuffle), so the
    aggregation is a plain (vertex, position) groupBy — map-side
    combined, hub-safe, no giant collect_list rows on high-degree
    vertices, dimension never rides in a single unbounded cell. The
    reassembly sort runs per (vertex) over exactly `dim` rows.
    """
    if direction not in ("in", "out", "both"):
        raise ValueError(f"unknown direction {direction!r}")
    e = graph.edges.select("src", "dst")
    if not graph.directed:
        pairs = graph.sym_edges.select(
            F.col("src").alias("v"), F.col("dst").alias("nbr")
        )
    elif direction == "in":
        pairs = e.select(F.col("dst").alias("v"), F.col("src").alias("nbr"))
    elif direction == "out":
        pairs = e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
    else:
        pairs = e.select(F.col("dst").alias("v"), F.col("src").alias("nbr")).unionAll(
            e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
        )
    emb = embeddings.select(
        F.col(id_col).alias("nbr"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cells = pairs.join(emb, "nbr").select(
        "v", F.posexplode("_v").alias("pos", "val")
    )
    dims = (
        cells.groupBy("v", "pos")
        .agg(F.avg("val").alias("m"), F.count("*").alias("c"))
    )
    agged = dims.groupBy(F.col("v").alias("id")).agg(
        F.max("c").alias("nbr_count"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("mean_vec"),
    )
    return (
        graph.vertices.select("id")
        .join(agged, "id", "left")
        .withColumn("nbr_count", F.coalesce("nbr_count", F.lit(0)))
    )
