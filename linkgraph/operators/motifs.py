"""Small-motif censuses: bipartite butterflies, dyads, directed triads.

The reference's motif surface stops at undirected triangles
(`/root/reference/benchmarks/src/benchmark_networkx.py:249-254`,
clustering). Web-graph practice needs two more censuses:

- **butterflies** (bipartite 4-cycles, the bipartite analogue of the
  triangle) — the unit of cohesion in user→page / customer→supplier
  two-mode graphs. Exact counting is one wedge self-join keyed on the
  ANCHOR side + one count aggregation: butterflies = Σ_pairs C(co, 2)
  over co-neighborhood sizes. The join fans out O(Σ deg_anchor²), so
  the anchor defaults to whichever side has the smaller Σ C(deg, 2)
  — on a crawl that is the page side, not the hub-user side.
- **dyad census** (mutual / asymmetric / null ordered-pair classes)
  and the two directed triangle motifs (transitive a→b→c←a vs cyclic
  a→b→c→a) — reciprocity and feed-forward/feedback structure, all
  expressible as distinct-edge joins Catalyst can reorder and
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def butterfly_count(
    edges: DataFrame,
    left: str = "src",
    right: str = "dst",
    anchor: str = "auto",
) -> DataFrame:
    """One row (edges, wedges, butterflies) for the bipartite graph
    given by the distinct (left, right) pairs of ``edges``.

    ``anchor``: the side the wedge self-join keys on — "left",
    "right", or "auto" (the side with fewer wedges Σ C(deg, 2); at
    scale the anchored side's degree skew is the whole cost, so the
    choice is made from the data, never positionally). The butterfly
    total is anchor-independent; the reported ``wedges`` count is the
    anchored side's."""
    e = edges.select(F.col(left).alias("l"), F.col(right).alias("r")).distinct()
    e = e.persist()
    if anchor == "auto":
        wl, wr = [
            e.groupBy(side)
            .agg(F.count("*").alias("d"))
            .agg(F.sum(F.expr("d * (d - 1) div 2")).alias("w"))
            .collect()[0]["w"]
            or 0
            for side in ("l", "r")
        ]
        anchor = "l" if wl <= wr else "r"
    else:
        anchor = {"left": "l", "right": "r"}[anchor]
    other = "r" if anchor == "l" else "l"

    e1 = e.select(F.col(anchor).alias("k"), F.col(other).alias("o1"))
    e2 = e.select(F.col(anchor).alias("k"), F.col(other).alias("o2"))
    co = (
        e1.join(e2, "k")
        .filter(F.col("o1") < F.col("o2"))
        .groupBy("o1", "o2")
        .agg(F.count("*").alias("co"))
    )
    out = co.agg(
        F.sum(F.col("co")).alias("wedges"),
        F.sum(F.expr("co * (co - 1) div 2")).alias("butterflies"),
    ).select(
        F.lit(None).cast("long").alias("edges"),
        F.coalesce(F.col("wedges"), F.lit(0)).alias("wedges"),
        F.coalesce(F.col("butterflies"), F.lit(0)).alias("butterflies"),
    )
    n_edges = e.count()
    out = out.withColumn("edges", F.lit(n_edges))
    e.unpersist()
    return out.select("edges", "wedges", "butterflies")


def dyad_census(graph: LinkGraph) -> DataFrame:
    """One row (mutual, asymmetric, nulls): the classic dyad census of
    a directed graph over distinct non-loop edges."""
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    pairs = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    n_pairs = pairs.count()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = (
        e.join(rev, ["src", "dst"], "left_semi").filter(F.col("src") < F.col("dst")).count()
    )
    n = graph.vertices.count()
    e.unpersist()
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(mutual, n_pairs - mutual, n * (n - 1) // 2 - n_pairs)],
        "mutual BIGINT, asymmetric BIGINT, nulls BIGINT",
    )


def triad_motifs(graph: LinkGraph) -> DataFrame:
    """One row (transitive, cyclic): raw counts of the two directed
    triangle patterns over distinct non-loop edges — transitive =
    ordered triples (a→b, b→c, a→c) with a,b,c distinct (each triple
    once); cyclic = directed 3-cycles a→b→c→a (each cycle once, keyed
    at its smallest vertex)."""
    e = (
        graph.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    paths = ab.join(bc, "b").filter(F.col("a") != F.col("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    transitive = paths.join(ac, ["a", "c"], "left_semi").count()
    ca = e.select(F.col("dst").alias("a"), F.col("src").alias("c"))
    cyclic = (
        paths.filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .join(ca, ["a", "c"], "left_semi")
        .count()
    )
    e.unpersist()
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(transitive, cyclic)], "transitive BIGINT, cyclic BIGINT"
    )
