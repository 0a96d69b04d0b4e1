"""Edge-table construction — the engine's true "scan" (SURVEY.md §2.1).

pages(url, html, …) → links (vectorized UDF) → normalized urls →
64-bit ids → edges(src, dst, weight). Everything after the one UDF is
pure Catalyst: the explode, normalization, hashing, aggregation and
the final repartition all stay JVM-side and whole-stage-codegen'd.

Scale notes (100 TB / 10^12 pages):
- the explode fan-out (~8 links/page) happens before any shuffle;
  the only shuffle is the groupBy(src,dst) weight aggregation, which
  map-side combines.
- the edge table is written hash-partitioned by ``src`` and sorted
  within partitions (CSR-like blocks) so iterative rank⋈edges joins
  co-partition — see LinkGraph.partitioned().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.functions.extract import (
    extract_anchors_udf,
    extract_links_udf,
    host_col,
    normalize_url_col,
    url_id_col,
)

EDGE_SCHEMA = "src long, dst long, weight double"


def build_edges(
    pages: DataFrame,
    dedup: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """pages → edges(src long, dst long, weight double).

    ``dedup=True`` collapses duplicate (src,dst) rows into a single
    edge with weight = multiplicity (the Graph upsert semantics,
    reference graph.rs:384-396); ``dedup=False`` keeps parallel edges
    as rows (MultiGraph semantics, multigraph.rs:78-90).
    """
    links = pages.select(
        url_id_col(normalize_url_col(F.col("url"))).alias("src"),
        F.explode(extract_links_udf(F.col("html"))).alias("href"),
    )
    raw = links.select(
        "src",
        url_id_col(normalize_url_col(F.col("href"))).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    if dedup:
        edges = raw.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    else:
        edges = raw
    if partitions:
        edges = edges.repartition(partitions, "src").sortWithinPartitions("src", "dst")
    return edges


def build_host_edges(pages: DataFrame, drop_internal: bool = False) -> DataFrame:
    """pages → host graph (src_host string, dst_host string, weight
    double): the page-level link graph collapsed to hosts, weight =
    number of page-level link instances between the two hosts — the
    standard Common-Crawl two-level pipeline (host-rank jobs run on
    this table, 10^8 hosts instead of 10^12 pages).

    Same single-UDF shape as build_edges: one explode before any
    shuffle, then a map-side-combined groupBy on the (src_host,
    dst_host) pair — collapsing BEFORE the aggregation shuffle means
    the shuffle carries host-pair rows, not page-pair rows.
    ``drop_internal=True`` drops same-host (intra-site) links, the
    usual host-rank preprocessing."""
    links = pages.select(
        host_col(normalize_url_col(F.col("url"))).alias("src_host"),
        F.explode(extract_links_udf(F.col("html"))).alias("href"),
    )
    e = links.select(
        "src_host", host_col(normalize_url_col(F.col("href"))).alias("dst_host")
    )
    if drop_internal:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("double").alias("weight")
    )


def host_insularity(pages: DataFrame) -> DataFrame:
    """pages → DataFrame(host, n_links, n_internal, insularity): per
    source host the outgoing link-instance count, how many stay on the
    same host, and their ratio — the site-insularity statistic a crawl
    planner reads before budgeting a host (insular sites need deep
    crawls from few entry points; porous ones are reachable from
    everywhere). Same single-UDF shape as build_host_edges: the
    same-host flag folds into the one map-side-combined groupBy, so no
    second pass."""
    links = pages.select(
        host_col(normalize_url_col(F.col("url"))).alias("host"),
        F.explode(extract_links_udf(F.col("html"))).alias("href"),
    )
    flagged = links.select(
        "host",
        (host_col(normalize_url_col(F.col("href"))) == F.col("host"))
        .cast("long")
        .alias("internal"),
    )
    return flagged.groupBy("host").agg(
        F.count("*").alias("n_links"),
        F.sum("internal").alias("n_internal"),
        F.round(F.sum("internal") / F.count("*"), 6).alias("insularity"),
    )


def anchor_text_stats(pages: DataFrame) -> DataFrame:
    """pages → per-target anchor-text aggregation: DataFrame(dst
    string normalized url, n_anchors long, n_unique_anchors long,
    top_anchor string) — the classic web-ranking signal feed (what a
    target's in-links CALL it).

    Same single-UDF shape as build_edges: one vectorized
    (href, anchor) extraction + explode before any shuffle, then a
    map-side-combined groupBy on (dst, anchor) and a second reduction
    to one row per dst. ``top_anchor`` is deterministic: the most
    frequent anchor, ties to the lexicographically smallest, via a
    single ``min_by`` over the (−count, anchor) struct — no window
    sort."""
    pairs = pages.select(
        F.explode(extract_anchors_udf(F.col("html"))).alias("a")
    ).select(
        normalize_url_col(F.col("a.href")).alias("dst"),
        F.col("a.anchor").alias("anchor"),
    )
    per = pairs.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    return per.groupBy("dst").agg(
        F.sum("cnt").alias("n_anchors"),
        F.count("*").alias("n_unique_anchors"),
        F.min_by(
            "anchor",
            F.struct((-F.col("cnt")).alias("nc"), F.col("anchor").alias("a")),
        ).alias("top_anchor"),
    )


def vertices_from_pages(pages: DataFrame) -> DataFrame:
    return pages.select(
        url_id_col(normalize_url_col(F.col("url"))).alias("id"),
        F.col("url"),
        F.col("lang"),
    )


def check_id_collisions(pages: DataFrame) -> tuple[int, int]:
    """xxhash64 collision check: (distinct urls, distinct ids). Equal
    means collision-free; on mismatch callers switch to dense ranks."""
    row = pages.select(
        F.countDistinct(normalize_url_col(F.col("url"))).alias("u"),
        F.countDistinct(url_id_col(normalize_url_col(F.col("url")))).alias("i"),
    ).collect()[0]
    return row["u"], row["i"]


# --- graphs derived from the driver's TPC-H-ish testdata ---------------------

SUPPLIER_OFFSET = 1_000_000  # keeps customer and supplier id spaces disjoint


def tpch_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer→supplier graph: an edge per (customer,
    supplier) pair that co-occurs in an order, weight = co-occurrence
    count. Deterministic, natural-key ids → SQL-oracle friendly."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + SUPPLIER_OFFSET).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )


def tpch_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected supplier co-occurrence graph (canonical src<dst):
    suppliers connected when they ship lines of the same order. Dense
    enough to have triangles — the triangle/clustering test graph."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )
