"""Weisfeiler-Lehman structural signatures.

The 1-WL (color refinement) iteration: every vertex's label is
re-hashed from (own label, sorted multiset of neighbour labels) for a
fixed number of rounds. Vertices with equal round-k signatures have
isomorphic k-hop unfoldings — the standard primitive for structural
deduplication of subgraphs, graph fingerprinting, and isomorphism
rejection (two graphs whose signature multisets differ are certainly
non-isomorphic). Complements the engine's content-dedup family with a
STRUCTURE-dedup operator for link graphs.

Scale shape: per round, one edges⋈labels join + one groupBy(src) with
sort_array(collect_list(...)) — the collected list is a vertex's
neighbour-label multiset, so memory per key is O(deg); for web-scale
hub degrees cap the multiset via a bounded-deg variant (slice after
sort) if needed. Labels are the engine's portable 60-bit md5 ints, so
the refinement is deterministic across runs, partitionings and
engines — the driver contract unrolls the same rounds in DuckDB with
string_agg(... ORDER BY).

Reference scope: networkx ships weisfeiler_lehman_graph_hash; the
reference's benchmark family (benchmarks/src/benchmark_networkx.py)
is the same NetworkX surface this engine re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import md5int_col
from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import LineageChain


def _sym_edges(graph: LinkGraph) -> DataFrame:
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def wl_signatures(graph: LinkGraph, rounds: int = 3) -> DataFrame:
    """DataFrame(id, wl): the 60-bit 1-WL signature after ``rounds``
    color refinements on the simple undirected projection.

    Round 0 hashes the degree; round t hashes (label, ','-joined
    ascending neighbour labels). Equal signatures <=> isomorphic
    ``rounds``-hop neighbourhood unfoldings (up to 1-WL power)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    echain, lchain = LineageChain(), LineageChain()
    edges = echain.cut(_sym_edges(graph))
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    lbl = lchain.cut(
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            md5int_col(
                F.concat(F.lit("d:"), F.coalesce("d", F.lit(0)).cast("string"))
            ).alias("wl"),
        )
    )
    for _ in range(rounds):
        u = lbl.select(F.col("id").alias("nid"), F.col("wl").alias("nwl"))
        nbr = (
            edges.join(u, edges.dst == u.nid)
            .groupBy("src")
            .agg(F.sort_array(F.collect_list("nwl")).alias("ns"))
        )
        lbl = lchain.cut(
            lbl.join(nbr, lbl.id == nbr.src, "left").select(
                "id",
                md5int_col(
                    F.concat(
                        F.col("wl").cast("string"),
                        F.lit(":"),
                        F.coalesce(
                            F.concat_ws(
                                ",", F.transform("ns", lambda x: x.cast("string"))
                            ),
                            F.lit(""),
                        ),
                    )
                ).alias("wl"),
            )
        )
    echain.release()
    return lbl


def wl_graph_fingerprint(graph: LinkGraph, rounds: int = 3) -> DataFrame:
    """One-row DataFrame(n_vertices, fingerprint): an order-independent
    XOR fold of the vertex signatures — equal fingerprints are a
    necessary condition for isomorphism, so mismatches reject cheaply
    at any scale (no global sort, one map-side-combinable agg)."""
    sig = wl_signatures(graph, rounds)
    return sig.agg(
        F.count("*").alias("n_vertices"),
        F.coalesce(F.expr("bit_xor(wl)"), F.lit(0)).alias("fingerprint"),
    )
