"""aggregateMessages — the Pregel/GraphFrames user-extension
primitive: send an expression-valued message along every edge (to its
destination, its source, or both) and aggregate arrivals per vertex.
Every iterative operator in this engine is internally this shape
(PageRank sends rank/degree to dst; WCC sends min labels both ways);
this module exposes the primitive directly so a user can build a
custom vertex program without writing the join plumbing.

Message expressions are Catalyst Columns over the TRIPLET frame —
every edge column under its own name plus the source vertex's
attribute columns as ``src_<col>`` and the destination's as
``dst_<col>`` (GraphFrames' AM.src/AM.edge/AM.dst flattened). The
vertex side joins only when a message actually references vertex
attributes (pass ``need_vertex_attrs=False`` to skip the two joins
when messages use edge columns alone — degree-style aggregations then
shuffle nothing but the edge projection).

Plan shape: at most two vertex-attribute hash joins (src-keyed and
dst-keyed) + ONE map-side-combined aggregation keyed on the receiving
vertex id. Hub receivers are hot KEYS of a combining aggregate —
bounded per-reducer input, the same argument as PageRank's
contribution sum. For an iterative vertex program, wrap calls in the
engine's ``plans/iterate.iterate`` driver to get lineage cuts,
convergence metrics and durable resume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def triplets(graph: LinkGraph, need_vertex_attrs: bool = True) -> DataFrame:
    """The triplet view: one row per edge with all edge columns plus
    ``src_<col>``/``dst_<col>`` vertex-attribute columns (vertex ids
    themselves ride the edge's src/dst). With
    ``need_vertex_attrs=False`` (or when the vertex table has no
    attribute columns beyond id) this is just the edge table."""
    e = graph.edges
    v = graph.vertices
    attrs = [c for c in v.columns if c != "id"]
    if not need_vertex_attrs or not attrs:
        return e
    vs = v.select(
        F.col("id").alias("src"), *[F.col(c).alias(f"src_{c}") for c in attrs]
    )
    vd = v.select(
        F.col("id").alias("dst"), *[F.col(c).alias(f"dst_{c}") for c in attrs]
    )
    return e.join(vs, "src", "left").join(vd, "dst", "left")


def aggregate_messages(
    graph: LinkGraph,
    agg: Column | str,
    to_dst: Column | str | None = None,
    to_src: Column | str | None = None,
    need_vertex_attrs: bool = True,
) -> DataFrame:
    """DataFrame(id, agg): per-vertex aggregate of arriving messages.

    ``to_dst``/``to_src``: message expressions (Column or SQL string)
    over the triplet frame, sent to each edge's destination / source;
    at least one must be given. ``agg``: an aggregate over the
    message column — a Column like ``F.sum(F.col("msg"))`` (alias it
    to name the output) or a function-name string ("sum", "max",
    "collect_list", …) applied to ``msg``. Vertices receiving no
    message are absent (left-join against ``graph.vertices`` to
    densify, as GraphFrames does)."""
    if to_dst is None and to_src is None:
        raise ValueError("at least one of to_dst/to_src is required")
    t = triplets(graph, need_vertex_attrs)

    def as_col(m: Column | str) -> Column:
        return F.expr(m) if isinstance(m, str) else m

    parts = []
    if to_dst is not None:
        parts.append(
            t.select(F.col("dst").alias("id"), as_col(to_dst).alias("msg"))
        )
    if to_src is not None:
        parts.append(
            t.select(F.col("src").alias("id"), as_col(to_src).alias("msg"))
        )
    msgs = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    agg_col = (
        F.call_function(agg, F.col("msg")).alias("agg")
        if isinstance(agg, str)
        else agg
    )
    return msgs.groupBy("id").agg(agg_col)
