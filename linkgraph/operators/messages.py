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


def pregel(
    graph: LinkGraph,
    initial: dict[str, Column],
    agg: Column | str,
    update: dict[str, Column],
    to_dst: Column | str | None = None,
    to_src: Column | str | None = None,
    delta: Column | None = None,
    tol: float = 0.0,
    max_iter: int = 20,
    need_vertex_attrs: bool = True,
    truncate_every: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    on_exhaustion: str = "ok",
):
    """Generic Pregel vertex-program driver (the GraphFrames
    ``Pregel`` API shape) — :func:`aggregate_messages` supersteps
    composed with the engine's ``plans/iterate.iterate`` loop, so a
    user-defined vertex program gets the same lineage cuts, per-round
    stats, durable checkpoint/resume and loud exhaustion policy as
    the built-in operators.

    ``initial``: state columns as expressions over the vertex table
    (e.g. ``{"rank": F.lit(1.0)}``). Each superstep:

      1. messages: ``to_dst``/``to_src`` expressions over the triplet
         of the CURRENT state (state columns visible as
         ``src_<col>``/``dst_<col>``; edge columns as-is);
      2. per-vertex aggregate ``agg`` over ``msg`` (arriving NULL for
         vertices with no messages — coalesce in ``update``);
      3. new state: ``update`` expressions over the old state joined
         with the aggregate column ``agg``;
      4. convergence: ``delta`` — an aggregate expression over the
         joined (old state + new columns) frame, e.g.
         ``F.sum(F.abs(F.col("new_rank") - F.col("rank")))``; new
         columns are visible as ``new_<name>``. None = run exactly
         ``max_iter`` supersteps.

    Returns the ``IterationResult`` (state = vertex frame with the
    ``initial`` columns converged).

    The engine's own PageRank/WCC/SSSP remain the tuned paths (their
    operands cache hash-partitioned, broadcast plans auto-select);
    this driver is the EXTENSION surface for algorithms the library
    does not ship."""
    from linkgraph.plans.iterate import iterate

    if not initial:
        raise ValueError("initial state must define at least one column")
    if not update:
        raise ValueError("update must define at least one column")
    if set(update) != set(initial):
        raise ValueError(
            f"update must redefine exactly the state columns "
            f"{sorted(initial)}, got {sorted(update)}"
        )
    init = graph.vertices.select(
        "id", *[c.alias(n) for n, c in initial.items()]
    )
    names = list(initial)
    # Handle to the delta path's persisted frame: iterate() unpersists
    # the PROJECTION we return, not the frame we persisted, so without
    # tracking the exact object one cached frame would leak per
    # superstep. The previous superstep's cache is droppable as soon
    # as this superstep's delta collect has materialized the new
    # persisted frame (which read through it).
    persisted: list[DataFrame] = []

    def step(state, i):
        g = LinkGraph(graph.edges, state, directed=graph.directed)
        msgs = aggregate_messages(
            g,
            agg if not isinstance(agg, str)
            else F.call_function(agg, F.col("msg")).alias("agg"),
            to_dst=to_dst,
            to_src=to_src,
            need_vertex_attrs=need_vertex_attrs,
        )
        joined = state.join(msgs, "id", "left")
        new = joined.select(
            "id",
            *[F.col(n).alias(f"_old_{n}") for n in names],
            *[c.alias(f"new_{n}") for n, c in update.items()],
        )
        if delta is None:
            out = new.select(
                "id", *[F.col(f"new_{n}").alias(n) for n in names]
            )
            return out, float("inf")
        new = new.persist()
        row = new.select(
            *[F.col(f"_old_{n}").alias(n) for n in names],
            *[F.col(f"new_{n}") for n in names],
        ).agg(delta.alias("_d")).collect()[0]
        out = new.select("id", *[F.col(f"new_{n}").alias(n) for n in names])
        # this superstep's frame is cached now — the previous one has
        # served its purpose (it fed the triplet join above)
        while persisted:
            persisted.pop().unpersist()
        persisted.append(new)
        return out, float(row["_d"] or 0.0)

    result = iterate(
        init,
        step,
        tol=tol,
        max_iter=max_iter,
        truncate_every=truncate_every,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        on_exhaustion=on_exhaustion,
    )
    # drop the final superstep's cache: harmless if iterate's lineage
    # cut already disk-backed the result, and a plain (recomputable)
    # plan otherwise — either way nothing stays pinned for the life
    # of the session
    while persisted:
        persisted.pop().unpersist()
    return result
