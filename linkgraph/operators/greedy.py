"""Deterministic greedy symmetry-breaking: maximal independent set,
Jones-Plassmann greedy coloring, and maximal matching.

Capability family: the reference ships its graphs to NetworkX for the
classic analytics suite (/root/reference/benchmarks/src/
benchmark_networkx.py); `maximal_independent_set`, `greedy_color` and
`maximal_matching` are the NetworkX symmetry-breaking trio alongside
the centrality/community operators already covered. A web-scale engine
needs them for scheduling-style workloads (conflict-free crawl
batches, register-style host coloring, one-to-one page pairing).

All three use the same public device (Luby 1986; Jones & Plassmann
1993): a deterministic per-vertex (per-edge) priority — the engine's
cross-engine 60-bit md5 hash — under which repeated parallel
local-minimum rounds provably compute the SAME answer as a sequential
greedy scan in ascending (priority, id) order:

- MIS round: every undecided vertex whose key is strictly smaller
  than all undecided neighbours' keys joins the set; it and its
  neighbours leave the pool. A vertex enters the MIS exactly when the
  sequential scan would take it, so the result is the
  lexicographically-first MIS under the priority order.
- Coloring round: every undecided vertex none of whose SMALLER-key
  neighbours is still undecided takes the minimum color excluded by
  its already-colored neighbours. A larger-key neighbour cannot be
  colored before the vertex itself (it is blocked by the vertex), so
  the excluded set equals the sequential scan's, color by color.
- Matching round: every edge that is the minimum-key incident edge of
  BOTH its endpoints enters the matching; its endpoints' edges leave
  the pool. Equals the sequential greedy matching in key order.

Scale shape: each round is one or two joins against a stationary
symmetrized edge operand plus a groupBy — no neighbour arrays, no
driver-side state beyond one count per round. Expected rounds are
O(log n) for random-like priorities (hash keys are), and each round's
frames are lineage-cut via LineageChain. Hub vertices cost O(deg)
rows spread across partitions, never a single task.

Determinism across runs/partitionings/engines makes every operator
value-exactly oracle-checkable in ANSI SQL (the driver contract
unrolls the same rounds in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import md5int_col
from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import ConvergenceError, LineageChain


def _sym_edges(graph: LinkGraph) -> DataFrame:
    """Simple undirected symmetrized projection (both directions,
    self-loops dropped, parallel/reciprocal edges collapsed)."""
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _vertex_keys(graph: LinkGraph, seed: int) -> DataFrame:
    """(id, p) with the portable 60-bit md5 priority md5(id ':' seed)."""
    return graph.vertices.select(
        "id",
        md5int_col(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))).alias("p"),
    )


def maximal_independent_set(
    graph: LinkGraph, seed: int = 0, max_rounds: int = 200
) -> DataFrame:
    """DataFrame(id): the lexicographically-first maximal independent
    set under the (md5 priority, id) order — deterministic across
    runs, partitionings and engines.

    Per round, every undecided vertex that is a strict local minimum
    among its undecided neighbours joins the set; the global minimum
    always qualifies, so the pool shrinks every round and the loop
    terminates. Exhausting ``max_rounds`` raises: a partial MIS is
    not independent-set-maximal, so returning it would be wrong."""
    echain, uchain, mchain = LineageChain(), LineageChain(), LineageChain()
    edges = echain.cut(_sym_edges(graph))
    undec = uchain.cut(_vertex_keys(graph, seed))
    spark = undec.sparkSession
    mis = spark.createDataFrame([], "id long")
    for r in range(max_rounds + 1):
        if undec.limit(1).count() == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"maximal_independent_set did not drain the vertex pool in "
                f"{max_rounds} rounds"
            )
        u = undec.select(F.col("id").alias("nid"), F.col("p").alias("np"))
        nbr_min = (
            edges.join(u, edges.dst == u.nid)
            .groupBy("src")
            .agg(F.min(F.struct(F.col("np").alias("p"), F.col("nid").alias("id"))).alias("m"))
        )
        cand = (
            undec.join(nbr_min, undec.id == nbr_min.src, "left")
            .filter(
                F.col("m").isNull()
                | (F.struct(F.col("p"), F.col("id")) < F.col("m"))
            )
            .select("id")
        )
        nbrs_of_cand = (
            edges.join(cand.select(F.col("id").alias("cid")), edges.src == F.col("cid"))
            .select(F.col("dst").alias("id"))
        )
        removed = cand.unionAll(nbrs_of_cand).distinct()
        mis = mchain.cut(mis.unionAll(cand))
        undec = uchain.cut(undec.join(removed, "id", "left_anti"))
    echain.release()
    uchain.release()
    return mis


def greedy_coloring(
    graph: LinkGraph, seed: int = 0, max_rounds: int = 200
) -> DataFrame:
    """DataFrame(id, color): the Jones-Plassmann parallel realization
    of sequential greedy coloring in ascending (md5 priority, id)
    order — vertex colors equal a single-threaded greedy scan's.

    Per round, a vertex whose smaller-key neighbours are all colored
    takes the minimum color not used by any colored neighbour. The
    excluded-color probe explodes only ``count(colored neighbours)+1``
    candidate colors per ready vertex (the mex is bounded by the
    neighbour count), so total explode volume over the whole run is
    O(E). Rounds equal the longest key-decreasing path — O(log n)
    expected for hash keys."""
    echain, uchain, cchain, nchain = (LineageChain() for _ in range(4))
    edges = echain.cut(_sym_edges(graph))
    undec = uchain.cut(_vertex_keys(graph, seed))
    spark = undec.sparkSession
    colored = spark.createDataFrame([], "id long, color long")
    for r in range(max_rounds + 1):
        if undec.limit(1).count() == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"greedy_coloring did not drain the vertex pool in {max_rounds} "
                "rounds (longest priority-decreasing path exceeds the budget)"
            )
        u = undec.select(F.col("id").alias("nid"), F.col("p").alias("np"))
        # v is blocked while some undecided neighbour has a smaller key
        blocked = (
            edges.join(u, edges.dst == u.nid)
            .join(undec, edges.src == undec.id)
            .filter(
                F.struct(F.col("np").alias("p"), F.col("nid").alias("id"))
                < F.struct(F.col("p"), F.col("id"))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        ready = undec.join(blocked, "id", "left_anti").select("id")
        c = colored.select(F.col("id").alias("cid"), "color")
        used = (
            edges.join(c, edges.dst == c.cid)
            .join(ready.select(F.col("id").alias("rid")), edges.src == F.col("rid"))
            .select(F.col("src").alias("id"), "color")
            .distinct()
        )
        ucnt = used.groupBy("id").agg(F.count("*").alias("nc"))
        cand_colors = (
            ready.join(ucnt, "id", "left")
            .select(
                "id",
                F.explode(
                    F.sequence(F.lit(0).cast("long"), F.coalesce("nc", F.lit(0)).cast("long"))
                ).alias("c"),
            )
        )
        # materialize `newly` BEFORE cutting `colored`: it reads the
        # previous colored frame (via `used`), whose trunc dir the
        # colored cut garbage-collects
        newly = nchain.cut(
            cand_colors.join(
                used,
                (cand_colors.id == used.id) & (cand_colors.c == used.color),
                "left_anti",
            )
            .groupBy("id")
            .agg(F.min("c").alias("color"))
        )
        colored = cchain.cut(colored.unionAll(newly))
        undec = uchain.cut(undec.join(newly.select("id"), "id", "left_anti"))
    echain.release()
    uchain.release()
    nchain.release()
    return colored


def maximal_matching(
    graph: LinkGraph, seed: int = 0, max_rounds: int = 200
) -> DataFrame:
    """DataFrame(src, dst): the greedy maximal matching taken in
    ascending (md5 edge priority, src, dst) order over the canonical
    simple undirected edge set (src < dst) — per round, every edge
    that is the minimum-key incident edge of BOTH endpoints matches,
    and its endpoints' incident edges leave the pool. Equals the
    sequential greedy scan; the globally smallest edge always
    qualifies, so the pool shrinks every round."""
    uchain, mchain = LineageChain(), LineageChain()
    base = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    undec = uchain.cut(
        base.withColumn(
            "q",
            md5int_col(
                F.concat(
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                    F.lit(f":{seed}"),
                )
            ),
        ).withColumn("k", F.struct("q", "src", "dst"))
    )
    spark = undec.sparkSession
    matching = spark.createDataFrame([], "src long, dst long")
    for r in range(max_rounds + 1):
        if undec.limit(1).count() == 0:
            break
        if r == max_rounds:
            raise ConvergenceError(
                f"maximal_matching did not drain the edge pool in {max_rounds} rounds"
            )
        inc = undec.select(F.col("src").alias("v"), "k").unionAll(
            undec.select(F.col("dst").alias("v"), "k")
        )
        vmin = inc.groupBy("v").agg(F.min("k").alias("m"))
        ms = vmin.select(F.col("v").alias("sv"), F.col("m").alias("sm"))
        md = vmin.select(F.col("v").alias("dv"), F.col("m").alias("dm"))
        cand = (
            undec.join(ms, undec.src == ms.sv)
            .join(md, undec.dst == md.dv)
            .filter((F.col("k") == F.col("sm")) & (F.col("k") == F.col("dm")))
            .select("src", "dst")
        )
        mv = cand.select(F.col("src").alias("id")).unionAll(
            cand.select(F.col("dst").alias("id"))
        )
        matching = mchain.cut(matching.unionAll(cand))
        undec = uchain.cut(
            undec.join(mv, undec.src == mv.id, "left_anti")
            .join(mv, F.col("dst") == mv.id, "left_anti")
        )
    uchain.release()
    return matching
