"""k-core decomposition by distributed minimum-degree peeling.

A standard link-graph analytic alongside PageRank/WCC/LPA/triangles
(the capability family the reference benchmarks through NetworkX,
/root/reference/benchmarks/src/benchmark_networkx.py): the k-core is
the maximal subgraph where every vertex has degree >= k; the core
number of a vertex is the largest k whose k-core contains it.

``core_numbers`` is the standard distributed formulation: per outer
round, jump k to the MINIMUM remaining degree and peel every vertex
that cannot survive the k-core (inner fixpoint), assigning core = k.
Outer rounds = number of DISTINCT core values (web graphs: dozens),
not max-degree; this replaces the round-1 k+=1 loop whose round count
was O(degeneracy · peels). Degree aggregations only — no per-vertex
neighbor arrays — so hub vertices cost O(deg) rows spread across
partitions. Lineage is hard-cut once per peel via LineageChain, which
also garbage-collects superseded trunc dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.plans.iterate import ConvergenceError, LineageChain, PeelCheckpoint


def _simple_sym(graph: LinkGraph) -> DataFrame:
    """Simple undirected symmetrized projection (networkx.core_number
    semantics): drop self-loops, collapse parallel/reciprocal edges."""
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def k_core(graph: LinkGraph, k: int, max_rounds: int = 1000) -> LinkGraph:
    """The maximal subgraph with all simple-undirected degrees >= k;
    returned as an induced subgraph of the original graph."""
    echain, lchain = LineageChain(), LineageChain()
    edges = echain.cut(_simple_sym(graph))
    for r in range(max_rounds + 1):
        deg = edges.groupBy("src").agg(F.count("*").alias("d"))
        low = lchain.cut(deg.filter(F.col("d") < k).select(F.col("src").alias("id")))
        if low.limit(1).count() == 0:
            break
        # fixpoint check BEFORE the exhaustion raise (mirrors
        # minimum_spanning_forest): a graph converging in exactly
        # max_rounds peels must not raise spuriously
        if r == max_rounds:
            raise ConvergenceError(
                f"k_core did not reach a fixpoint in {max_rounds} rounds"
            )
        edges = echain.cut(
            edges.join(low, edges.src == low.id, "left_anti")
            .join(low, F.col("dst") == low.id, "left_anti")
        )
    kept = edges.select(F.col("src").alias("id")).distinct()
    out = graph.subgraph(kept)
    # pin the result before the chains' dirs can be GC'd by later calls
    lchain.release()
    return out


def core_numbers(
    graph: LinkGraph,
    max_rounds: int = 100_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """DataFrame(id, core): largest k such that id is in the k-core.

    Isolated vertices (and vertices only touching self-loops) get
    core 0. Undirected-degree semantics on the symmetrized edge set,
    matching ``networkx.core_number`` (which rejects self-loop graphs;
    we drop self-loops first, the same preprocessing NetworkX
    documents). ``max_rounds`` bounds the peel count; exhausting it
    raises — a partial core map is wrong, not degraded.

    ONE driver action per peel: the min/count agg that decides k and
    termination. The peel set ``present.filter(d <= k)`` is non-empty
    by construction whenever vertices remain (min(d) <= k after the
    jump), so the former inner-loop emptiness probe is redundant —
    peel cascades at the same k and k-jumps are the same loop arm.

    ``checkpoint_dir``/``checkpoint_every``: durable per-peel commits
    of (assigned, remaining, edges) plus the scalar peel state (k,
    peel count) via PeelCheckpoint — an interrupted decomposition
    resumes from the last committed peel."""
    spark = graph.edges.sparkSession
    echain, vchain, achain, lchain = (LineageChain() for _ in range(4))
    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    meta = ckpt.latest() if (ckpt and resume) else None
    resumed_k, resumed_peels = 0, 0
    if meta is not None:
        # skip the (eager) initial symmetrization entirely on resume
        frames = ckpt.load(meta)
        assigned = frames["assigned"]
        remaining = frames["remaining"]
        edges = frames["edges"]
        resumed_k = int(meta["extra"]["k"])
        resumed_peels = int(meta["extra"]["peels"])
    else:
        edges = echain.cut(_simple_sym(graph))
        remaining = vchain.cut(graph.vertices.select("id"))
        assigned = spark.createDataFrame([], "id long, core long")

    def degrees(edges: DataFrame, remaining: DataFrame) -> DataFrame:
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
        return remaining.join(deg, "id", "left").select(
            "id", F.coalesce("d", F.lit(0)).alias("d")
        )

    k = resumed_k
    peels = resumed_peels
    while True:
        present = degrees(edges, remaining)
        # the single per-peel action: min degree (k jump target) and
        # remaining-vertex count (termination) in one agg
        row = present.agg(F.min("d").alias("m"), F.count("*").alias("c")).collect()[0]
        if not row["c"]:
            break
        peels += 1
        if peels > max_rounds:
            raise ConvergenceError(
                f"core_numbers exceeded {max_rounds} peel rounds without emptying "
                "the graph — refusing to return a partial core assignment"
            )
        # jump straight to the smallest degree still present: every
        # vertex of degree <= k is guaranteed core = k
        k = max(k, int(row["m"]))
        low = lchain.cut(present.filter(F.col("d") <= k).select("id"))
        assigned = achain.cut(
            assigned.unionAll(low.select("id", F.lit(k).cast("long").alias("core")))
        )
        remaining = vchain.cut(remaining.join(low, "id", "left_anti"))
        edges = echain.cut(
            edges.join(low, edges.src == low.id, "left_anti")
            .join(low, F.col("dst") == low.id, "left_anti")
        )
        if ckpt and checkpoint_every and peels % checkpoint_every == 0:
            ckpt.commit(
                peels,
                {"assigned": assigned, "remaining": remaining, "edges": edges},
                extra={"k": k, "peels": peels},
            )
    echain.release()
    vchain.release()
    lchain.release()
    return assigned
