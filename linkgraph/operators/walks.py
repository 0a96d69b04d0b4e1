"""Deterministic distributed random walks.

The feeder for embedding pipelines (DeepWalk/node2vec-style corpora):
walks_per_node trajectories of a fixed length from every start
vertex. The "randomness" is a counter-based portable hash — at step t
the walker (start_id, walk_no) picks sorted-neighbor index
``md5int(seed:start_id:walk_no:t) mod degree`` — so the corpus is
REPRODUCIBLE across runs, partitionings and engines (the md5-derived
60-bit int is the same value in Spark and ANSI SQL, the
functions/text.py trick), with no RNG state to ship between
executors. Uniform over distinct out-neighbors; walkers at vertices
with no out-edges stop (their trajectory just ends, the standard
convention).

Plan shape: the ranked adjacency (one array row per vertex) is built
once and cached hash-partitioned by vertex id; each of the
``length`` steps is one co-partitioned join of the live-walker frame
against it plus an element_at — no shuffle of the adjacency, O(W)
state rows moving per step. At 10^12 vertices the walker frame is
sharded by start vertex like any other state frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.functions.text import md5int_col
from linkgraph.plans.iterate import LineageChain
from linkgraph.plans.partitioning import stationary


def random_walks(
    graph: LinkGraph,
    length: int,
    walks_per_node: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """DataFrame(start_id, walk_no, step, id): step 0 is the start
    vertex; a row per visited vertex per trajectory. ``starts``:
    optional DataFrame with an id column (default: every vertex)."""
    adj = stationary(
        graph.sym_edges.select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs")),
        "src",
    )
    base = starts.select(F.col(starts.columns[0]).alias("id")) if starts is not None \
        else graph.vertices.select("id")
    cur = base.select(
        F.col("id").alias("start_id"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk_no"),
        F.col("id"),
    )
    out = cur.withColumn("step", F.lit(0)).select("start_id", "walk_no", "step", "id")
    ochain, cchain = LineageChain(), LineageChain()
    out = ochain.cut(out)
    for t in range(1, length + 1):
        h = md5int_col(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col("start_id").cast("string"),
                F.col("walk_no").cast("string"),
                F.lit(str(t)),
            )
        )
        cur = cchain.cut(
            cur.join(adj, cur.id == adj.src)
            .select(
                "start_id", "walk_no",
                F.element_at(
                    "nbrs", (F.pmod(h, F.size("nbrs")) + 1).cast("int")
                ).alias("id"),
            )
        )
        out = ochain.cut(
            out.unionAll(
                cur.select("start_id", "walk_no", F.lit(t).alias("step"), "id")
            )
        )
    adj.unpersist()
    cchain.release()
    # out's final dir backs the returned frame — leaked on purpose
    return out
