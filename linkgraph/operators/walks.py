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
from pyspark.sql.window import Window

from linkgraph.graph import LinkGraph
from linkgraph.functions.text import md5int_col
from linkgraph.plans.iterate import LineageChain
from linkgraph.plans.partitioning import stationary

# md5int_col is 15 hex chars = 60 bits; dividing by 2^60 gives a
# uniform double in [0, 1) computable identically in ANSI SQL
_HASH_SPAN = float(1 << 60)


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


def node2vec_walks(
    graph: LinkGraph,
    length: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016):
    DataFrame(start_id, walk_no, step, id). Moving from ``cur`` with
    predecessor ``prev``, each distinct out-neighbor ``nbr`` gets
    unnormalized weight 1/p if nbr == prev (return), 1 if the edge
    prev→nbr exists (stay close), else 1/q (explore); the walker
    samples proportionally.

    Determinism: the same counter hash as ``random_walks`` yields a
    uniform r ∈ [0,1) per (walker, step); the pick is the FIRST
    neighbor in sorted order whose running weight sum exceeds
    r·total. The running sum is IEEE doubles in ascending-neighbor
    order, so an ANSI SQL replay reproduces trajectories exactly
    PROVIDED 1/p and 1/q are binary-exact (dyadic p, q — e.g. 0.25,
    1.0, 4.0): with non-dyadic weights the unordered total's
    summation order is an engine implementation detail and a pick at
    a cum boundary can differ by an ulp across engines (within ONE
    engine results are always reproducible). Step 1 has no
    predecessor: no bias matches, every weight is the constant 1/q,
    and the weighted pick reduces to uniform — one code path for all
    steps.

    Plan shape per step: explode the walkers' neighbor lists
    (O(Σ deg(cur)) rows), one hash join against the stationary edge
    pair set keyed by nbr (the prev-adjacency test — the cost
    second-order bias fundamentally adds over first-order walks),
    then a walker-keyed window cumsum + argmin reusing the same
    shuffle key. Walker state stays sharded by (start_id, walk_no)
    throughout."""
    if p <= 0 or q <= 0:
        raise ValueError("node2vec p and q must be positive")
    # stationary on BOTH join keys: the per-step join is on
    # (nbr, prev), and Spark's co-partition check requires all
    # cluster keys — a single-key partitioning would re-exchange the
    # full E-row pair frame every step
    pairs = stationary(
        graph.sym_edges.select(
            F.col("dst").alias("nbr"), F.col("src").alias("prev")
        ).distinct(),
        ["nbr", "prev"],
    )
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
        F.lit(None).cast("long").alias("prev"),
        F.col("id"),
    )
    out = cur.select("start_id", "walk_no", F.lit(0).alias("step"), "id")
    ochain, cchain = LineageChain(), LineageChain()
    out = ochain.cut(out)
    wk = ["start_id", "walk_no"]
    w_cum = Window.partitionBy(*wk).orderBy("nbr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy(*wk).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for t in range(1, length + 1):
        r = (
            md5int_col(
                F.concat_ws(
                    ":",
                    F.lit(str(seed)),
                    F.col("start_id").cast("string"),
                    F.col("walk_no").cast("string"),
                    F.lit(str(t)),
                )
            ).cast("double")
            / F.lit(_HASH_SPAN)
        )
        ex = (
            cur.join(adj, cur.id == adj.src)
            .select(
                "start_id", "walk_no", "prev",
                F.col("id").alias("cur_id"),
                r.alias("r"),
                F.explode("nbrs").alias("nbr"),
            )
            .join(pairs.withColumn("_adj", F.lit(1)), ["nbr", "prev"], "left")
            .withColumn(
                "w",
                F.when(F.col("nbr") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("_adj") == 1, F.lit(1.0))
                .otherwise(F.lit(1.0 / q)),
            )
        )
        picked = (
            ex.withColumn("cum", F.sum("w").over(w_cum))
            .withColumn("tot", F.sum("w").over(w_tot))
            .filter(F.col("cum") > F.col("r") * F.col("tot"))
            .groupBy(*wk)
            .agg(F.min("nbr").alias("id"), F.min("cur_id").alias("prev"))
        )
        cur = cchain.cut(picked.select("start_id", "walk_no", "prev", "id"))
        out = ochain.cut(
            out.unionAll(
                cur.select("start_id", "walk_no", F.lit(t).alias("step"), "id")
            )
        )
    adj.unpersist()
    pairs.unpersist()
    cchain.release()
    # out's final dir backs the returned frame — leaked on purpose
    return out
