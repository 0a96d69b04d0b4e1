"""LinkGraph — the engine's graph abstraction: a pair of DataFrames.

Re-expresses the reference's four adjacency-map classes
(/root/reference/src/graph/{graph,digraph,multigraph,multidigraph}.rs)
as ONE immutable table-pair with a ``directed`` flag and a
``multi`` flag:

- vertices: DataFrame(id long, …payload columns)
- edges:    DataFrame(src long, dst long, weight double[, edge_id])

Every mutation returns a NEW LinkGraph (union / anti-join lineage);
every neighbor loop is a join; the reverse-adjacency ``pred`` map
(digraph.rs:26) needs no materialization — group by ``dst`` instead
of ``src``. Parallel edges are duplicate rows (multigraph.rs:79's
"e{n}" keys become an ``edge_id`` column when present).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _ids_df(graph_df: DataFrame, ids: list[int] | DataFrame) -> DataFrame:
    if isinstance(ids, DataFrame):
        return ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
    spark = graph_df.sparkSession
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


class LinkGraph:
    def __init__(
        self,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        directed: bool = True,
        name: str = "",
    ):
        cols = edges.columns
        assert "src" in cols and "dst" in cols, f"edge table needs src/dst, got {cols}"
        if "weight" not in cols:
            edges = edges.withColumn("weight", F.lit(1.0))
        self.edges = edges
        self._vertices = vertices
        self.directed = directed
        self.name = name
        self._operands: dict = {}

    # --- memoized operands ----------------------------------------------------

    def operand(self, key: tuple, build):
        """Memoized per-graph operand (persisted stationary frames,
        counts). LinkGraph is IMMUTABLE — every mutation API returns a
        new graph with an empty cache — so any pure function of the
        graph can park its result here and every later operator call
        on the same object reuses it. This is what makes a standing
        rank service cheap: the second and every further
        pagerank/opic call on a graph skips the transition-table
        build (count + normalize + parquet roundtrip + repartition +
        persist) entirely, paying only the per-iteration SpMV — the
        steady-state throughput the north metric measures. Entries
        hold until :meth:`release_operands` or garbage collection of
        the graph object."""
        if key not in self._operands:
            self._operands[key] = build()
        return self._operands[key]

    def release_operands(self) -> None:
        """Unpersist and drop every memoized operand. Safe while
        results derived from them are still live — Spark recomputes
        uncached frames from lineage (the stationary builds are
        parquet-roundtripped, so recompute is a durable scan)."""
        for v in self._operands.values():
            if hasattr(v, "unpersist"):
                try:
                    v.unpersist()
                except Exception:
                    pass
        self._operands.clear()

    def __del__(self):
        # best-effort: don't pin executor memory for the session's
        # lifetime once the graph object is gone (py4j may already be
        # down at interpreter shutdown — swallow everything)
        try:
            self.release_operands()
        except Exception:
            pass

    # --- construction -------------------------------------------------------

    @classmethod
    def empty(cls, spark, directed: bool = True) -> "LinkGraph":
        e = spark.createDataFrame([], "src long, dst long, weight double")
        v = spark.createDataFrame([], "id long")
        return cls(e, v, directed)

    @classmethod
    def from_pages(cls, pages: DataFrame, **kw) -> "LinkGraph":
        from linkgraph.sources.edges import build_edges, vertices_from_pages

        return cls(build_edges(pages, **kw), vertices_from_pages(pages), directed=True)

    # --- vertex / edge views --------------------------------------------------

    @property
    def vertices(self) -> DataFrame:
        """Vertex table; derived from edge endpoints when not given
        (the MultiDiGraph auto-create-endpoint behavior,
        multidigraph.rs:119-125, as a set semantics instead of a
        mutation)."""
        if self._vertices is not None:
            return self._vertices
        return (
            self.edges.select(F.col("src").alias("id"))
            .unionAll(self.edges.select(F.col("dst").alias("id")))
            .distinct()
        )

    @property
    def sym_edges(self) -> DataFrame:
        """Traversal view: directed graphs as-is; undirected graphs
        materialize both directions (what graph.rs:391-394 does by
        double-insert) with self-loops emitted once."""
        e = self.edges
        if self.directed:
            return e
        # mirror swaps src/dst and carries every other edge column
        # (edge_id, attr payloads) through unchanged
        sel = [
            F.col("dst").alias("src") if c == "src"
            else F.col("src").alias("dst") if c == "dst"
            else F.col(c)
            for c in e.columns
        ]
        mirrored = e.filter(F.col("src") != F.col("dst")).select(*sel)
        return e.unionAll(mirrored)

    def canonical_edges(self) -> DataFrame:
        """Undirected canonical (min,max) edge view — the counting
        semantics of graph.rs:821-831."""
        return self.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).dropDuplicates(["src", "dst"])

    # --- mutation (immutable: returns new graphs) -----------------------------

    def add_nodes(self, nodes: DataFrame) -> "LinkGraph":
        v = self.vertices.unionByName(nodes, allowMissingColumns=True).dropDuplicates(["id"])
        return LinkGraph(self.edges, v, self.directed, self.name)

    def add_edges(self, new_edges: DataFrame, upsert: bool = True) -> "LinkGraph":
        """Batch add_edge (graph.rs:384-396). ``upsert`` = last-wins
        weight on duplicate (src,dst); False keeps parallel rows
        (MultiGraph semantics). When BOTH sides carry ``edge_id`` and
        ``upsert=False``, the keys ride along — the
        add_edge_with_key path (multigraph.rs:878-910)."""
        if (
            not upsert
            and "edge_id" in self.edges.columns
            and "edge_id" in new_edges.columns
        ):
            merged = self.edges.select("src", "dst", "weight", "edge_id").unionAll(
                new_edges.select("src", "dst", "weight", "edge_id")
            )
            return LinkGraph(merged, self._vertices, self.directed, self.name)
        old = self.edges.select("src", "dst", "weight").withColumn("_batch", F.lit(0))
        new = new_edges.select("src", "dst", "weight").withColumn("_batch", F.lit(1))
        both = old.unionAll(new)
        if upsert:
            from pyspark.sql.window import Window

            # new batch wins; duplicates WITHIN a batch break ties by
            # min weight — fully deterministic (partition order never
            # decides which row survives; SURVEY §4.2.6)
            w = Window.partitionBy("src", "dst").orderBy(F.desc("_batch"), F.asc("weight"))
            both = both.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        merged = both.select("src", "dst", "weight")
        v = self._vertices
        return LinkGraph(merged, v, self.directed, self.name)

    def remove_nodes(self, ids: list[int] | DataFrame) -> "LinkGraph":
        """Cascading node delete (graph.rs:492-512) as three
        anti-joins — no full adjacency sweep needed."""
        dead = _ids_df(self.edges, ids)
        v = self.vertices.join(dead, "id", "left_anti")
        e = (
            self.edges.join(dead, self.edges.src == dead.id, "left_anti")
            .join(dead, F.col("dst") == dead.id, "left_anti")
        )
        return LinkGraph(e, v, self.directed, self.name)

    def remove_edges(self, pairs: list[tuple[int, int]] | DataFrame) -> "LinkGraph":
        if not isinstance(pairs, DataFrame):
            pairs = self.edges.sparkSession.createDataFrame(
                [(int(a), int(b)) for a, b in pairs], "src long, dst long"
            )
        if not self.directed:
            pairs = pairs.unionAll(
                pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        e = self.edges.join(pairs, ["src", "dst"], "left_anti")
        return LinkGraph(e, self._vertices, self.directed, self.name)

    def clear_edges(self) -> "LinkGraph":
        return LinkGraph(self.edges.limit(0), self.vertices, self.directed, self.name)

    def update(self, other: "LinkGraph") -> "LinkGraph":
        """Graph union (graph.rs:980-999): nodes then edges. The
        reference inserts other's edges via upsert, so on a (src,dst)
        conflict OTHER's weight wins; duplicate pairs within one side
        resolve to min weight — a deterministic rule (dropDuplicates
        would keep a partition-order-dependent row)."""
        from pyspark.sql.window import Window

        v = self.vertices.select("id").unionAll(other.vertices.select("id")).distinct()
        a = self.edges.select("src", "dst", "weight").withColumn("_pri", F.lit(0))
        b = other.edges.select("src", "dst", "weight").withColumn("_pri", F.lit(1))
        w = Window.partitionBy("src", "dst").orderBy(F.desc("_pri"), F.asc("weight"))
        e = (
            a.unionAll(b)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("src", "dst", "weight")
        )
        return LinkGraph(e, v, self.directed, self.name)

    # --- predicates / lookups -------------------------------------------------

    def has_node(self, key: int) -> bool:
        return self.vertices.filter(F.col("id") == key).limit(1).count() > 0

    def has_edge(self, u: int, v: int) -> bool:
        probe = self.sym_edges if not self.directed else self.edges
        return probe.filter((F.col("src") == u) & (F.col("dst") == v)).limit(1).count() > 0

    def get_node_data(self, key: int):
        """Point lookup of a vertex's payload row (graph.rs:344-346);
        None when absent. In-plan batches should semi-join instead."""
        rows = self.vertices.filter(F.col("id") == key).take(1)
        return rows[0] if rows else None

    def has_successor(self, u: int, v: int) -> bool:
        """digraph.rs:154-157 — edge u→v exists."""
        return self.edges.filter((F.col("src") == u) & (F.col("dst") == v)).limit(1).count() > 0

    def has_predecessor(self, u: int, v: int) -> bool:
        """digraph.rs:159-161 — edge v→u exists."""
        return self.edges.filter((F.col("src") == v) & (F.col("dst") == u)).limit(1).count() > 0

    def clear(self) -> "LinkGraph":
        """graph.rs:851-856 — drop all nodes and edges (immutable:
        returns the empty graph)."""
        return LinkGraph.empty(self.edges.sparkSession, self.directed)

    def get_edge_weight(self, u: int, v: int) -> float | None:
        probe = self.sym_edges if not self.directed else self.edges
        rows = probe.filter((F.col("src") == u) & (F.col("dst") == v)).select("weight").take(1)
        return rows[0]["weight"] if rows else None

    def find_nodes(self, predicate: Column) -> DataFrame:
        """find_nodes / find_nodes_par (graph.rs:1135-1178) — a
        Catalyst predicate; partition parallelism is implicit."""
        return self.vertices.filter(predicate)

    def nbunch(self, ids: list[int] | DataFrame) -> DataFrame:
        """nbunch_iter (graph.rs:1000-1014): restrict to existing ids."""
        return _ids_df(self.edges, ids).join(self.vertices.select("id"), "id", "left_semi")

    # --- neighborhoods ---------------------------------------------------------

    def neighbors(self, key: int) -> DataFrame:
        return self.sym_edges.filter(F.col("src") == key).select(F.col("dst").alias("id"))

    def successors(self, key: int) -> DataFrame:
        return self.edges.filter(F.col("src") == key).select(F.col("dst").alias("id"))

    def predecessors(self, key: int) -> DataFrame:
        return self.edges.filter(F.col("dst") == key).select(F.col("src").alias("id"))

    def adjacency(self) -> DataFrame:
        """adjacency()/adj() (graph.rs:717-722) as collected structs."""
        return self.sym_edges.groupBy("src").agg(
            F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("adj")
        )

    # --- aggregations -----------------------------------------------------------

    def out_degrees(self) -> DataFrame:
        return (
            self.vertices.select("id")
            .join(self.edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("n")), "id", "left")
            .select("id", F.coalesce("n", F.lit(0)).alias("out_degree"))
        )

    def in_degrees(self) -> DataFrame:
        return (
            self.vertices.select("id")
            .join(self.edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("n")), "id", "left")
            .select("id", F.coalesce("n", F.lit(0)).alias("in_degree"))
        )

    def degrees(self) -> DataFrame:
        """Undirected: adjacency-row length (graph.rs:751-764).
        Directed: in+out (digraph.rs:186-190)."""
        if self.directed:
            return (
                self.in_degrees()
                .join(self.out_degrees(), "id")
                .select("id", (F.col("in_degree") + F.col("out_degree")).alias("degree"))
            )
        deg = self.sym_edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("n"))
        return (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("n", F.lit(0)).alias("degree"))
        )

    def degree_centrality(self) -> DataFrame:
        n = self.vertices.count()
        scale = 1.0 / max(n - 1, 1)
        return self.degrees().select("id", (F.col("degree") * scale).alias("centrality"))

    def node_count(self) -> int:
        return self.vertices.count()

    def edge_count(self) -> int:
        """Directed: rows. Undirected: distinct canonical pairs
        (graph.rs:821-831) — deliberately NOT the reference
        MultiGraph double-count bug (multigraph.rs:642)."""
        if self.directed:
            return self.edges.count()
        return self.canonical_edges().count()

    # --- subgraphs / conversions -------------------------------------------------

    def subgraph(self, ids: list[int] | DataFrame) -> "LinkGraph":
        """Induced subgraph (graph.rs:919-945): double semi-join."""
        keep = _ids_df(self.edges, ids)
        e = (
            self.edges.join(keep, self.edges.src == keep.id, "left_semi")
            .join(keep, F.col("dst") == keep.id, "left_semi")
        )
        v = self.vertices.join(keep, "id", "left_semi")
        return LinkGraph(e, v, self.directed, self.name)

    def edge_subgraph(self, pairs: DataFrame) -> "LinkGraph":
        """Subgraph induced by an edge set + incident nodes
        (graph.rs:956-979)."""
        e = self.edges.join(pairs.select("src", "dst"), ["src", "dst"], "left_semi")
        v = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        return LinkGraph(e, v, self.directed, self.name)

    def reverse(self) -> "LinkGraph":
        """reverse()/reverse_par() (digraph.rs:203-221, 299-332) —
        a pure projection, no data movement until acted on. Extra
        edge columns (edge_id, attrs) survive, matching MultiDiGraph
        reverse's key preservation (multidigraph.rs:578-596)."""
        sel = [
            F.col("dst").alias("src") if c == "src"
            else F.col("src").alias("dst") if c == "dst"
            else F.col(c)
            for c in self.edges.columns
        ]
        return LinkGraph(self.edges.select(*sel), self._vertices, self.directed, self.name)

    # --- multigraph edge identity (multigraph.rs:78-90, 878-910) --------------

    def with_edge_ids(self, order_cols: list[str] | None = None) -> "LinkGraph":
        """Assign the parallel-edge key column ``edge_id`` the
        reference keys edges with ("e{n}", multigraph.rs:79). A global
        insertion counter doesn't distribute; the deterministic analog
        is "e{rank within (src,dst)}" ranked by ``order_cols``
        (default: weight — callers supply columns that totally order
        parallel edges for a stable key). A content hash of the full
        edge row is always appended as the final tiebreaker, so
        equal-``order_cols`` parallel edges still rank totally and
        deterministically (partition order never decides). Keys
        survive subgraph / edge_subgraph / reverse, matching
        multigraph.rs:878-910."""
        from pyspark.sql.window import Window

        if "edge_id" in self.edges.columns:
            return self
        order = list(order_cols or ["weight"])
        order.append(F.xxhash64(*[F.col(c) for c in self.edges.columns]))
        w = Window.partitionBy("src", "dst").orderBy(*order)
        e = self.edges.withColumn(
            "edge_id", F.concat(F.lit("e"), (F.row_number().over(w) - 1).cast("string"))
        )
        return LinkGraph(e, self._vertices, self.directed, self.name)

    def edges_between(self, u: int, v: int) -> DataFrame:
        """All parallel edges u-v (multigraph.rs:922-928, 956-968);
        undirected graphs probe both orientations."""
        probe = self.edges if self.directed else self.sym_edges
        return probe.filter((F.col("src") == u) & (F.col("dst") == v))

    def number_of_edges_between(self, u: int, v: int) -> int:
        """multigraph.rs:240-242 — parallel-edge multiplicity."""
        return self.edges_between(u, v).count()

    def remove_edge_by_key(self, u: int, v: int, edge_id: str) -> "LinkGraph":
        """Keyed removal of ONE parallel edge (the MultiGraph
        remove_edge_with_key semantics). Requires with_edge_ids."""
        assert "edge_id" in self.edges.columns, "call with_edge_ids() first"
        cond = (F.col("src") == u) & (F.col("dst") == v) & (F.col("edge_id") == edge_id)
        if not self.directed:
            cond = cond | (
                (F.col("src") == v) & (F.col("dst") == u) & (F.col("edge_id") == edge_id)
            )
        return LinkGraph(self.edges.filter(~cond), self._vertices, self.directed, self.name)

    def to_undirected(self) -> "LinkGraph":
        """Canonical (min,max) dedup (graph.rs:203-237). The reference
        keeps a HashMap-order-dependent weight; we pin the
        deterministic rule weight = min over the pair."""
        e = (
            self.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.min("weight").alias("weight"))
        )
        return LinkGraph(e, self._vertices, directed=False, name=self.name)

    def to_directed(self) -> "LinkGraph":
        """Both directions per undirected edge, self-loops once
        (graph.rs:146-183)."""
        if self.directed:
            return LinkGraph(self.edges, self._vertices, True, self.name)
        return LinkGraph(self.sym_edges, self._vertices, True, self.name)

    # --- relational set ops (free in the table model, SURVEY §2.4) -----------------

    def union_edges(self, other: "LinkGraph") -> "LinkGraph":
        return self.update(other)

    def intersect_edges(self, other: "LinkGraph") -> "LinkGraph":
        e = self.edges.select("src", "dst", "weight").intersect(
            other.edges.select("src", "dst", "weight")
        )
        return LinkGraph(e, None, self.directed, self.name)

    def difference_edges(self, other: "LinkGraph") -> "LinkGraph":
        e = self.edges.select("src", "dst", "weight").exceptAll(
            other.edges.select("src", "dst", "weight")
        )
        return LinkGraph(e, None, self.directed, self.name)

    def graph_equal(self, other: "LinkGraph") -> bool:
        """PartialEq (graph.rs:1501-1527) via symmetric except."""
        a = self.edges.select("src", "dst", "weight")
        b = other.edges.select("src", "dst", "weight")
        if a.exceptAll(b).limit(1).count() or b.exceptAll(a).limit(1).count():
            return False
        va, vb = self.vertices.select("id"), other.vertices.select("id")
        return not (va.exceptAll(vb).limit(1).count() or vb.exceptAll(va).limit(1).count())

    # --- physical layout ------------------------------------------------------------

    def partitioned(self, n: int) -> "LinkGraph":
        """CSR-like blocks: hash-partition by src, sort within
        partitions — the layout iterative SpMV joins want (SURVEY
        §4.2.4). Persisted bucketed tables give the same effect
        durably."""
        e = self.edges.repartition(n, "src").sortWithinPartitions("src", "dst")
        return LinkGraph(e, self._vertices, self.directed, self.name)

    def write_bucketed(
        self, table: str, n_buckets: int = 64, path: str | None = None
    ) -> None:
        """Durable CSR layout (SURVEY §4.2.4): bucket the edge table
        by ``src`` and sort within buckets, so EVERY later session's
        src-keyed joins and aggregations read it pre-distributed —
        Catalyst sees the bucket spec in the catalog and plans no
        Exchange on this side. On a production catalog this is the
        Iceberg `bucket(src)` partition transform; here it is Spark
        native bucketing (requires saveAsTable)."""
        w = (
            self.edges.write.mode("overwrite")
            .bucketBy(n_buckets, "src")
            .sortBy("src", "dst")
        )
        if path:
            w = w.option("path", path)
        w.saveAsTable(table)

    @classmethod
    def read_table(cls, spark, table: str, directed: bool = True) -> "LinkGraph":
        """Read a write_bucketed table back with its bucket spec."""
        return cls(spark.table(table), directed=directed)

    def degree_stats(self) -> DataFrame:
        """Out-degree histogram in log2 buckets — drives hub/salt
        decisions (north rule skew mitigation)."""
        deg = self.edges.groupBy("src").agg(F.count("*").alias("d"))
        return (
            deg.groupBy(F.floor(F.log2(F.col("d").cast("double"))).alias("log2_bucket"))
            .agg(F.count("*").alias("vertices"), F.sum("d").alias("edges"))
            .orderBy("log2_bucket")
        )

    def hubs(self, min_degree: int) -> DataFrame:
        return (
            self.edges.groupBy(F.col("dst").alias("id"))
            .agg(F.count("*").alias("in_degree"))
            .filter(F.col("in_degree") >= min_degree)
        )


def quotient_graph(
    graph: "LinkGraph",
    labels: DataFrame,
    self_loops: bool = False,
) -> "LinkGraph":
    """Community/partition collapse: the graph whose vertices are the
    distinct labels and whose edge (a, b) aggregates the weights of
    all original edges between a member of a and a member of b — the
    generalization of the host-graph pipeline (sources/edges.py
    build_host_edges) to arbitrary partitions: SCC condensations,
    LPA/WCC community graphs, domain rollups. ``labels`` is
    DataFrame(id, label); vertices missing a label are dropped with
    their edges (the subgraph-then-collapse semantics). Intra-block
    edges are dropped unless ``self_loops``.

    Scale shape: two hash joins keyed on the edge endpoints + one
    groupBy on the (label, label) pair — the label table is typically
    V-row but the output E'-row is tiny; no driver state.
    """
    lab = labels.select(F.col("id"), F.col("label"))
    e = graph.edges
    src_l = lab.select(F.col("id").alias("src"), F.col("label").alias("_sl"))
    dst_l = lab.select(F.col("id").alias("dst"), F.col("label").alias("_dl"))
    collapsed = (
        e.join(src_l, "src")
        .join(dst_l, "dst")
        .select(
            F.col("_sl").alias("src"),
            F.col("_dl").alias("dst"),
            F.col("weight"),
        )
    )
    if not self_loops:
        collapsed = collapsed.filter(F.col("src") != F.col("dst"))
    edges = collapsed.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    verts = lab.select(F.col("label").alias("id")).distinct()
    return LinkGraph(edges, verts, directed=graph.directed)
