"""API-parity operators (SURVEY.md §2.1-2.4)."""

import pyspark.sql.functions as F

from conftest import collect_map, graph_from_edges
from linkgraph import LinkGraph


def test_counts(diamond_weighted, triangle_plus_tail):
    assert diamond_weighted.node_count() == 4
    assert diamond_weighted.edge_count() == 5
    # undirected counts canonical pairs once (graph.rs:821-831)
    assert triangle_plus_tail.edge_count() == 4


def test_has_node_edge(diamond_weighted, triangle_plus_tail):
    assert diamond_weighted.has_node(1) and not diamond_weighted.has_node(99)
    assert diamond_weighted.has_edge(1, 2) and not diamond_weighted.has_edge(2, 1)
    # undirected probes both directions
    assert triangle_plus_tail.has_edge(2, 1)
    assert triangle_plus_tail.get_edge_weight(2, 1) == 1.0
    assert diamond_weighted.get_edge_weight(1, 3) == 4.0
    assert diamond_weighted.get_edge_weight(3, 1) is None


def test_degrees(diamond_weighted, triangle_plus_tail, spark):
    out = collect_map(diamond_weighted.out_degrees(), "id", "out_degree")
    ind = collect_map(diamond_weighted.in_degrees(), "id", "in_degree")
    assert out == {1: 2, 2: 2, 3: 1, 4: 0}
    assert ind == {1: 0, 2: 1, 3: 2, 4: 2}
    deg = collect_map(diamond_weighted.degrees(), "id", "degree")
    assert deg == {1: 2, 2: 3, 3: 3, 4: 2}  # in+out (digraph.rs:186-190)
    udeg = collect_map(triangle_plus_tail.degrees(), "id", "degree")
    assert udeg == {1: 2, 2: 2, 3: 3, 4: 1}
    # line3 fixture degrees (src/lib.rs:458-480)
    line3 = graph_from_edges(spark, [(1, 2), (2, 3)], directed=False)
    assert collect_map(line3.degrees(), "id", "degree") == {1: 1, 2: 2, 3: 1}


def test_degree_centrality(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3)], directed=False)
    got = collect_map(g.degree_centrality(), "id", "centrality")
    assert got == {1: 0.5, 2: 1.0, 3: 0.5}


def test_neighbors_successors_predecessors(diamond_weighted):
    assert {r["id"] for r in diamond_weighted.successors(2).collect()} == {3, 4}
    assert {r["id"] for r in diamond_weighted.predecessors(3).collect()} == {1, 2}
    assert {r["id"] for r in diamond_weighted.neighbors(2).collect()} == {3, 4}


def test_subgraph(diamond_weighted):
    sub = diamond_weighted.subgraph([1, 2, 3])
    assert sub.node_count() == 3
    assert {(r["src"], r["dst"]) for r in sub.edges.collect()} == {(1, 2), (1, 3), (2, 3)}


def test_edge_subgraph(diamond_weighted, spark):
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    sub = diamond_weighted.edge_subgraph(pairs)
    assert sub.edge_count() == 2
    assert {r["id"] for r in sub.vertices.collect()} == {1, 2, 3, 4}


def test_reverse(diamond_weighted):
    rev = diamond_weighted.reverse()
    assert {(r["src"], r["dst"]) for r in rev.edges.collect()} == {
        (2, 1), (3, 1), (3, 2), (4, 2), (4, 3)
    }
    # involution
    assert rev.reverse().graph_equal(diamond_weighted)


def test_to_undirected_directed_roundtrip(spark):
    g = graph_from_edges(spark, [(1, 2, 3.0), (2, 1, 7.0), (2, 3, 1.0), (3, 3, 2.0)])
    und = g.to_undirected()
    got = {(r["src"], r["dst"]): r["weight"] for r in und.edges.collect()}
    # deterministic weight rule: min over the pair
    assert got == {(1, 2): 3.0, (2, 3): 1.0, (3, 3): 2.0}
    back = und.to_directed()
    pairs = {(r["src"], r["dst"]) for r in back.edges.collect()}
    assert pairs == {(1, 2), (2, 1), (2, 3), (3, 2), (3, 3)}  # self-loop once


def test_mutation_add_remove(spark, diamond_weighted):
    add = spark.createDataFrame([(4, 1, 9.0), (1, 2, 8.0)], "src long, dst long, weight double")
    g2 = diamond_weighted.add_edges(add)
    assert g2.edge_count() == 6
    assert g2.get_edge_weight(1, 2) == 8.0  # upsert wins (graph.rs:384-396)
    g3 = g2.remove_edges([(4, 1)])
    assert g3.edge_count() == 5
    g4 = g3.remove_nodes([2])  # cascades incident edges (graph.rs:492-512)
    assert g4.node_count() == 3
    assert {(r["src"], r["dst"]) for r in g4.edges.collect()} == {(1, 3), (3, 4)}


def test_set_ops(spark):
    a = graph_from_edges(spark, [(1, 2), (2, 3)])
    b = graph_from_edges(spark, [(2, 3), (3, 4)])
    assert a.union_edges(b).edge_count() == 3
    assert a.intersect_edges(b).edge_count() == 1
    assert a.difference_edges(b).edge_count() == 1
    assert not a.graph_equal(b)
    assert a.graph_equal(a)


def test_find_nodes_nbunch(spark):
    v = spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], "id long, tag string")
    e = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    g = LinkGraph(e, v)
    assert {r["id"] for r in g.find_nodes(F.col("tag") == "x").collect()} == {1, 3}
    assert {r["id"] for r in g.nbunch([2, 3, 99]).collect()} == {2, 3}


def test_adjacency(diamond_weighted):
    adj = {r["src"]: [(x["dst"], x["weight"]) for x in r["adj"]]
           for r in diamond_weighted.adjacency().collect()}
    assert adj[1] == [(2, 1.0), (3, 4.0)]


def test_multigraph_parallel_edges(spark):
    # parallel_edges fixture (src/lib.rs:948-961): rows are edges
    e = spark.createDataFrame(
        [(1, 2, 1.5), (1, 2, 2.0), (2, 3, 3.0)], "src long, dst long, weight double"
    )
    g = LinkGraph(e, directed=False)
    between = g.edges.filter((F.col("src") == 1) & (F.col("dst") == 2))
    assert between.count() == 2  # edges_between (multigraph.rs:922-928)
    assert g.edges.count() == 3  # 3 edge rows, NOT the reference double-count bug


def test_empty_and_clear(spark, diamond_weighted):
    g = LinkGraph.empty(spark)
    assert g.node_count() == 0 and g.edge_count() == 0
    cleared = diamond_weighted.clear_edges()
    assert cleared.edge_count() == 0 and cleared.node_count() == 4


def test_partitioned_layout(diamond_weighted):
    p = diamond_weighted.partitioned(4)
    assert p.edges.rdd.getNumPartitions() == 4
    assert p.graph_equal(diamond_weighted)


def test_degree_stats_and_hubs(star_hub):
    hubs = star_hub.hubs(min_degree=2)
    assert hubs.count() == 0  # spokes have in-degree 1
    rev_hubs = star_hub.reverse().hubs(min_degree=50)
    assert collect_map(rev_hubs, "id", "in_degree") == {0: 50}


def test_bucketed_table_roundtrip_avoids_shuffle(spark, tmp_path):
    """write_bucketed persists the CSR layout durably: a src-keyed
    aggregation over the read-back table plans NO Exchange (the
    bucket spec satisfies the required distribution)."""
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(i % 7, i % 5 + 10, float(i)) for i in range(100)])
    g.write_bucketed("bucketed_edges_test", n_buckets=4, path=str(tmp_path / "be"))
    try:
        g2 = LinkGraph.read_table(spark, "bucketed_edges_test")
        assert g2.edge_count() == g.edge_count()
        agg = g2.edges.groupBy("src").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")


def test_iterative_operators_on_empty_graph(spark):
    """Empty-graph degenerate case: every iterative operator returns
    an empty (or start-only) result instead of looping or raising."""
    from linkgraph.operators.components import (
        strongly_connected_components,
        weakly_connected_components,
    )
    from linkgraph.operators.kcore import core_numbers
    from linkgraph.operators.mst import minimum_spanning_forest
    from linkgraph.operators.pagerank import pagerank

    g = LinkGraph.empty(spark, directed=True)
    gu = LinkGraph.empty(spark, directed=False)
    assert pagerank(g).state.count() == 0
    assert weakly_connected_components(g).state.count() == 0
    assert strongly_connected_components(g).count() == 0
    assert core_numbers(gu).count() == 0
    assert minimum_spanning_forest(gu).count() == 0


def test_random_edges_deterministic_and_partition_invariant(spark):
    from linkgraph.sources.random_graph import random_edges

    a = random_edges(spark, 100, 500, seed=7, partitions=2).collect()
    b = random_edges(spark, 100, 500, seed=7, partitions=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 500
    assert all(0 <= r["src"] < 100 and 0 <= r["dst"] < 100 and r["src"] != r["dst"] for r in a)
    c = random_edges(spark, 100, 500, seed=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_random_edges_zipf_skew(spark):
    from pyspark.sql import functions as F

    from linkgraph.sources.random_graph import random_edges

    e = random_edges(spark, 1000, 20_000, seed=3, zipf_s=1.2)
    deg = e.groupBy("src").count().persist()
    top = deg.orderBy(F.desc("count")).limit(10).agg(F.sum("count")).collect()[0][0]
    distinct_srcs = deg.count()
    # hub-heavy: top-10 sources hold well over 10x the uniform share...
    assert top > 10 * (20_000 / 1000)
    # ...but NOT degenerate (the round-2 bug: a broken inverse-CDF
    # clamped every source to vertex n-1, a triangle-free star)
    assert distinct_srcs > 100
    assert top < 20_000


def test_with_edge_ids_equal_weight_tiebreak_deterministic(spark):
    """Parallel edges with EQUAL weights must still get a stable
    edge_id assignment: the content-hash tiebreaker (not partition
    order) decides, so repeated builds agree row-for-row."""
    from linkgraph import LinkGraph
    from pyspark.sql import functions as F

    rows = [(1, 2, 1.0, f"tag{i}") for i in range(5)] + [(3, 4, 2.0, "x")]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, attrs string")

    def build():
        g = LinkGraph(e.repartition(8), directed=True).with_edge_ids()
        return {r["attrs"]: r["edge_id"] for r in g.edges.collect()}

    a, b = build(), build()
    assert a == b
    assert sorted(a[f"tag{i}"] for i in range(5)) == ["e0", "e1", "e2", "e3", "e4"]


def test_quotient_graph(spark):
    from linkgraph.graph import quotient_graph

    # blocks: {1,2} -> A(10), {3} -> B(20); 4 unlabeled (dropped)
    g = graph_from_edges(
        spark, [(1, 3, 2.0), (2, 3, 5.0), (1, 2, 1.0), (3, 1, 4.0), (1, 4, 9.0)],
        directed=True,
    )
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "id long, label long"
    )
    q = quotient_graph(g, labels)
    got = {(r["src"], r["dst"]): r["weight"] for r in q.edges.collect()}
    assert got == {(10, 20): 7.0, (20, 10): 4.0}
    assert {r["id"] for r in q.vertices.collect()} == {10, 20}
    assert q.directed
    # self_loops=True keeps the intra-block edge
    q2 = quotient_graph(g, labels, self_loops=True)
    got2 = {(r["src"], r["dst"]): r["weight"] for r in q2.edges.collect()}
    assert got2[(10, 10)] == 1.0


def test_stationary_operand_skips_per_round_exchange(spark):
    """The engine's core plan property: an edge operand cached via
    plans.partitioning.stationary publishes HashPartitioning(key), so
    the per-round state⋈edges join re-shuffles ONLY the state side.
    Broadcast is disabled so the join must satisfy a hash
    distribution; the dst-keyed Exchange must appear in the raw
    frame's plan and must NOT appear above the stationary frame's
    InMemoryTableScan (the only dst Exchange allowed is the one-time
    repartition INSIDE the cache build)."""
    from pyspark.sql import functions as F

    from linkgraph.plans.partitioning import stationary

    e = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("src"),
        (F.col("id") % 777).alias("dst"),
    )
    state = spark.range(0, 777).select(
        F.col("id"), (F.col("id") * 2).alias("s0")
    )

    def join_plan(ed):
        j = ed.join(state, ed["dst"] == state["id"]).select(ed["src"], state["s0"])
        return j._jdf.queryExecution().executedPlan().toString()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    st = stationary(e, key="dst", rows=20_000_000)  # rows hint: real-sized
    try:
        st.count()  # materialize: the partitioning becomes visible
        p_raw = join_plan(e)
        assert "hashpartitioning(dst" in p_raw  # raw operand re-shuffles
        p_st = join_plan(st)
        above_cache = p_st.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in p_st
        assert "hashpartitioning(dst" not in above_cache
    finally:
        st.unpersist()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
