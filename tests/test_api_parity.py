"""Reference API parity sweep (VERDICT r1 items 6-8, 10): multigraph
edge identity, point-lookup/predicate methods, exact small-graph
DFS/Dijkstra fallbacks, Column-valued weights, kamada-kawai layout."""

import math

import pytest
from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph import LinkGraph
from linkgraph.operators.layout import kamada_kawai_layout
from linkgraph.operators.pagerank import pagerank
from linkgraph.operators.traversal import (
    dfs_preorder,
    dijkstra_exact,
    reconstruct_path,
    shortest_paths,
)


# --- multigraph edge identity (multigraph.rs:78-90, lib.rs:948-961) ---------


@pytest.fixture
def parallel_graph(spark):
    # the reference's parallel-edge fixture shape: two 1-2 edges with
    # different weights plus a 2-3 edge
    e = spark.createDataFrame(
        [(1, 2, 5.0), (1, 2, 3.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    return LinkGraph(e, directed=False).with_edge_ids()


def test_edge_ids_assigned_deterministically(parallel_graph):
    rows = {
        (r["src"], r["dst"], r["weight"]): r["edge_id"]
        for r in parallel_graph.edges.collect()
    }
    # ranked by weight within the (src,dst) pair: "e{rank}"
    assert rows[(1, 2, 3.0)] == "e0"
    assert rows[(1, 2, 5.0)] == "e1"
    assert rows[(2, 3, 1.0)] == "e0"


def test_edges_between_and_multiplicity(parallel_graph):
    g = parallel_graph
    assert g.number_of_edges_between(1, 2) == 2
    # undirected probes both orientations (multigraph.rs:922-928)
    assert {r["weight"] for r in g.edges_between(2, 1).collect()} == {3.0, 5.0}
    assert g.number_of_edges_between(1, 3) == 0


def test_remove_edge_by_key_removes_exactly_one(parallel_graph):
    g2 = parallel_graph.remove_edge_by_key(1, 2, "e0")
    assert g2.number_of_edges_between(1, 2) == 1
    assert g2.edges_between(1, 2).collect()[0]["weight"] == 5.0


def test_edge_ids_survive_subgraph_and_reverse(spark, parallel_graph):
    sub = parallel_graph.subgraph([1, 2])
    assert sorted(r["edge_id"] for r in sub.edges.collect()) == ["e0", "e1"]
    rev = parallel_graph.reverse()
    assert "edge_id" in rev.edges.columns
    assert rev.edges.filter((F.col("src") == 2) & (F.col("dst") == 1)).count() == 2


# --- point lookups / predicates (graph.rs:344-346, digraph.rs:154-161) ------


def test_get_node_data(spark):
    v = spark.createDataFrame([(1, "a"), (2, "b")], "id long, label string")
    e = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    g = LinkGraph(e, v, directed=True)
    assert g.get_node_data(1)["label"] == "a"
    assert g.get_node_data(99) is None


def test_has_successor_predecessor(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3)])
    assert g.has_successor(1, 2) and not g.has_successor(2, 1)
    assert g.has_predecessor(2, 1) and not g.has_predecessor(1, 2)


def test_instance_clear(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3)])
    gc = g.clear()
    assert gc.node_count() == 0 and gc.edge_count() == 0


# --- exact driver-side fallbacks (SURVEY §2.5; graph.rs:1015-1134) ----------


def test_dfs_preorder_visits_parent_before_child(spark):
    g = graph_from_edges(spark, [(1, 2), (1, 3), (2, 4), (3, 5)])
    order = dfs_preorder(g, 1)
    assert order[0] == 1
    assert set(order) == {1, 2, 3, 4, 5}
    # deterministic ascending-neighbor preorder: 1,2,4,3,5
    assert order == [1, 2, 4, 3, 5]


def test_dijkstra_exact_matches_reference_fixture(diamond_weighted):
    # lib.rs:152-172 — path A(1)→B(2)→C(3)→D(4), cost 4.0
    res = dijkstra_exact(diamond_weighted, 1, 4)
    cost, path = res[4]
    assert cost == pytest.approx(4.0)
    assert path == [1, 2, 3, 4]


def test_dijkstra_exact_agrees_with_distributed(spark, diamond_weighted):
    dists = shortest_paths(diamond_weighted, 1)
    got = {r["id"]: r["dist"] for r in dists.collect()}
    exact = dijkstra_exact(diamond_weighted, 1)
    assert set(got) == set(exact)
    for k, (cost, _) in exact.items():
        assert got[k] == pytest.approx(cost)
    path, cost = reconstruct_path(dists, 1, 4)
    assert cost == pytest.approx(exact[4][0])


# --- Column-valued weight (graph.rs:1054-1061, layout.rs:38-52) -------------


def test_pagerank_weight_expr_from_json_attr(spark):
    """The WeightExtractor case: weights live in a JSON attrs column;
    pagerank(weight_expr=get_json_object(...)) must equal the run
    over the same values in a plain weight column."""
    rows = [
        (1, 2, 1.0, '{"cost": 2.0}'),
        (2, 3, 1.0, '{"cost": 5.0}'),
        (3, 1, 1.0, '{"cost": 1.0}'),
        (1, 3, 1.0, '{"cost": 7.0}'),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, attrs string")
    g_json = LinkGraph(e, directed=True)
    r_json = pagerank(
        g_json, weight_expr=F.get_json_object("attrs", "$.cost"), tol=1e-10
    ).state
    plain = spark.createDataFrame(
        [(s, d, float(w.split(":")[1].rstrip("}"))) for s, d, _, w in rows],
        "src long, dst long, weight double",
    )
    r_plain = pagerank(LinkGraph(plain, directed=True), tol=1e-10).state
    a = {r["id"]: r["rank"] for r in r_json.collect()}
    b = {r["id"]: r["rank"] for r in r_plain.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


# --- kamada-kawai (layout.rs:679-853) ---------------------------------------


def test_kamada_kawai_path_geometry(spark):
    """On a path graph the layout should order vertices monotonically
    along the dominant axis and keep adjacent pairs closer than
    endpoint pairs — the geometry asserts of layout_tests.rs."""
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], directed=False)
    pos = {r["id"]: (r["x"], r["y"]) for r in kamada_kawai_layout(g).collect()}
    assert len(pos) == 5

    def d(a, b):
        return math.dist(pos[a], pos[b])

    # endpoints farther apart than any adjacent pair
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]:
        assert d(1, 5) > d(a, b)
    # adjacent distances roughly uniform (stress optimum for a path)
    adj = [d(a, b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]]
    assert max(adj) < 2.5 * min(adj)


def test_kamada_kawai_raises_over_budget(spark):
    g = graph_from_edges(spark, [(i, i + 1) for i in range(30)], directed=False)
    with pytest.raises(ValueError):
        kamada_kawai_layout(g, max_nodes=10)


def test_shortest_paths_weight_expr_json(spark):
    rows = [
        (1, 2, 1.0, '{"cost": 1.0}'),
        (2, 3, 1.0, '{"cost": 2.0}'),
        (1, 3, 1.0, '{"cost": 9.0}'),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, attrs string")
    g = LinkGraph(e, directed=True)
    got = {
        r["id"]: r["dist"]
        for r in shortest_paths(
            g, 1, weight_expr=F.get_json_object("attrs", "$.cost")
        ).collect()
    }
    assert got[3] == pytest.approx(3.0)  # via 2, not the 9.0 direct edge


def test_add_edges_with_key_preserves_edge_ids(spark, parallel_graph):
    new = spark.createDataFrame(
        [(1, 2, 9.0, "e9")], "src long, dst long, weight double, edge_id string"
    )
    g2 = parallel_graph.add_edges(new, upsert=False)
    assert g2.number_of_edges_between(1, 2) == 3
    ids = {r["edge_id"] for r in g2.edges_between(1, 2).collect()}
    assert ids == {"e0", "e1", "e9"}
