import networkx as nx

from conftest import graph_from_edges
from linkgraph.operators.mst import minimum_spanning_forest


def test_mst_simple(spark):
    # square with one diagonal: MST must take the three cheapest
    g = graph_from_edges(
        spark,
        [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (4, 1, 5.0), (1, 3, 10.0)],
        directed=False,
    )
    got = {(r["src"], r["dst"], r["weight"]) for r in minimum_spanning_forest(g).collect()}
    assert got == {(1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0)}


def test_mst_forest_per_component(spark, two_components):
    got = minimum_spanning_forest(two_components).collect()
    assert len(got) == 2  # one edge per 2-node component


def test_mst_random_vs_networkx_weight(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    edges, seen = [], set()
    while len(edges) < 120:
        a, b = sorted((int(rng.randint(0, 30)), int(rng.randint(0, 30))))
        if a != b and (a, b) not in seen:
            seen.add((a, b))
            edges.append((a, b, float(rng.uniform(1, 10))))
    g = graph_from_edges(spark, edges, directed=False, vertices=range(30))
    got = minimum_spanning_forest(g).collect()
    G = nx.Graph()
    G.add_nodes_from(range(30))
    G.add_weighted_edges_from(edges)
    want = nx.minimum_spanning_tree(G)
    assert abs(sum(r["weight"] for r in got) - want.size(weight="weight")) < 1e-9
    assert len(got) == want.number_of_edges()
