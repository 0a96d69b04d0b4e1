import networkx as nx

from conftest import collect_map, graph_from_edges
from linkgraph.operators.triangles import (
    clustering_coefficients,
    total_triangles,
    triangle_counts,
)


def test_triangle_plus_tail(triangle_plus_tail):
    assert total_triangles(triangle_plus_tail) == 1
    got = collect_map(triangle_counts(triangle_plus_tail), "id", "triangles")
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}
    cc = collect_map(clustering_coefficients(triangle_plus_tail), "id", "clustering")
    assert cc[1] == 1.0 and cc[2] == 1.0 and abs(cc[3] - 1 / 3) < 1e-12 and cc[4] == 0.0


def test_triangles_directed_projection(scc_mixed):
    # directed edges project onto the simple undirected graph
    assert total_triangles(scc_mixed) == 1


def test_triangles_random_vs_networkx(spark):
    import numpy as np

    rng = np.random.RandomState(83810)
    edges = {(int(rng.randint(0, 40)), int(rng.randint(0, 40))) for _ in range(200)}
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=False, vertices=range(40))

    G = nx.Graph()
    G.add_nodes_from(range(40))
    G.add_edges_from(edges)

    got = collect_map(triangle_counts(g), "id", "triangles")
    assert got == nx.triangles(G)
    assert total_triangles(g) == sum(nx.triangles(G).values()) // 3

    cc = collect_map(clustering_coefficients(g), "id", "clustering")
    want = nx.clustering(G)
    for k in want:
        assert abs(cc[k] - want[k]) < 1e-12


def test_triangles_self_loops_ignored(spark):
    g = graph_from_edges(spark, [(1, 1), (1, 2), (2, 3), (3, 1)], directed=False)
    assert total_triangles(g) == 1
