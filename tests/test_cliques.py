import itertools

import networkx as nx

from conftest import collect_map, graph_from_edges
from linkgraph.operators.cliques import (
    four_clique_counts,
    four_clique_list,
    total_four_cliques,
)


def _nx_four_cliques(G):
    """Every 4-subset of vertices that is a clique, plus per-vertex
    participation counts."""
    per_vertex = {v: 0 for v in G}
    total = 0
    for quad in itertools.combinations(sorted(G), 4):
        if all(G.has_edge(a, b) for a, b in itertools.combinations(quad, 2)):
            total += 1
            for v in quad:
                per_vertex[v] += 1
    return total, per_vertex


def test_k5_has_five_four_cliques(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    g = graph_from_edges(spark, edges, directed=False)
    assert total_four_cliques(g) == 5  # C(5,4)
    got = collect_map(four_clique_counts(g), "id", "four_cliques")
    assert got == {v: 4 for v in range(5)}  # C(4,3) each


def test_four_cliques_random_vs_networkx(spark):
    import numpy as np

    rng = np.random.RandomState(61047)
    edges = {(int(rng.randint(0, 25)), int(rng.randint(0, 25))) for _ in range(180)}
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=False, vertices=range(25))

    G = nx.Graph()
    G.add_nodes_from(range(25))
    G.add_edges_from(edges)

    total, per_vertex = _nx_four_cliques(G)
    assert total_four_cliques(g) == total
    assert collect_map(four_clique_counts(g), "id", "four_cliques") == per_vertex

    # each clique listed exactly once, sorted corners
    rows = four_clique_list(g).collect()
    quads = [(r.w, r.x, r.y, r.z) for r in rows]
    assert len(quads) == len(set(quads)) == total
    assert all(w < x < y < z for w, x, y, z in quads)


def test_four_cliques_self_loops_and_direction_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 3), (2, 3), (3, 4), (1, 4), (4, 2)]
    g = graph_from_edges(spark, edges, directed=True)
    assert total_four_cliques(g) == 1
    got = collect_map(four_clique_counts(g), "id", "four_cliques")
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
