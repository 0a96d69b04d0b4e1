"""Topological generations vs networkx.topological_generations, plus
loud-failure behavior on cycles and misuse."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.dag import topological_generations


def _rand_dag(seed, n=40, m=120):
    """Random DAG: edges only go low→high id, so acyclic by
    construction; ids then scrambled through an affine map to avoid
    accidentally testing sorted-id layouts only."""
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a < b:
            pairs.add((a, b))
    return sorted((a * 7919 + 13, b * 7919 + 13) for a, b in pairs)


@pytest.mark.parametrize("seed", [3, 11])
def test_generations_vs_networkx(spark, seed):
    edges = _rand_dag(seed)
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["generation"]
           for r in topological_generations(g).collect()}
    G = nx.DiGraph(edges)
    want = {}
    for i, layer in enumerate(nx.topological_generations(G)):
        for v in layer:
            want[v] = i
    assert got == want


def test_generations_isolated_vertices(spark):
    g = graph_from_edges(spark, [(1, 2)], directed=True, vertices=[1, 2, 9])
    got = {r["id"]: r["generation"]
           for r in topological_generations(g).collect()}
    assert got == {1: 0, 9: 0, 2: 1}


def test_generations_cycle_raises(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 1), (0, 1)], directed=True)
    with pytest.raises(ValueError, match="cycle"):
        topological_generations(g)


def test_generations_self_loop_raises(spark):
    g = graph_from_edges(spark, [(1, 1), (1, 2)], directed=True)
    with pytest.raises(ValueError, match="cycle"):
        topological_generations(g)


def test_generations_requires_directed(spark):
    g = graph_from_edges(spark, [(1, 2)], directed=False)
    with pytest.raises(ValueError, match="directed"):
        topological_generations(g)


def test_dag_longest_path_vs_networkx(spark):
    import random as _r
    from linkgraph.operators.dag import dag_longest_path

    rng = _r.Random(9)
    pairs = sorted({(a, b) for a, b in
                    ((rng.randrange(25), rng.randrange(25)) for _ in range(90))
                    if a < b})
    edges = [(a, b, float(rng.randrange(1, 6))) for a, b in pairs]
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["dist"] for r in dag_longest_path(g).collect()}
    G = nx.DiGraph()
    G.add_weighted_edges_from(edges)
    # NetworkX per-vertex longest distance: max over topological preds
    want = {v: 0.0 for v in G}
    for v in nx.topological_sort(G):
        for _, u, d in G.out_edges(v, data=True):
            want[u] = max(want[u], want[v] + d["weight"])
    assert got == want


def test_dag_longest_path_cycle_raises(spark):
    from linkgraph.operators.dag import dag_longest_path

    g = graph_from_edges(spark, [(1, 2), (2, 1)], directed=True)
    with pytest.raises(ValueError, match="cycle"):
        dag_longest_path(g)
