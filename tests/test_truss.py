"""k-truss peeling vs NetworkX."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.truss import k_truss, truss_numbers
from linkgraph.plans.iterate import ConvergenceError


def _rand_undirected(seed, n=22, m=90):
    rng = random.Random(seed)
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    return sorted((min(a, b), max(a, b)) for a, b in pairs if a != b)


def _edge_set(g):
    return {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.collect()
    }


def test_k_truss_vs_networkx(spark):
    edges = _rand_undirected(7)
    g = graph_from_edges(spark, edges, directed=False)
    G = nx.Graph(edges)
    for k in (3, 4, 5):
        got = _edge_set(k_truss(g, k))
        want = {(min(a, b), max(a, b)) for a, b in nx.k_truss(G, k).edges}
        assert got == want, k


def test_k_truss_clique_plus_tail(spark):
    # K5 survives k<=5; the pendant path peels at k=3
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges = k5 + [(4, 10), (10, 11)]
    g = graph_from_edges(spark, edges, directed=False)
    assert _edge_set(k_truss(g, 3)) == set(k5)
    assert _edge_set(k_truss(g, 5)) == set(k5)
    assert _edge_set(k_truss(g, 6)) == set()


def test_truss_numbers_consistent_with_k_truss(spark):
    edges = _rand_undirected(19)
    g = graph_from_edges(spark, edges, directed=False)
    tn = {(r["a"], r["b"]): r["truss"] for r in truss_numbers(g).collect()}
    assert set(tn) == set(edges)
    G = nx.Graph(edges)
    kmax = max(tn.values())
    for k in range(3, kmax + 2):
        want = {(min(a, b), max(a, b)) for a, b in nx.k_truss(G, k).edges}
        got = {e for e, t in tn.items() if t >= k}
        assert got == want, k


def test_k_truss_exhaustion_raises(spark):
    # a long cascade: path graphs peel everything at k=3 in one round,
    # so force max_rounds=0 to hit the budget
    edges = _rand_undirected(7)
    g = graph_from_edges(spark, edges, directed=False)
    with pytest.raises(ConvergenceError):
        k_truss(g, 4, max_rounds=0)
