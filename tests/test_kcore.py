"""k-core decomposition vs the NetworkX oracle."""

import random

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.kcore import core_numbers, k_core


def _nx_graph(edges):
    G = nx.Graph()
    G.add_edges_from((a, b) for a, b, *_ in edges)
    return G


TRIANGLE_TAIL = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]  # core: 2,2,2,1,1


def test_core_numbers_triangle_tail(spark):
    g = graph_from_edges(spark, TRIANGLE_TAIL, directed=False)
    got = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert got == nx.core_number(_nx_graph(TRIANGLE_TAIL))


def test_k_core_subgraph(spark):
    g = graph_from_edges(spark, TRIANGLE_TAIL, directed=False)
    sub = k_core(g, 2)
    assert sorted(r["id"] for r in sub.vertices.collect()) == [1, 2, 3]
    assert sub.edge_count() == 3


def test_core_numbers_random_vs_networkx(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(220)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=True)  # treated undirected
    got = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert got == nx.core_number(_nx_graph(edges))


def test_core_numbers_isolated_and_selfloop(spark):
    g = graph_from_edges(spark, [(1, 1), (2, 3)], vertices=[1, 2, 3, 4], directed=False)
    got = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 0}


@pytest.mark.parametrize("k,expect_empty", [(3, True), (1, False)])
def test_k_core_thresholds(spark, k, expect_empty):
    g = graph_from_edges(spark, TRIANGLE_TAIL, directed=False)
    sub = k_core(g, k)
    assert (sub.vertices.count() == 0) == expect_empty


def test_k_core_exact_max_rounds_no_spurious_raise(spark):
    """A peel converging in exactly max_rounds must not raise: the
    fixpoint check precedes the exhaustion raise (ADVICE r2). The
    5-path at k=2 peels in exactly 3 rounds (ends, then middles,
    then the center)."""
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], directed=False)
    out = k_core(g, 2, max_rounds=3)
    assert out.edges.count() == 0
