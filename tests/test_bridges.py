"""Bridges + 2-edge-connected components vs NetworkX."""

import random

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.bridges import (
    bridges,
    spanning_forest,
    two_edge_components,
)


def _nx_bridges(edges, nodes=None):
    G = nx.Graph()
    G.add_edges_from(edges)
    if nodes:
        G.add_nodes_from(nodes)
    return G, {tuple(sorted(e)) for e in nx.bridges(G)}


def _random_edges(seed, n, m):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((min(a, b), max(a, b)))
    return sorted(es)


def test_bridges_hand_fixture(spark):
    # two triangles joined by a bridge, plus a pendant leaf edge
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {(r.src, r.dst) for r in bridges(g).collect()}
    assert got == {(3, 4), (6, 7)}


def test_bridges_random_graphs_match_networkx(spark):
    # sparse (many bridges, multiple components) and denser (few)
    for seed, n, m in ((7, 40, 42), (11, 36, 60)):
        edges = _random_edges(seed, n, m)
        G, want = _nx_bridges(edges, nodes=range(n))
        g = graph_from_edges(spark, edges, vertices=range(n), directed=False)
        got = {(r.src, r.dst) for r in bridges(g).collect()}
        assert got == want, (seed, sorted(want - got), sorted(got - want))


def test_bridges_directed_uses_simple_undirected_view(spark):
    # reciprocal pair collapses to ONE simple edge — still a bridge
    g = graph_from_edges(spark, [(1, 2), (2, 1), (2, 3)], directed=True)
    got = {(r.src, r.dst) for r in bridges(g).collect()}
    assert got == {(1, 2), (2, 3)}


def test_two_edge_components_match_networkx(spark):
    edges = _random_edges(13, 30, 34)
    G, br = _nx_bridges(edges, nodes=range(30))
    H = G.copy()
    H.remove_edges_from(br)
    want = {}
    for comp in nx.connected_components(H):
        lbl = min(comp)
        for v in comp:
            want[v] = lbl
    g = graph_from_edges(spark, edges, vertices=range(30), directed=False)
    got = {r.id: r.component for r in two_edge_components(g).collect()}
    assert got == want


def test_spanning_forest_is_a_forest_rooted_at_component_minima(spark):
    edges = _random_edges(5, 25, 30)
    g = graph_from_edges(spark, edges, vertices=range(25), directed=False)
    rows = {r.id: r for r in spanning_forest(g).collect()}
    G = nx.Graph()
    G.add_edges_from(edges)
    G.add_nodes_from(range(25))
    for comp in nx.connected_components(G):
        root = min(comp)
        assert rows[root].parent is None and rows[root].depth == 0
        for v in comp:
            assert rows[v].root == root
            if v != root:
                p = rows[v].parent
                assert p in comp and (min(p, v), max(p, v)) in {
                    tuple(sorted(e)) for e in G.edges
                }
                assert rows[v].depth == rows[p].depth + 1
                # BFS tree: depth equals the hop distance
                assert rows[v].depth == nx.shortest_path_length(G, root, v)


# --- articulation points / biconnected components (Tarjan–Vishkin) ----------

from linkgraph.operators.bridges import articulation_points, biconnected_components


def _nx_blocks(edges, nodes=None):
    G = nx.Graph()
    G.add_edges_from(edges)
    if nodes:
        G.add_nodes_from(nodes)
    aps = set(nx.articulation_points(G))
    blocks = {
        frozenset(frozenset((min(u, v), max(u, v))) for u, v in comp)
        for comp in nx.biconnected_component_edges(G)
    }
    return aps, blocks


def _got_blocks(g):
    from collections import defaultdict

    by = defaultdict(set)
    for r in biconnected_components(g).collect():
        by[r.block].add(frozenset((r.src, r.dst)))
    return {frozenset(s) for s in by.values()}


def test_articulation_points_hand_fixture(spark):
    # two triangles joined by a bridge, plus a pendant leaf edge:
    # cut vertices are the bridge endpoints and the leaf's anchor
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r.id for r in articulation_points(g).collect()}
    assert got == {3, 4, 6}


def test_biconnected_components_hand_fixture(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    g = graph_from_edges(spark, edges, directed=False)
    _, want = _nx_blocks(edges)
    assert _got_blocks(g) == want


def test_articulation_points_match_networkx_random(spark):
    # sparse forest-heavy and denser cyclic, with isolated vertices
    for seed, n, m in ((7, 40, 42), (11, 36, 60)):
        edges = _random_edges(seed, n, m)
        want, _ = _nx_blocks(edges, nodes=range(n))
        g = graph_from_edges(spark, edges, vertices=range(n), directed=False)
        got = {r.id for r in articulation_points(g).collect()}
        assert got == want, (seed, sorted(want - got), sorted(got - want))


def test_biconnected_components_match_networkx_random(spark):
    edges = _random_edges(21, 30, 40)
    _, want = _nx_blocks(edges, nodes=range(30))
    g = graph_from_edges(spark, edges, vertices=range(30), directed=False)
    assert _got_blocks(g) == want


def test_biconnected_cycle_is_one_block_no_cuts(spark):
    # a pure cycle: zero articulation points, ONE block — exercises
    # the auxiliary-path shape where pointer jumping earns its keep
    edges = [(i, (i + 1) % 11) for i in range(11)]
    g = graph_from_edges(spark, edges, directed=False)
    assert articulation_points(g).count() == 0
    blocks = _got_blocks(g)
    assert len(blocks) == 1 and len(next(iter(blocks))) == 11


def test_bridges_are_exactly_single_edge_blocks(spark):
    edges = _random_edges(33, 28, 30)
    g = graph_from_edges(spark, edges, vertices=range(28), directed=False)
    want = {(r.src, r.dst) for r in bridges(g).collect()}
    singles = {
        tuple(sorted(next(iter(b)))) for b in _got_blocks(g) if len(b) == 1
    }
    assert singles == want
