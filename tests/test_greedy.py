"""Greedy symmetry-breaking trio vs exact sequential-greedy oracles.

The operators claim round-parallel == sequential-greedy-in-priority-
order; these tests verify that claim with a pure-Python scan using the
same md5 keys, on full-range 60-bit ids (ANSI-mode overflow probe)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph.operators.greedy import (
    greedy_coloring,
    maximal_independent_set,
    maximal_matching,
)


def md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _medium_edges():
    """Deterministic sparse graph over 60-bit ids."""
    nodes = [md5int(f"v{i}") for i in range(48)]
    edges = []
    for i in range(48):
        for j in range(i + 1, 48):
            if md5int(f"e{i}:{j}") % 9 == 0:
                edges.append((nodes[i], nodes[j]))
    assert len(edges) > 60
    return nodes, edges


def _adj(nodes, edges):
    adj = {v: set() for v in nodes}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def _prio(v, seed=0):
    return (md5int(f"{v}:{seed}"), v)


def seq_mis(nodes, edges, seed=0):
    adj = _adj(nodes, edges)
    mis = set()
    for v in sorted(nodes, key=lambda v: _prio(v, seed)):
        if not adj[v] & mis:
            mis.add(v)
    return mis


def seq_coloring(nodes, edges, seed=0):
    adj = _adj(nodes, edges)
    colors = {}
    for v in sorted(nodes, key=lambda v: _prio(v, seed)):
        used = {colors[u] for u in adj[v] if u in colors}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def seq_matching(nodes, edges, seed=0):
    canon = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    order = sorted(canon, key=lambda e: (md5int(f"{e[0]}:{e[1]}:{seed}"), e))
    taken, out = set(), set()
    for s, d in order:
        if s not in taken and d not in taken:
            taken.update((s, d))
            out.add((s, d))
    return out


@pytest.fixture(scope="module")
def medium(spark):
    nodes, edges = _medium_edges()
    g = graph_from_edges(spark, edges, directed=False, vertices=nodes)
    return g, nodes, edges


def test_mis_matches_sequential_greedy(medium):
    g, nodes, edges = medium
    got = {r["id"] for r in maximal_independent_set(g).collect()}
    assert got == seq_mis(nodes, edges)


def test_mis_is_independent_and_maximal(medium):
    g, nodes, edges = medium
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    adj = _adj(nodes, edges)
    assert all(not (adj[v] & mis) for v in mis)          # independent
    assert all(v in mis or (adj[v] & mis) for v in nodes)  # maximal


def test_mis_directed_input_symmetrized(spark, bfs_dag):
    # directed edges are treated as undirected conflicts
    nodes = [r["id"] for r in bfs_dag.vertices.collect()]
    edges = [(r["src"], r["dst"]) for r in bfs_dag.edges.collect()]
    got = {r["id"] for r in maximal_independent_set(bfs_dag).collect()}
    assert got == seq_mis(nodes, edges)


def test_coloring_matches_sequential_greedy(medium):
    g, nodes, edges = medium
    got = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    assert got == seq_coloring(nodes, edges)


def test_coloring_is_proper(medium):
    g, nodes, edges = medium
    col = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    assert set(col) == set(nodes)
    for s, d in edges:
        if s != d:
            assert col[s] != col[d]


def test_matching_matches_sequential_greedy(medium):
    g, nodes, edges = medium
    got = {(r["src"], r["dst"]) for r in maximal_matching(g).collect()}
    assert got == seq_matching(nodes, edges)


def test_matching_is_valid_and_maximal(medium):
    g, nodes, edges = medium
    m = {(r["src"], r["dst"]) for r in maximal_matching(g).collect()}
    taken = [v for e in m for v in e]
    assert len(taken) == len(set(taken))  # vertex-disjoint
    canon = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    ts = set(taken)
    assert all(s in ts or d in ts for s, d in canon)  # maximal


def test_seed_changes_result_deterministically(medium):
    g, nodes, edges = medium
    a = {r["id"] for r in maximal_independent_set(g, seed=1).collect()}
    b = {r["id"] for r in maximal_independent_set(g, seed=1).collect()}
    assert a == b == seq_mis(nodes, edges, seed=1)


def test_self_loops_ignored(spark):
    g = graph_from_edges(spark, [(1, 1), (1, 2), (3, 3)], directed=False)
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    # 3 is isolated after the self-loop drop and must be in the MIS
    assert 3 in mis and len(mis & {1, 2}) == 1
    col = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    assert col[3] == 0 and col[1] != col[2]
    m = {(r["src"], r["dst"]) for r in maximal_matching(g).collect()}
    assert m == {(1, 2)}
