"""densest_subgraph vs an exact pure-Python replica of the same peel,
plus planted-clique closed forms."""

import hashlib

import pytest

from conftest import graph_from_edges
from linkgraph.operators.densest import densest_subgraph


def md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_densest(nodes, edges, epsilon=0.05):
    """Bit-for-bit replica of the operator's peel arithmetic."""
    canon = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    verts = set(nodes)
    best_rho, best = -1.0, None
    while verts:
        cur = {(s, d) for s, d in canon if s in verts and d in verts}
        deg = {v: 0 for v in verts}
        for s, d in cur:
            deg[s] += 1
            deg[d] += 1
        rho = len(cur) / len(verts)
        if rho > best_rho:
            best_rho, best = rho, set(verts)
        thresh = 2.0 * (1.0 + epsilon) * rho
        verts = {v for v in verts if deg[v] > thresh}
    return best or set(), max(best_rho, -1.0)


def _zipfish_edges():
    nodes = [md5int(f"v{i}") for i in range(40)]
    edges = []
    for i in range(40):
        for j in range(i + 1, 40):
            # denser among low indices: a planted gradient
            if md5int(f"e{i}:{j}") % (3 + (i + j) // 8) == 0:
                edges.append((nodes[i], nodes[j]))
    return nodes, edges


def test_matches_python_replica(spark):
    nodes, edges = _zipfish_edges()
    g = graph_from_edges(spark, edges, directed=False, vertices=nodes)
    out = densest_subgraph(g).collect()
    exp_set, exp_rho = py_densest(nodes, edges)
    assert {r["id"] for r in out} == exp_set
    assert all(r["density"] == exp_rho for r in out)


def test_planted_clique(spark):
    # K8 (density 3.5) + a long path (density < 1): the peel must
    # return exactly the clique
    k8 = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    path = [(100 + i, 101 + i) for i in range(30)]
    g = graph_from_edges(spark, k8 + path, directed=False)
    out = densest_subgraph(g).collect()
    assert {r["id"] for r in out} == set(range(8))
    assert all(r["density"] == 3.5 for r in out)


def test_directed_input_and_self_loops(spark):
    # directed triangle with a self-loop = undirected K3, density 1.0
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 1), (2, 2)], directed=True)
    out = densest_subgraph(g).collect()
    assert {r["id"] for r in out} == {1, 2, 3}
    assert all(r["density"] == 1.0 for r in out)


def test_isolated_only(spark):
    g = graph_from_edges(spark, [], directed=False, vertices=[1, 2, 3])
    out = densest_subgraph(g).collect()
    assert {r["id"] for r in out} == {1, 2, 3}
    assert all(r["density"] == 0.0 for r in out)
