"""HyperBall centralities: exact pure-Python sketch replay (same FM
arithmetic) + band sanity vs exact NetworkX harmonic centrality."""

import hashlib

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.anf import PHI, hyperball_centralities

R = 8


def _h60(vid, j, seed=0):
    return int(hashlib.md5(f"{vid}:{j}:{seed}".encode()).hexdigest()[:15], 16)


def _tz(x):
    return (x & -x).bit_length() - 1 if x else 64


def _replay(edges, verts, max_h, r=R, seed=0):
    """Per-vertex exact replica: in-ball sketches, delta-accumulated
    harmonic / distance-sum / closeness — the engine's arithmetic."""
    radj = {}
    for a, b in edges:
        if a != b:
            radj.setdefault(b, set()).add(a)  # direction="in"
    sk = {v: [1 << min(59, _tz(_h60(v, j, seed))) for j in range(r)] for v in verts}

    def est(v):
        rho = sum(_tz((~s) & (s + 1)) for s in sk[v])
        return 2 ** (rho / r) / PHI

    prev = {v: est(v) for v in verts}
    harm = {v: 0.0 for v in verts}
    dsum = {v: 0.0 for v in verts}
    for h in range(1, max_h + 1):
        new = {v: list(sk[v]) for v in verts}
        for v in verts:
            for w in radj.get(v, ()):
                for j in range(r):
                    new[v][j] |= sk[w][j]
        sk = new
        for v in verts:
            e = est(v)
            d = e - prev[v]
            harm[v] += d / h
            dsum[v] += d * h
            prev[v] = e
    out = {}
    for v in verts:
        rho = sum(_tz((~s) & (s + 1)) for s in sk[v])
        clo = (prev[v] - 1.0) / dsum[v] if dsum[v] > 0 else 0.0
        out[v] = (rho, prev[v], harm[v], dsum[v], clo)
    return out


EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 1), (2, 5), (5, 6), (6, 2),
    (4, 7), (7, 8), (8, 9), (9, 7), (1, 6), (3, 8), (9, 1),
]


def test_hyperball_matches_pure_python_replay(spark):
    g = graph_from_edges(spark, EDGES, directed=True)
    res = hyperball_centralities(g, max_h=5, n_sketches=R, seed=0)
    got = {
        r["id"]: (
            r["rho_sum"], r["reachable_est"], r["harmonic_est"],
            r["dist_sum_est"], r["closeness_est"],
        )
        for r in res.collect()
    }
    verts = sorted({x for e in EDGES for x in e})
    want = _replay(EDGES, verts, max_h=5)
    assert set(got) == set(want)
    for v in verts:
        assert got[v][0] == want[v][0]  # integer digest: exact
        for i in (1, 2, 3, 4):
            assert got[v][i] == pytest.approx(want[v][i], rel=1e-9)


def test_hyperball_tracks_exact_harmonic_band(spark):
    # a graph with a genuine centrality GRADIENT (binary-tree edges
    # toward the root + a sideways chain): exact harmonic in-
    # centrality cleanly separates depths, so both the error band and
    # the top-set overlap are meaningful (a vertex-transitive graph
    # ties everything and the overlap test degenerates)
    n = 127
    tree_edges = [(v, v // 2) for v in range(2, n + 1)]
    tree_edges += [(v, v - 1) for v in range(2, n + 1, 7)]
    g = graph_from_edges(spark, tree_edges, directed=True)
    res = hyperball_centralities(g, max_h=12, n_sketches=16, seed=3)
    got = {r["id"]: r["harmonic_est"] for r in res.collect()}
    G = nx.DiGraph(tree_edges)
    exact = nx.harmonic_centrality(G)  # in-distance based, matches "in"
    rel = [abs(got[v] - exact[v]) / exact[v] for v in exact if exact[v] > 1]
    assert sum(rel) / len(rel) < 0.35  # mean FM error well inside band
    # the high-centrality head is recovered
    top_got = {v for v, _ in sorted(got.items(), key=lambda x: -x[1])[:8]}
    top_exact = {v for v, _ in sorted(exact.items(), key=lambda x: -x[1])[:8]}
    assert len(top_got & top_exact) >= 5


def test_hyperball_direction_guard(spark):
    g = graph_from_edges(spark, EDGES, directed=True)
    with pytest.raises(ValueError):
        hyperball_centralities(g, direction="sideways")
