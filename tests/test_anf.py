"""ANF / HyperBall neighborhood function: exact sketch replay +
estimate sanity vs exact ball sizes."""

import hashlib

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.anf import (
    PHI,
    effective_diameter,
    neighborhood_function,
)

R = 8


def _h60(vid, j, seed=0):
    return int(hashlib.md5(f"{vid}:{j}:{seed}".encode()).hexdigest()[:15], 16)


def _tz(x):
    return (x & -x).bit_length() - 1 if x else 64


def _replay(edges, verts, max_h, r=R, seed=0):
    """Pure-Python FM-sketch replay of the engine's exact arithmetic."""
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
    sk = {v: [1 << min(59, _tz(_h60(v, j, seed))) for j in range(r)] for v in verts}

    def digest(sk):
        sum_rho = sum_pow = 0
        est = 0.0
        for v in verts:
            rs = []
            for s in sk[v]:
                reg = _tz((~s) & (s + 1))
                rs.append(reg)
                sum_rho += reg
                sum_pow += 1 << reg
            est += 2 ** (sum(rs) / r) / PHI
        return sum_rho, sum_pow, est

    out = [digest(sk)]
    for _ in range(max_h):
        new = {v: list(sk[v]) for v in verts}
        for v in verts:
            for w in adj.get(v, ()):
                for j in range(r):
                    new[v][j] |= sk[w][j]
        sk = new
        out.append(digest(sk))
    return out


def test_anf_matches_pure_python_replay(spark):
    G = nx.gnp_random_graph(40, 0.08, seed=9, directed=True)
    edges = list(G.edges())
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edges(spark, edges)
    res = neighborhood_function(g, max_h=5, n_sketches=R, seed=0)
    rows = {r_.h: r_ for r_ in res.stats.collect()}
    for h, (sum_rho, sum_pow, est) in enumerate(_replay(edges, verts, 5)):
        assert rows[h].sum_rho == sum_rho
        assert rows[h].sum_pow == sum_pow
        assert rows[h].est_pairs == pytest.approx(est, rel=1e-12)


def test_anf_converges_and_replicates_tail_rows(spark):
    # path 1→2→3: out-sketches converge at h=2; rows 3..5 replicate
    g = graph_from_edges(spark, [(1, 2), (2, 3)])
    res = neighborhood_function(g, max_h=5, n_sketches=4)
    rows = sorted(res.stats.collect(), key=lambda r_: r_.h)
    assert res.rounds_run == 3  # h=3 runs, detects the fixpoint
    assert len(rows) == 6
    assert rows[3].sum_rho == rows[2].sum_rho == rows[5].sum_rho


def test_anf_estimate_tracks_exact_neighborhood_function(spark):
    # estimate quality: with 32 sketches the FM error is ~14%; the
    # exact N(h) must sit well inside a generous band
    G = nx.gnp_random_graph(60, 0.06, seed=21, directed=True)
    g = graph_from_edges(spark, list(G.edges()))
    res = neighborhood_function(g, max_h=4, n_sketches=32)
    rows = {r_.h: r_ for r_ in res.stats.collect()}
    lengths = dict(nx.all_pairs_shortest_path_length(G))
    verts = {v for e in G.edges() for v in e}
    # h=0 (ball size 1) sits in FM's documented small-range bias zone
    # (~1.8× high); from h>=1 the estimate lands within a few percent
    for h in range(1, 5):
        exact = sum(
            1
            for v in verts
            for w, d in lengths.get(v, {}).items()
            if d <= h and w in verts
        )
        assert rows[h].est_pairs == pytest.approx(exact, rel=0.2)


def test_anf_directions(spark):
    # star 1→{2,3,4}: out-ball of 1 is everything at h=1, in-balls of
    # leaves are {leaf, 1}; und direction symmetrizes
    g = graph_from_edges(spark, [(1, 2), (1, 3), (1, 4)])
    for direction in ("out", "in", "und"):
        res = neighborhood_function(g, max_h=2, n_sketches=8, direction=direction)
        assert res.stats.count() == 3
    with pytest.raises(ValueError):
        neighborhood_function(g, max_h=1, direction="sideways")


def test_effective_diameter_on_path(spark):
    # directed 6-path: N(h) grows until h=5 (the diameter)
    g = graph_from_edges(spark, [(i, i + 1) for i in range(1, 6)])
    res = neighborhood_function(g, max_h=8, n_sketches=32)
    ed = effective_diameter(res, q=0.99)
    assert 4 <= ed <= 5
    assert res.rounds_run <= 6


def test_effective_diameter_table_matches_collect_readout(spark):
    from linkgraph.operators.anf import effective_diameter_table

    g = graph_from_edges(spark, [(i, i + 1) for i in range(1, 6)])
    res = neighborhood_function(g, max_h=8, n_sketches=32)
    for q in (0.9, 0.99):
        got = effective_diameter_table(res, q=q).collect()[0]["eff_diameter"]
        # identical to the driver-side readout (round-6 threshold only
        # matters at exact rounding boundaries, absent here)
        assert got == effective_diameter(res, q=q)
