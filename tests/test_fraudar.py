"""FRAUDAR suspicious-block peel vs a pure-Python replay of the same
batch peel, plus planted-block recovery (the behavior the operator is
for) and empty-graph semantics."""

import math
import random

import pytest

from conftest import graph_from_edges
from linkgraph.operators.densest import suspicious_block


def _py_peel(edges, epsilon, c):
    edges = sorted(set(edges))
    indeg = {}
    for _, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    ew = {e: round(1.0 / math.log(c + indeg[e[1]]), 9) for e in edges}
    nodes = {(0, s) for s, _ in edges} | {(1, d) for _, d in edges}
    best_rho, best = -1.0, None
    while nodes:
        wd = {v: 0.0 for v in nodes}
        for (s, d), w in ew.items():
            wd[(0, s)] += w
            wd[(1, d)] += w
        swd = sum(wd.values())
        rho = swd / 2.0 / len(nodes)
        if rho > best_rho:
            best_rho, best = rho, set(nodes)
        thresh = 2.0 * (1.0 + epsilon) * rho
        nodes = {v for v in nodes if wd[v] > thresh}
        ew = {
            (s, d): w
            for (s, d), w in ew.items()
            if (0, s) in nodes and (1, d) in nodes
        }
    return best, best_rho


def _random_bipartite(seed, ns, nd, m, planted):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        es.add((rng.randrange(ns), 1000 + rng.randrange(nd)))
    for s in range(planted):
        for d in range(planted):
            es.add((100 + s, 2000 + d))
    return sorted(es)


def test_suspicious_block_matches_pure_python(spark):
    edges = _random_bipartite(3, 30, 20, 80, planted=6)
    want, want_rho = _py_peel(edges, 0.1, 5.0)
    g = graph_from_edges(spark, edges, directed=True)
    rows = suspicious_block(g, epsilon=0.1).collect()
    got = {(r.side, r.id) for r in rows}
    assert got == want
    assert abs(rows[0].suspiciousness - want_rho) < 1e-9


def test_suspicious_block_recovers_planted_block(spark):
    # dense 6x6 planted block inside sparse noise: the best-g snapshot
    # must contain the whole planted block on both sides
    edges = _random_bipartite(7, 40, 30, 100, planted=6)
    g = graph_from_edges(spark, edges, directed=True)
    got = {(r.side, r.id) for r in suspicious_block(g, epsilon=0.05).collect()}
    for s in range(6):
        assert (0, 100 + s) in got
        assert (1, 2000 + s) in got


def test_suspicious_block_empty_graph(spark):
    from linkgraph import LinkGraph

    g = LinkGraph.empty(spark, directed=True)
    assert suspicious_block(g).count() == 0


def test_suspicious_block_downweights_popular_targets(spark):
    # column weights: an edge into a high-indegree hub counts less
    # than one into a rare target — the whole point of 1/ln(c+deg)
    edges = [(s, 9000) for s in range(20)] + [(100, 9001), (101, 9001)]
    g = graph_from_edges(spark, edges, directed=True)
    rows = suspicious_block(g, epsilon=0.05).collect()
    # the hub star's per-node weight is diluted; still a valid result
    assert len(rows) > 0
    want, want_rho = _py_peel(edges, 0.05, 5.0)
    assert {(r.side, r.id) for r in rows} == want
