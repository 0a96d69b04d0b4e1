"""Louvain local moves vs a pure-Python replay of the identical
synchronous rule + community-quality sanity."""

from collections import defaultdict

import networkx as nx

from conftest import graph_from_edges
from linkgraph.operators.louvain import louvain_local_moves


def _py_local_moves(edges, rounds=4, weights=None, alternate=True):
    nbr = defaultdict(lambda: defaultdict(float))
    for idx, (a, b) in enumerate(edges):
        w = 1.0 if weights is None else weights[idx]
        nbr[a][b] += w
        nbr[b][a] += w
    k = {v: sum(ws.values()) for v, ws in nbr.items()}
    m2 = sum(k.values())
    comm = {v: v for v in nbr}
    for r in range(1, rounds + 1):
        tot = defaultdict(float)
        for v in nbr:
            tot[comm[v]] += k[v]
        new = {}
        for v in nbr:
            if alternate and v % 2 != r % 2:
                new[v] = comm[v]
                continue
            wvc = defaultdict(float)
            for u, w in nbr[v].items():
                wvc[comm[u]] += w

            def score(c):
                t = tot[c] - (k[v] if c == comm[v] else 0.0)
                return wvc.get(c, 0.0) - k[v] * t / m2

            cands = set(wvc) | {comm[v]}
            best = max(cands, key=lambda c: (score(c), -c))
            new[v] = best if score(best) > score(comm[v]) else comm[v]
        comm = new
    return comm


def _spark_comms(spark, edges, rounds=4, **kw):
    g = graph_from_edges(spark, edges, directed=False)
    return {
        r.id: r.community
        for r in louvain_local_moves(g, rounds=rounds, **kw).collect()
    }


def test_two_cliques_split_cleanly(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 10)]
    got = _spark_comms(spark, edges)
    assert got == _py_local_moves(edges)
    # exactly two communities, split along the bridge
    groups = defaultdict(set)
    for v, c in got.items():
        groups[c].add(v)
    assert sorted(map(sorted, groups.values())) == [
        [0, 1, 2, 3, 4],
        [10, 11, 12, 13, 14],
    ]


def test_matches_python_replay_random(spark):
    G = nx.planted_partition_graph(4, 10, 0.7, 0.05, seed=9)
    edges = list(G.edges())
    assert _spark_comms(spark, edges, rounds=5) == _py_local_moves(edges, rounds=5)


def test_fully_synchronous_mode_matches_replay(spark):
    G = nx.planted_partition_graph(3, 8, 0.7, 0.05, seed=2)
    edges = list(G.edges())
    got = _spark_comms(spark, edges, rounds=3, alternate=False)
    assert got == _py_local_moves(edges, rounds=3, alternate=False)


def test_modularity_improves_over_singletons(spark):
    G = nx.planted_partition_graph(3, 12, 0.8, 0.02, seed=4)
    got = _spark_comms(spark, list(G.edges()), rounds=4)
    groups = defaultdict(set)
    for v, c in got.items():
        groups[c].add(v)
    q = nx.community.modularity(G, groups.values())
    q0 = nx.community.modularity(G, [{v} for v in G.nodes()])
    assert q > q0 + 0.2


def test_isolated_vertices_keep_singletons(spark):
    g = graph_from_edges(spark, [(1, 2)], directed=False, vertices=[1, 2, 9])
    got = {r.id: r.community for r in louvain_local_moves(g, rounds=2).collect()}
    assert got[9] == 9
    assert len(got) == 3


def test_weighted_moves_follow_heavy_edges(spark):
    # 1-2 heavy, 2-3 light: parity alternation settles the pair into
    # one community (fully synchronous moves would swap forever)
    edges = [(1, 2, 10.0), (2, 3, 0.1)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {
        r.id: r.community
        for r in louvain_local_moves(g, rounds=4, weighted=True).collect()
    }
    assert got[1] == got[2]


def test_louvain_ladder_improves_or_matches_level1(spark):
    import networkx as nx
    from collections import defaultdict

    from linkgraph.operators.louvain import louvain

    G = nx.planted_partition_graph(4, 12, 0.7, 0.03, seed=5)
    g = graph_from_edges(spark, list(G.edges()), directed=False)
    lvl1 = {r.id: r.community for r in louvain(g, levels=1, rounds=4).collect()}
    lvl2 = {r.id: r.community for r in louvain(g, levels=2, rounds=4).collect()}
    assert set(lvl1) == set(lvl2) == set(G.nodes())

    def q(comm):
        parts = defaultdict(set)
        for v, c in comm.items():
            parts[c].add(v)
        return nx.community.modularity(G, parts.values())

    assert q(lvl2) >= q(lvl1) - 1e-9
    # the collapse must actually coarsen: fewer or equal communities
    assert len(set(lvl2.values())) <= len(set(lvl1.values()))


def test_louvain_ladder_two_cliques(spark):
    from linkgraph.operators.louvain import louvain

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 10)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r.id: r.community for r in louvain(g, levels=2, rounds=4).collect()}
    from collections import defaultdict

    groups = defaultdict(set)
    for v, c in got.items():
        groups[c].add(v)
    assert sorted(map(sorted, groups.values())) == [
        [0, 1, 2, 3, 4],
        [10, 11, 12, 13, 14],
    ]
