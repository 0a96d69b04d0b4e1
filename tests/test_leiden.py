"""Leiden: connectivity refinement exactness + ladder guarantees
(every community internally connected; planted partition recovered;
refinement strictly finer than the parent labels)."""

import random

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.leiden import leiden, refine_connected
from linkgraph.operators.louvain import louvain_local_moves
from linkgraph.operators.lpa import modularity


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "id long, label long")


def test_refine_splits_disconnected_community(spark):
    # two triangles, no bridge, all under one label → two components
    g = graph_from_edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        directed=False,
    )
    lab = _labels(spark, [(i, 0) for i in range(1, 7)])
    got = {r.id: (r.parent, r.community) for r in refine_connected(g, lab).collect()}
    assert {got[i] for i in (1, 2, 3)} == {(0, 1)}
    assert {got[i] for i in (4, 5, 6)} == {(0, 4)}


def test_refine_keeps_connected_community_intact(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    lab = _labels(spark, [(1, 7), (2, 7), (3, 7), (4, 7)])
    got = {r.id: r.community for r in refine_connected(g, lab).collect()}
    assert set(got.values()) == {1}


def test_refine_never_crosses_parents(spark):
    # 1-2-3-4 chain but 3,4 labeled differently: edge 2-3 is not intra
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    lab = _labels(spark, [(1, 0), (2, 0), (3, 1), (4, 1)])
    got = {r.id: (r.parent, r.community) for r in refine_connected(g, lab).collect()}
    assert got[1] == (0, 1) and got[2] == (0, 1)
    assert got[3] == (1, 3) and got[4] == (1, 3)


def test_refine_unlabeled_vertices_dropped(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3)], directed=False)
    lab = _labels(spark, [(1, 0), (2, 0)])
    got = refine_connected(g, lab).collect()
    assert {r.id for r in got} == {1, 2}


def _planted(seed, k=3, n=8, p_in=0.9, p_out=0.05):
    rng = random.Random(seed)
    G = nx.Graph()
    for c in range(k):
        for i in range(n):
            G.add_node(c * 100 + i)
    nodes = list(G.nodes())
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            p = p_in if u // 100 == v // 100 else p_out
            if rng.random() < p:
                G.add_edge(u, v)
    return G


@pytest.mark.parametrize("seed", [3, 11])
def test_leiden_communities_are_connected(spark, seed):
    G = _planted(seed)
    g = graph_from_edges(spark, list(G.edges()), directed=False)
    res = leiden(g, levels=2, rounds=4)
    comms = {}
    for r in res.collect():
        comms.setdefault(r.community, set()).add(r.id)
    assert sum(len(m) for m in comms.values()) == G.number_of_nodes()
    for members in comms.values():
        assert nx.is_connected(G.subgraph(members)), members


def test_leiden_recovers_planted_partition_and_matches_louvain_quality(spark):
    G = _planted(23)
    g = graph_from_edges(spark, list(G.edges()), directed=False)
    res = {r.id: r.community for r in leiden(g, levels=2, rounds=4).collect()}
    # planted blocks end up in single communities
    for c in range(3):
        assert len({res[c * 100 + i] for i in range(8)}) == 1
    lab = spark.createDataFrame(
        [(k, v) for k, v in res.items()], "id long, community long"
    )
    q_leiden = modularity(g, lab).collect()[0][0]
    lou = louvain_local_moves(g, rounds=4)
    q_lou = modularity(g, lou).collect()[0][0]
    assert q_leiden >= q_lou - 1e-9


def test_leiden_single_level_equals_parent_louvain_partition(spark):
    # levels=1: Leiden returns the local-move partition itself (the
    # refinement only drives aggregation, which never happens here)
    g = graph_from_edges(
        spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        directed=False,
    )
    lei = {r.id: r.community for r in leiden(g, levels=1, rounds=4).collect()}
    lou = {r.id: r.community for r in louvain_local_moves(g, rounds=4).collect()}
    # same PARTITION (labels may differ only by renaming)
    def blocks(d):
        inv = {}
        for k, v in d.items():
            inv.setdefault(v, set()).add(k)
        return sorted(map(sorted, inv.values()))
    assert blocks(lei) == blocks(lou)


def test_louvain_init_partition_seeds_moves(spark):
    # init merging {1,2,3} stays merged through a round with no
    # improving move; absent ids fall back to singletons
    g = graph_from_edges(spark, [(1, 2), (2, 3), (1, 3)], directed=False)
    init = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "id long, community long")
    got = {r.id: r.community for r in
           louvain_local_moves(g, rounds=2, init=init).collect()}
    assert set(got.values()) == {1}
