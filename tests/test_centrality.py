"""Closeness centrality / multi-source BFS vs NetworkX."""

import random

import networkx as nx

from conftest import graph_from_edges
from linkgraph.operators.centrality import closeness_centrality, multi_source_bfs


def test_closeness_path_graph(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    G = nx.Graph(edges)
    want = nx.closeness_centrality(G)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_closeness_directed_incoming(spark):
    # directed: NetworkX uses incoming distance
    edges = [(1, 2), (2, 3), (1, 3)]
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    want = nx.closeness_centrality(nx.DiGraph(edges))
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_closeness_disconnected(spark):
    edges = [(1, 2), (3, 4)]
    g = graph_from_edges(spark, edges, directed=False, vertices=[1, 2, 3, 4, 5])
    got = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    G = nx.Graph(edges)
    G.add_node(5)
    want = nx.closeness_centrality(G)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_closeness_random_vs_networkx(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    want = nx.closeness_centrality(nx.Graph(edges))
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_multi_source_bfs_levels(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    g = graph_from_edges(spark, edges, directed=False)
    srcs = spark.createDataFrame([(1,), (3,)], "id long")
    got = {(r["source"], r["id"]): r["level"] for r in multi_source_bfs(g, srcs).collect()}
    G = nx.Graph(edges)
    for s in (1, 3):
        for v, d in nx.single_source_shortest_path_length(G, s).items():
            assert got[(s, v)] == d


def test_betweenness_path_graph(spark):
    from linkgraph.operators.centrality import betweenness_centrality

    edges = [(1, 2), (2, 3), (3, 4)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(g).collect()}
    want = nx.betweenness_centrality(nx.Graph(edges), normalized=False)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_betweenness_directed(spark):
    from linkgraph.operators.centrality import betweenness_centrality

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 1)]
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(g).collect()}
    want = nx.betweenness_centrality(nx.DiGraph(edges), normalized=False)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_betweenness_random_normalized(spark):
    from linkgraph.operators.centrality import betweenness_centrality

    rng = random.Random(5)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["betweenness"]
           for r in betweenness_centrality(g, normalized=True).collect()}
    want = nx.betweenness_centrality(nx.Graph(edges), normalized=True)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)
