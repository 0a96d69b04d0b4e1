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


def test_multi_source_weighted_vs_networkx(spark):
    """Batched weighted relaxation == per-source NetworkX Dijkstra on
    a seeded random weighted digraph, 3 sources in one loop."""
    from linkgraph.operators.centrality import multi_source_shortest_paths

    rng = random.Random(23)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    edges = [(a, b, round(rng.uniform(0.5, 5.0), 3)) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=True)
    sources = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in multi_source_shortest_paths(g, sources).collect()
    }
    G = nx.DiGraph()
    G.add_weighted_edges_from(edges)
    for s in (0, 1, 2):
        want = nx.single_source_dijkstra_path_length(G, s)
        for v, d in want.items():
            assert abs(got[(s, v)] - d) < 1e-9, (s, v)
        assert {v for (src, v) in got if src == s} == set(want)


def test_closeness_weighted_vs_networkx(spark):
    """closeness(weighted=True) == networkx.closeness_centrality(
    distance='weight') on seeded graphs, both orientations."""
    rng = random.Random(47)
    # unordered-pair dedup: reciprocal rows with different weights are
    # parallel edges to the engine (min wins in relaxation) but a
    # single overwritten edge to nx.Graph — not a semantics test
    pairs = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(20), rng.randrange(20)) for _ in range(60))
        if a != b
    })
    edges = [(a, b, round(rng.uniform(0.2, 4.0), 3)) for a, b in pairs]
    for directed in (False, True):
        g = graph_from_edges(spark, edges, directed=directed)
        got = {
            r["id"]: r["closeness"]
            for r in closeness_centrality(g, weighted=True).collect()
        }
        G = nx.DiGraph() if directed else nx.Graph()
        G.add_weighted_edges_from(edges)
        want = nx.closeness_centrality(G, distance="weight")
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-9, (directed, k, got[k], v)


def test_multi_source_weighted_weight_expr(spark):
    """weight_expr parity: distances through a JSON attrs column."""
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph
    from linkgraph.operators.centrality import multi_source_shortest_paths

    rows = [
        (1, 2, 1.0, '{"cost": 5.0}'),
        (2, 3, 1.0, '{"cost": 1.0}'),
        (1, 3, 1.0, '{"cost": 9.0}'),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, attrs string")
    g = LinkGraph(e, directed=True)
    src = spark.createDataFrame([(1,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in multi_source_shortest_paths(
            g, src, weight_expr=F.get_json_object("attrs", "$.cost")
        ).collect()
    }
    assert got == {1: 0.0, 2: 5.0, 3: 6.0}


def test_betweenness_weighted_vs_networkx(spark):
    """betweenness(weighted=True) == networkx.betweenness_centrality(
    weight='weight') on seeded graphs, both orientations. Integer
    weights 1..6 so path-sum float equality (DAG membership) is
    exact; ties between distinct shortest paths are common at this
    density, exercising sigma > 1 through the weighted DAG."""
    from linkgraph.operators.centrality import betweenness_centrality

    rng = random.Random(31)
    pairs = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(18), rng.randrange(18)) for _ in range(55))
        if a != b
    })
    edges = [(a, b, float(rng.randrange(1, 7))) for a, b in pairs]
    for directed in (False, True):
        g = graph_from_edges(spark, edges, directed=directed)
        for normalized in (False, True):
            got = {
                r["id"]: r["betweenness"]
                for r in betweenness_centrality(
                    g, weighted=True, normalized=normalized
                ).collect()
            }
            G = nx.DiGraph() if directed else nx.Graph()
            G.add_weighted_edges_from(edges)
            want = nx.betweenness_centrality(
                G, weight="weight", normalized=normalized
            )
            assert set(got) == set(want)
            for k, v in want.items():
                assert abs(got[k] - v) < 1e-8, (directed, normalized, k, got[k], v)


def test_betweenness_weighted_level_skip(spark):
    """A DAG edge that skips longest-path levels: 1→4 direct (weight
    3) ties 1→2→3→4 (1+1+1) — the direct edge jumps from level 0 to
    level 3, so the backward pass must read successors beyond the
    adjacent level (the case hop-level Brandes never sees)."""
    from linkgraph.operators.centrality import betweenness_centrality

    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (1, 4, 3.0), (4, 5, 1.0)]
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(
        g, weighted=True).collect()}
    G = nx.DiGraph()
    G.add_weighted_edges_from(edges)
    want = nx.betweenness_centrality(G, weight="weight", normalized=False)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_betweenness_weighted_sampled_sources(spark):
    """Sources = all vertices passed explicitly == sources=None (the
    subset estimator is exact when the subset is everything)."""
    from linkgraph.operators.centrality import betweenness_centrality

    edges = [(1, 2, 2.0), (2, 3, 1.0), (1, 3, 5.0), (3, 4, 1.0)]
    g = graph_from_edges(spark, edges, directed=False)
    srcs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    a = {r["id"]: r["betweenness"]
         for r in betweenness_centrality(g, weighted=True).collect()}
    b = {r["id"]: r["betweenness"]
         for r in betweenness_centrality(g, sources=srcs, weighted=True).collect()}
    assert a == b


# --- eccentricity / distance summary -----------------------------------------


def test_eccentricity_vs_networkx_connected(spark):
    """Seeded connected undirected graph: ecc/diameter/radius/center/
    periphery all == NetworkX."""
    from linkgraph.operators.centrality import distance_summary, eccentricity

    rng = random.Random(7)
    n = 14
    edges = [(i, i + 1) for i in range(1, n)]  # path: connected for sure
    edges += [(rng.randrange(1, n + 1), rng.randrange(1, n + 1)) for _ in range(12)]
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["eccentricity"] for r in eccentricity(g).collect()}
    G = nx.Graph(edges)
    want = nx.eccentricity(G)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    row = distance_summary(g).collect()[0]
    assert row["diameter"] == nx.diameter(G)
    assert row["radius"] == nx.radius(G)
    assert row["n_center"] == len(nx.center(G))
    assert row["n_periphery"] == len(nx.periphery(G))


def test_eccentricity_directed_reachable_set(spark):
    """Directed + disconnected: ecc(u) = max distance over u's
    reachable set (NetworkX raises here; our documented
    generalization). Hand-checked on a two-tree forest."""
    from linkgraph.operators.centrality import eccentricity

    edges = [(1, 2), (2, 3), (10, 11)]
    g = graph_from_edges(spark, edges, directed=True, vertices=[1, 2, 3, 10, 11, 99])
    got = {r["id"]: r["eccentricity"] for r in eccentricity(g).collect()}
    assert got == {1: 2.0, 2: 1.0, 3: 0.0, 10: 1.0, 11: 0.0, 99: 0.0}


def test_eccentricity_weighted_vs_networkx(spark):
    """weighted=True == NetworkX eccentricity with Dijkstra sp on a
    seeded connected weighted graph."""
    from linkgraph.operators.centrality import eccentricity

    rng = random.Random(13)
    n = 10
    raw = [(i, i + 1, rng.randint(1, 9) * 1.0) for i in range(1, n)]
    raw += [
        (rng.randrange(1, n + 1), rng.randrange(1, n + 1), rng.randint(1, 9) * 1.0)
        for _ in range(8)
    ]
    # canonical-dedup duplicates (NetworkX keeps the LAST weight per
    # pair; the engine would see parallel rows and take the min)
    uniq = {(min(a, b), max(a, b)): w for a, b, w in raw if a != b}
    edges = [(a, b, w) for (a, b), w in uniq.items()]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["eccentricity"] for r in eccentricity(g, weighted=True).collect()}
    G = nx.Graph()
    G.add_weighted_edges_from(edges)
    sp = dict(nx.shortest_path_length(G, weight="weight"))
    want = nx.eccentricity(G, sp=sp)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)
