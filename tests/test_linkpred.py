"""Link prediction, harmonic centrality, and graph summary vs NetworkX."""

from __future__ import annotations

import math
import random

import networkx as nx

from conftest import graph_from_edges
from linkgraph.operators.centrality import harmonic_centrality
from linkgraph.operators.linkpred import graph_summary, link_prediction_scores


def _rand_undirected(seed, n=25, m=70):
    rng = random.Random(seed)
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    return sorted((min(a, b), max(a, b)) for a, b in pairs if a != b)


def test_link_prediction_vs_networkx_default_candidates(spark):
    edges = _rand_undirected(17)
    g = graph_from_edges(spark, edges, directed=False)
    got = {(r["u"], r["v"]): r for r in link_prediction_scores(g).collect()}
    G = nx.Graph(edges)
    # the default candidate set is exactly the non-adjacent pairs with
    # at least one common neighbor
    want_pairs = {
        (min(u, v), max(u, v))
        for u, v in nx.non_edges(G)
        if len(list(nx.common_neighbors(G, u, v))) > 0
    }
    assert set(got) == want_pairs
    for (u, v), s in list(got.items()):
        assert s["common_neighbors"] == len(list(nx.common_neighbors(G, u, v)))
        (_, _, jac) = next(iter(nx.jaccard_coefficient(G, [(u, v)])))
        assert abs(s["jaccard"] - jac) < 1e-12
        (_, _, aa) = next(iter(nx.adamic_adar_index(G, [(u, v)])))
        assert abs(s["adamic_adar"] - aa) < 1e-12
        (_, _, pa) = next(iter(nx.preferential_attachment(G, [(u, v)])))
        assert s["preferential_attachment"] == pa


def test_link_prediction_explicit_candidates(spark):
    # path 1-2-3 plus isolated-ish 4: adjacent pair, zero-common pair
    edges = [(1, 2), (2, 3), (3, 4)]
    g = graph_from_edges(spark, edges, directed=False)
    cand = spark.createDataFrame([(1, 2), (1, 4)], "u long, v long")
    got = {(r["u"], r["v"]): r for r in
           link_prediction_scores(g, candidates=cand).collect()}
    G = nx.Graph(edges)
    assert set(got) == {(1, 2), (1, 4)}
    for (u, v), s in got.items():
        assert s["common_neighbors"] == len(list(nx.common_neighbors(G, u, v)))
        (_, _, jac) = next(iter(nx.jaccard_coefficient(G, [(u, v)])))
        assert abs(s["jaccard"] - jac) < 1e-12
        (_, _, pa) = next(iter(nx.preferential_attachment(G, [(u, v)])))
        assert s["preferential_attachment"] == pa


def test_harmonic_vs_networkx_undirected(spark):
    edges = _rand_undirected(29)
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    want = nx.harmonic_centrality(nx.Graph(edges))
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_harmonic_vs_networkx_directed(spark):
    rng = random.Random(41)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    want = nx.harmonic_centrality(nx.DiGraph(edges))
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_harmonic_weighted_vs_networkx(spark):
    rng = random.Random(53)
    raw = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    edges = [(a, b, float(rng.randrange(1, 5))) for a, b in raw if a != b]
    g = graph_from_edges(spark, edges, directed=True)
    got = {r["id"]: r["harmonic"]
           for r in harmonic_centrality(g, weighted=True).collect()}
    G = nx.DiGraph()
    G.add_weighted_edges_from(edges)
    want = nx.harmonic_centrality(G, distance="weight")
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_graph_summary_vs_networkx(spark):
    edges = _rand_undirected(61)
    g = graph_from_edges(spark, edges, directed=False)
    row = graph_summary(g).collect()[0]
    G = nx.Graph(edges)
    assert row["n_nodes"] == G.number_of_nodes()
    assert row["n_edges"] == G.number_of_edges()
    assert abs(row["density"] - nx.density(G)) < 1e-12
    assert abs(row["transitivity"] - nx.transitivity(G)) < 1e-12
    assert abs(
        row["assortativity"] - nx.degree_assortativity_coefficient(G)
    ) < 1e-9


def test_graph_summary_triangle_free(spark):
    # star: wedges but no triangles; assortativity defined (hub vs leaves)
    edges = [(0, i) for i in range(1, 6)]
    g = graph_from_edges(spark, edges, directed=False)
    row = graph_summary(g).collect()[0]
    assert row["transitivity"] == 0.0
    assert not math.isnan(row["density"])


def _rand_directed(seed, n=20, m=60):
    rng = random.Random(seed)
    return sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_reciprocity_vs_networkx(spark):
    from linkgraph.operators.linkpred import reciprocity

    for seed in (3, 11):
        edges = _rand_directed(seed)
        g = graph_from_edges(spark, edges, directed=True)
        r = reciprocity(g).collect()[0]
        G = nx.DiGraph(edges)
        assert r["n_edges"] == G.number_of_edges()
        assert abs(r["reciprocity"] - nx.overall_reciprocity(G)) < 1e-12


def test_reciprocity_self_loops_not_mutual(spark):
    from linkgraph.operators.linkpred import reciprocity

    # (1,1) is its own reverse but NetworkX's 2*(m - m_und)/m formula
    # does not count it; duplicate (1,2) rows collapse to one edge
    g = graph_from_edges(
        spark, [(1, 1), (1, 2), (2, 1), (1, 2, 5.0)], directed=True
    )
    r = reciprocity(g).collect()[0]
    assert (r["n_edges"], r["n_mutual"]) == (3, 2)
    G = nx.DiGraph([(1, 1), (1, 2), (2, 1)])
    assert abs(r["reciprocity"] - nx.overall_reciprocity(G)) < 1e-12


def test_reciprocity_requires_directed(spark):
    from linkgraph.operators.linkpred import reciprocity
    import pytest

    g = graph_from_edges(spark, [(1, 2)], directed=False)
    with pytest.raises(ValueError):
        reciprocity(g)


def _rand_digraph(seed, n=20, m=60):
    rng = random.Random(seed)
    pairs = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    return sorted((a, b) for a, b in pairs if a != b)


def test_average_neighbor_degree_directed(spark):
    from linkgraph.operators.linkpred import average_neighbor_degree

    edges = _rand_digraph(31)
    g = graph_from_edges(spark, edges, directed=True)
    G = nx.DiGraph(edges)
    for source, target in [("out", "out"), ("in", "in"),
                           ("out", "in"), ("in+out", "in+out")]:
        got = {r["id"]: r["avg_nbr_degree"]
               for r in average_neighbor_degree(g, source, target).collect()}
        want = nx.average_neighbor_degree(G, source=source, target=target)
        assert set(got) == set(want)
        for v, x in want.items():
            assert abs(got[v] - x) < 1e-12, (source, target, v, got[v], x)


def test_average_neighbor_degree_undirected(spark):
    from linkgraph.operators.linkpred import average_neighbor_degree

    edges = [(a, b) for a, b in _rand_digraph(8) if a < b]
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["id"]: r["avg_nbr_degree"]
           for r in average_neighbor_degree(g).collect()}
    want = nx.average_neighbor_degree(nx.Graph(edges))
    assert set(got) == set(want)
    for v, x in want.items():
        assert abs(got[v] - x) < 1e-12


def test_cocitation_and_coupling(spark):
    from linkgraph.operators.linkpred import cocitation_counts

    edges = _rand_digraph(44, n=15, m=70)
    g = graph_from_edges(spark, edges, directed=True)
    adj_out, adj_in = {}, {}
    for a, b in edges:
        adj_out.setdefault(a, set()).add(b)
        adj_in.setdefault(b, set()).add(a)
    verts = sorted({x for e in edges for x in e})

    def brute(nbrs):
        want = {}
        for i, u in enumerate(verts):
            for v in verts[i + 1:]:
                c = len(nbrs.get(u, set()) & nbrs.get(v, set()))
                if c:
                    want[(u, v)] = c
        return want

    # cocitation: shared in-neighbors; coupling: shared out-neighbors
    got = {(r["u"], r["v"]): r["common"]
           for r in cocitation_counts(g, "cocitation").collect()}
    assert got == brute(adj_in)
    got = {(r["u"], r["v"]): r["common"]
           for r in cocitation_counts(g, "coupling").collect()}
    assert got == brute(adj_out)


def test_cocitation_center_degree_cap(spark):
    from linkgraph.operators.linkpred import cocitation_counts

    # hub 0 links 1..5 (degree 5 > cap); page 9 links 1,2 only
    edges = [(0, i) for i in range(1, 6)] + [(9, 1), (9, 2)]
    g = graph_from_edges(spark, edges, directed=True)
    got = {(r["u"], r["v"]): r["common"]
           for r in cocitation_counts(g, max_center_degree=3).collect()}
    assert got == {(1, 2): 1}


def test_attribute_assortativity_vs_networkx(spark):
    from linkgraph.operators.linkpred import attribute_assortativity

    rng = random.Random(71)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    verts = sorted({x for e in edges for x in e})
    lab = {v: ["red", "blue", "green"][v % 3] for v in verts}

    for directed in (True, False):
        # nx.Graph collapses (a,b)/(b,a) to one edge while the engine
        # keeps row multiplicity — feed canonical pairs when undirected
        es = edges if directed else sorted({(min(a, b), max(a, b)) for a, b in edges})
        g = graph_from_edges(spark, es, directed=directed)
        ldf = spark.createDataFrame(list(lab.items()), "id long, label string")
        got = attribute_assortativity(g, ldf).collect()[0]["r"]
        G = nx.DiGraph(es) if directed else nx.Graph(es)
        nx.set_node_attributes(G, lab, "color")
        want = nx.attribute_assortativity_coefficient(G, "color")
        assert abs(got - want) < 1e-12, (directed, got, want)


def test_attribute_assortativity_perfect_homophily(spark):
    from linkgraph.operators.linkpred import attribute_assortativity

    g = graph_from_edges(spark, [(1, 2), (3, 4)], directed=True)
    ldf = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, label string"
    )
    assert abs(attribute_assortativity(g, ldf).collect()[0]["r"] - 1.0) < 1e-12


def test_powerlaw_alpha(spark):
    from linkgraph.operators.linkpred import powerlaw_alpha

    # star-ish: hub 0 with in-degree 6, others in-degree 1 or 0
    edges = [(i, 0) for i in range(1, 7)] + [(0, 1), (0, 2)]
    g = graph_from_edges(spark, edges, directed=True)
    row = powerlaw_alpha(g, dmin=2, degree="in").collect()[0]
    assert row["n_tail"] == 1  # only the hub has in-degree >= 2
    want = 1.0 + 1.0 / math.log(6 / 1.5)
    assert abs(row["alpha"] - want) < 1e-12
    # empty tail -> NULL alpha
    row2 = powerlaw_alpha(g, dmin=100).collect()[0]
    assert row2["n_tail"] == 0 and row2["alpha"] is None


def test_rich_club_vs_networkx(spark):
    from linkgraph.operators.linkpred import rich_club_coefficients

    rng = random.Random(12)
    edges = sorted({(min(a, b), max(a, b)) for a, b in
                    ((rng.randrange(18), rng.randrange(18)) for _ in range(60))
                    if a != b})
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"])
           for r in rich_club_coefficients(g).collect()}
    want = nx.rich_club_coefficient(nx.Graph(edges), normalized=False)
    # engine emits only N_k >= 2 rows; nx raises/propagates beyond that
    for k, phi in want.items():
        if k in got:
            assert abs(got[k][2] - phi) < 1e-12, (k, got[k], phi)
    assert got, "expected at least the k=0 row"
    assert set(got) <= set(want)


def test_degree_connectivity_vs_networkx(spark):
    from linkgraph.operators.linkpred import degree_connectivity

    rng = random.Random(33)
    edges = sorted({(min(a, b), max(a, b)) for a, b in
                    ((rng.randrange(16), rng.randrange(16)) for _ in range(45))
                    if a != b})
    g = graph_from_edges(spark, edges, directed=False)
    got = {r["k"]: r["knn"] for r in degree_connectivity(g).collect()}
    want = nx.average_degree_connectivity(nx.Graph(edges))
    want = {k: v for k, v in want.items() if k > 0}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)
