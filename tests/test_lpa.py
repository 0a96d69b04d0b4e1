from conftest import graph_from_edges
from conftest import collect_map
from linkgraph.operators.lpa import communities_canonical, label_propagation


def test_lpa_two_cliques(two_cliques_bridge):
    res = label_propagation(two_cliques_bridge, max_iter=30)
    labels = communities_canonical(res.state)
    got = collect_map(labels, "id", "community")
    c1 = {got[i] for i in range(1, 5)}
    c2 = {got[i] for i in range(11, 15)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    assert c1 == {1} and c2 == {11}  # canonical = min member


def test_lpa_deterministic(two_cliques_bridge):
    a = collect_map(label_propagation(two_cliques_bridge).state, "id", "label")
    b = collect_map(label_propagation(two_cliques_bridge).state, "id", "label")
    assert a == b


def test_lpa_isolated_keeps_own_label(spark):
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(1, 2)], vertices=[1, 2, 9], directed=False)
    got = collect_map(label_propagation(g).state, "id", "label")
    assert got[9] == 9


def test_lpa_converged_idempotent(two_cliques_bridge):
    res = label_propagation(two_cliques_bridge, max_iter=30)
    assert res.stats[-1].delta == 0.0


def test_lpa_oscillation_stops_loudly(spark, capfd):
    """A 2-vertex graph 2-cycles under synchronous updates (each
    vertex adopts the other's label every round). The driver loop
    must detect the period-2 state recurrence and stop deterministically
    instead of silently burning max_iter rounds."""
    from conftest import graph_from_edges

    g = graph_from_edges(spark, [(1, 2)], directed=False)
    res = label_propagation(g, max_iter=50)
    # detection fires as soon as the round-0 state recurs (round 2)
    assert res.iterations <= 4
    assert res.stats[-1].delta == 0.0
    assert "oscillation detected" in capfd.readouterr().err
    # deterministic: the same stopping state every run
    a = collect_map(res.state, "id", "label")
    b = collect_map(label_propagation(g, max_iter=50).state, "id", "label")
    assert a == b


def test_lpa_weight_expr_json(spark):
    """weight_expr parity with PageRank/SSSP: vote weights extracted
    from a JSON attrs column steer the argmax away from the
    unweighted tie-break."""
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph

    rows = [
        (1, 2, 1.0, '{"w": 1.0}'),
        (2, 4, 1.0, '{"w": 10.0}'),
        (1, 4, 1.0, '{"w": 1.0}'),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, weight double, attrs string")
    g = LinkGraph(e, directed=False)
    unweighted = collect_map(label_propagation(g, max_iter=1).state, "id", "label")
    weighted = collect_map(
        label_propagation(
            g, max_iter=1, weight_expr=F.get_json_object("attrs", "$.w")
        ).state,
        "id",
        "label",
    )
    # node 4's neighbors: 1 (w=1) and 2 (w=10) — unweighted ties to the
    # smaller label, the JSON weight flips the vote to 2
    assert unweighted[4] == 1
    assert weighted[4] == 2


# --- modularity ---------------------------------------------------------------


def test_modularity_undirected_vs_networkx(spark):
    import networkx as nx

    from linkgraph.operators.lpa import modularity

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    g = graph_from_edges(spark, edges, directed=False)
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)], "id long, label long"
    )
    got = modularity(g, labels).collect()[0]["modularity"]
    G = nx.Graph(edges)
    want = nx.community.modularity(G, [{1, 2, 3}, {4, 5, 6}])
    assert abs(got - want) < 1e-12, (got, want)


def test_modularity_weighted_and_resolution(spark):
    import networkx as nx

    from linkgraph.operators.lpa import modularity

    edges = [(1, 2, 3.0), (2, 3, 1.0), (3, 4, 0.5), (4, 5, 2.0), (1, 3, 1.5)]
    g = graph_from_edges(spark, edges, directed=False)
    labels = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7), (4, 9), (5, 9)], "id long, label long"
    )
    got = modularity(g, labels, weighted=True, resolution=1.3).collect()[0][
        "modularity"
    ]
    G = nx.Graph()
    G.add_weighted_edges_from(edges)
    want = nx.community.modularity(
        G, [{1, 2, 3}, {4, 5}], weight="weight", resolution=1.3
    )
    assert abs(got - want) < 1e-12, (got, want)


def test_modularity_directed_vs_networkx(spark):
    import networkx as nx

    from linkgraph.operators.lpa import modularity

    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (1, 4)]
    g = graph_from_edges(spark, edges, directed=True)
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "id long, label long"
    )
    got = modularity(g, labels).collect()[0]["modularity"]
    want = nx.community.modularity(nx.DiGraph(edges), [{1, 2}, {3, 4}])
    assert abs(got - want) < 1e-12, (got, want)


def test_modularity_of_lpa_labels(spark):
    """End-to-end: modularity of the engine's own LPA communities on
    a two-clique-plus-bridge graph is the NetworkX value for the same
    partition (and positive — LPA finds the obvious communities)."""
    import networkx as nx

    from linkgraph.operators.lpa import label_propagation, modularity

    clique1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = clique1 + clique2 + [(4, 10)]
    g = graph_from_edges(spark, edges, directed=False)
    labels = label_propagation(g, max_iter=10).state
    got = modularity(g, labels).collect()[0]["modularity"]
    parts: dict[int, set[int]] = {}
    for r in labels.collect():
        parts.setdefault(r["label"], set()).add(r["id"])
    want = nx.community.modularity(nx.Graph(edges), list(parts.values()))
    assert abs(got - want) < 1e-12, (got, want)
    assert got > 0.3


def test_community_stats(spark):
    from linkgraph.operators.lpa import community_stats

    # two triangles joined by one bridge: clean conductance fixture
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    g = graph_from_edges(spark, edges, directed=False)
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)], "id long, label long"
    )
    got = {r["label"]: r for r in community_stats(g, labels).collect()}
    # each triangle: volume = 2*3 internal + 1 bridge end = 7
    for lbl in (0, 1):
        r = got[lbl]
        assert r["n_nodes"] == 3
        assert r["volume"] == 7
        assert r["internal_edges"] == 6
        assert r["cut_edges"] == 1
        assert abs(r["conductance"] - 1 / 7) < 1e-12
    # conductance matches networkx on the cut
    import networkx as nx

    G = nx.Graph(edges)
    want = nx.conductance(G, {1, 2, 3})
    assert abs(got[0]["conductance"] - want) < 1e-12


def test_community_stats_directed_and_unlabeled(spark):
    from linkgraph.operators.lpa import community_stats

    # directed edges mirror into the volume; vertex 9 unlabeled -> its
    # edge drops entirely
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 9)], directed=True)
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "id long, label long"
    )
    got = {r["label"]: r for r in community_stats(g, labels).collect()}
    assert got[0]["volume"] == 3 and got[0]["internal_edges"] == 2
    assert got[0]["cut_edges"] == 1
    assert got[1]["volume"] == 1 and got[1]["cut_edges"] == 1
    assert abs(got[1]["conductance"] - 1.0) < 1e-12


# --- label spreading (Zhou et al. 2004) --------------------------------------

import numpy as np
import pytest

from linkgraph.operators.lpa import (
    label_spreading,
    label_spreading_fixed_iterations,
    label_spreading_predict,
)


def _spreading_replica(edges, n_ids, seeds, alpha, iters=None):
    """Dense numpy replica: F←αSF+(1−α)Y from F=Y; iters=None solves
    the closed form (1−α)(I−αS)^{-1}Y."""
    ids = sorted(n_ids)
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    W = np.zeros((n, n))
    for u, v, *w in edges:
        wt = float(w[0]) if w else 1.0
        W[ix[u], ix[v]] += wt
        W[ix[v], ix[u]] += wt
    d = W.sum(axis=1)
    dinv = np.where(d > 0, 1.0 / np.sqrt(np.where(d > 0, d, 1.0)), 0.0)
    S = dinv[:, None] * W * dinv[None, :]
    labels = sorted({l for _, l in seeds})
    lx = {l: j for j, l in enumerate(labels)}
    Y = np.zeros((n, len(labels)))
    for v, l in seeds:
        Y[ix[v], lx[l]] = 1.0
    if iters is None:
        Fs = (1 - alpha) * np.linalg.solve(np.eye(n) - alpha * S, Y)
    else:
        Fs = Y.copy()
        for _ in range(iters):
            Fs = alpha * S @ Fs + (1 - alpha) * Y
    return {(ids[i], labels[j]): Fs[i, j] for i in range(n) for j in range(len(labels))}


SPREAD_EDGES = [
    (1, 2), (2, 3), (3, 1),          # triangle, seed class 10
    (3, 4), (4, 5), (5, 6), (6, 4),  # bridge into triangle, seed class 20
    (6, 7, 3.0),                     # weighted spur
]
SPREAD_SEEDS = [(1, 10), (5, 20)]


def test_label_spreading_fixed_matches_replica(spark):
    g = graph_from_edges(spark, SPREAD_EDGES, directed=False)
    seeds = spark.createDataFrame(SPREAD_SEEDS, "id long, label long")
    got = {
        (r.id, r.label): r.score
        for r in label_spreading_fixed_iterations(
            g, seeds, iterations=4, alpha=0.8, weighted=True
        ).collect()
    }
    want = _spreading_replica(
        SPREAD_EDGES, {u for e in SPREAD_EDGES for u in e[:2]},
        SPREAD_SEEDS, 0.8, iters=4,
    )
    # engine state is sparse: every nonzero replica entry must be
    # present and equal; engine rows must be a subset of the replica
    for k, v in got.items():
        assert v == pytest.approx(want[k], abs=1e-12)
    for k, v in want.items():
        if v > 0:
            assert k in got, k


def test_label_spreading_converges_to_closed_form(spark):
    g = graph_from_edges(spark, SPREAD_EDGES, directed=False)
    seeds = spark.createDataFrame(SPREAD_SEEDS, "id long, label long")
    res = label_spreading(g, seeds, alpha=0.8, tol=1e-12, max_iter=200, weighted=True)
    got = {(r.id, r.label): r.score for r in res.state.collect()}
    want = _spreading_replica(
        SPREAD_EDGES, {u for e in SPREAD_EDGES for u in e[:2]},
        SPREAD_SEEDS, 0.8, iters=None,
    )
    for k, v in want.items():
        if v > 1e-15:
            assert got[k] == pytest.approx(v, abs=1e-9), k
    pred = {r.id: r.label for r in label_spreading_predict(res.state).collect()}
    assert pred[2] == 10 and pred[1] == 10
    assert pred[6] == 20 and pred[7] == 20


def test_label_spreading_directed_uses_weak_structure(spark):
    # a directed chain diffuses BOTH ways (symmetrized), like LPA
    g = graph_from_edges(spark, [(1, 2), (2, 3)], directed=True)
    seeds = spark.createDataFrame([(3, 7)], "id long, label long")
    got = {
        (r.id, r.label): r.score
        for r in label_spreading_fixed_iterations(g, seeds, 3, alpha=0.5).collect()
    }
    assert got[(1, 7)] > 0  # reached upstream against edge direction


def test_label_spreading_rejects_bad_input(spark):
    g = graph_from_edges(spark, [(1, 2)], directed=False)
    two = spark.createDataFrame([(1, 5), (1, 6)], "id long, label long")
    with pytest.raises(ValueError, match="one label per id"):
        label_spreading(g, two)
    with pytest.raises(ValueError, match="alpha"):
        label_spreading(g, spark.createDataFrame([(1, 5)], "id long, label long"), alpha=1.0)
