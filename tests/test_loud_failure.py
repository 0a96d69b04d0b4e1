"""Loud-failure + determinism contracts (VERDICT r1 items 4-5).

Iterative operators must RAISE when their iteration budget runs out
unconverged — a silently truncated fixpoint (vertices missing from an
SCC map, a partial forest) is a wrong answer, not a degraded one.
Mutation ops must be partition-order deterministic."""

import pytest

from conftest import graph_from_edges
from linkgraph import LinkGraph
from linkgraph.operators.components import (
    strongly_connected_components,
    weakly_connected_components,
)
from linkgraph.operators.mst import minimum_spanning_forest
from linkgraph.operators.pagerank import pagerank
from linkgraph.plans.iterate import ConvergenceError


def _path(n):
    return [(i, i + 1) for i in range(n)]


def test_wcc_raises_on_exhaustion(spark):
    # a path of length 12 needs ~12 label rounds; budget of 3 must raise
    g = graph_from_edges(spark, _path(12), directed=False)
    with pytest.raises(ConvergenceError):
        weakly_connected_components(g, max_iter=3)


def test_scc_raises_on_exhaustion(spark):
    # chain of singleton SCCs: FW-BW peels one per round → budget 2 raises
    g = graph_from_edges(spark, _path(8), directed=True)
    with pytest.raises(ConvergenceError):
        strongly_connected_components(g, max_peels=2)


def test_mst_raises_on_exhaustion(spark):
    # alternating cheap/expensive path edges: round 1 merges pairs via
    # the cheap edges, the expensive bridges need round 2 — budget 1
    # must raise, not return a partial forest
    g = graph_from_edges(
        spark,
        [(a, b, 1.0 + a if a % 2 == 0 else 100.0 + a) for a, b in _path(9)],
        directed=False,
    )
    with pytest.raises(ConvergenceError):
        minimum_spanning_forest(g, max_rounds=1)


def test_pagerank_raises_like_networkx(spark, two_cliques_bridge):
    with pytest.raises(ConvergenceError):
        pagerank(two_cliques_bridge, tol=1e-12, max_iter=2)


def test_pagerank_rejects_empty_personalization(spark, two_cliques_bridge):
    p = spark.createDataFrame([], "id long, p double")
    with pytest.raises(ValueError):
        pagerank(two_cliques_bridge, personalization=p)


def test_update_is_deterministic_other_wins(spark):
    # same (src,dst) with different weights: other's weight must win,
    # identically on every run (no partition-order dependence)
    a = graph_from_edges(spark, [(1, 2, 5.0), (2, 3, 1.0)])
    b = graph_from_edges(spark, [(1, 2, 9.0), (3, 4, 2.0)])
    for _ in range(3):
        rows = {(r["src"], r["dst"]): r["weight"] for r in a.update(b).edges.collect()}
        assert rows == {(1, 2): 9.0, (2, 3): 1.0, (3, 4): 2.0}


def test_add_edges_intra_batch_duplicates_deterministic(spark):
    g = LinkGraph.empty(spark, directed=True)
    batch = spark.createDataFrame(
        [(1, 2, 7.0), (1, 2, 3.0), (1, 2, 5.0)], "src long, dst long, weight double"
    )
    for _ in range(3):
        rows = g.add_edges(batch).edges.collect()
        assert [(r["src"], r["dst"], r["weight"]) for r in rows] == [(1, 2, 3.0)]


def test_multi_source_relaxation_raises_on_exhaustion(spark):
    """An unconverged Bellman-Ford frontier raises instead of
    silently returning incomplete distances."""
    from linkgraph.operators.centrality import multi_source_shortest_paths

    edges = [(i, i + 1, 1.0) for i in range(8)]
    g = graph_from_edges(spark, edges, directed=True)
    src = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ConvergenceError):
        multi_source_shortest_paths(g, src, max_iter=3)
