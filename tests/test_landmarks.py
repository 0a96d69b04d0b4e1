"""Landmark distance oracle: upper-bound property, exactness with
full landmark cover, and NetworkX ground truth on seeded digraphs."""

import random

import networkx as nx
import pytest

from conftest import graph_from_edges
from linkgraph.operators.landmarks import (
    estimate_distances,
    landmark_index,
    select_landmarks,
)


def _est(spark, g, pairs, **kw):
    p = spark.createDataFrame(pairs, "src long, dst long")
    rows = estimate_distances(g, p, **kw).collect()
    return {(r.src, r.dst): r.est_distance for r in rows}


def _nx_digraph(seed, n=24, m=60):
    rng = random.Random(seed)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    while G.number_of_edges() < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            G.add_edge(a, b)
    return G


def test_select_landmarks_deterministic_top_degree(spark):
    g = graph_from_edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (5, 1), (5, 2)]
    )
    # degrees: 1→4, 2→3, 3→2, 5→2, 4→1; tie 3 vs 5 broken by id asc
    got = [r.id for r in select_landmarks(g, 3).collect()]
    assert got == [1, 2, 3]
    with pytest.raises(ValueError):
        select_landmarks(g, 0)


def test_estimate_is_upper_bound_and_exact_via_landmark(spark):
    # path 1→2→3→4→5 plus shortcut 1→4
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)])
    lm = spark.createDataFrame([(3,)], "id long")
    est = _est(spark, g, [(1, 5), (2, 4), (5, 1)], landmarks=lm)
    # 1→5 true distance 2 (1→4→5); via landmark 3: d(1,3)+d(3,5)=2+2=4
    assert est[(1, 5)] == 4
    # 2→4: shortest path 2→3→4 passes the landmark → exact
    assert est[(2, 4)] == 2
    # 5 reaches nothing → no landmark connects the pair
    assert est[(5, 1)] is None


def test_src_is_landmark_gives_exact_distance(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    lm = spark.createDataFrame([(1,)], "id long")
    est = _est(spark, g, [(1, 3), (1, 4)], landmarks=lm)
    assert est[(1, 3)] == 2 and est[(1, 4)] == 1


@pytest.mark.parametrize("seed", [7, 19])
def test_full_landmark_cover_matches_networkx_exactly(spark, seed):
    G = _nx_digraph(seed)
    g = graph_from_edges(spark, list(G.edges()))
    truth = dict(nx.all_pairs_shortest_path_length(G))
    rng = random.Random(seed + 1)
    pairs = [
        (rng.randrange(24), rng.randrange(24)) for _ in range(40)
    ]
    # landmarks = every vertex → the min always includes l = src → exact
    lm = spark.createDataFrame([(int(v),) for v in G.nodes()], "id long")
    est = _est(spark, g, pairs, landmarks=lm)
    for (u, v) in set(pairs):
        want = truth.get(u, {}).get(v)
        assert est[(u, v)] == want, (u, v, est[(u, v)], want)


def test_sampled_landmarks_upper_bound_networkx(spark):
    G = _nx_digraph(31)
    g = graph_from_edges(spark, list(G.edges()))
    truth = dict(nx.all_pairs_shortest_path_length(G))
    rng = random.Random(5)
    pairs = [(rng.randrange(24), rng.randrange(24)) for _ in range(40)]
    est = _est(spark, g, pairs, num_landmarks=4)
    for (u, v) in set(pairs):
        want = truth.get(u, {}).get(v)
        got = est[(u, v)]
        if want is None:
            assert got is None  # oracle can't invent connectivity
        elif got is not None:
            assert got >= want


def test_prebuilt_index_reuse(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    idx = landmark_index(g, num_landmarks=2).cache()
    try:
        a = _est(spark, g, [(1, 4)], index=idx)
        b = _est(spark, g, [(2, 4)], index=idx)
        assert a[(1, 4)] is not None and b[(2, 4)] is not None
    finally:
        idx.unpersist()


def test_index_shape_directed_asymmetry(spark):
    g = graph_from_edges(spark, [(1, 2), (2, 3)])
    lm = spark.createDataFrame([(1,)], "id long")
    rows = {r.id: r for r in landmark_index(g, landmarks=lm).collect()}
    assert rows[3].d_from == 2 and rows[3].d_to is None
    assert rows[1].d_from == 0 and rows[1].d_to == 0
