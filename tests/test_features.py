"""Neighborhood feature aggregation vs a brute-force replica across
directions, with missing-feature and multi-edge semantics."""

from __future__ import annotations

import random

import pytest

from conftest import graph_from_edges
from linkgraph.operators.features import aggregate_neighbor_features


def _brute(edges, feats, verts, direction):
    nbrs = {v: [] for v in verts}
    for a, b in edges:
        if direction in ("in", "both"):
            nbrs[b].append(a)
        if direction in ("out", "both"):
            nbrs[a].append(b)
    out = {}
    for v in verts:
        xs = [feats[n] for n in nbrs[v] if n in feats]
        out[v] = (
            len(xs),
            sum(xs) / len(xs) if xs else None,
            max(xs) if xs else None,
        )
    return out


@pytest.mark.parametrize("direction", ["in", "out", "both"])
def test_directed_aggregation(spark, direction):
    rng = random.Random(5)
    edges = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(50)})
    edges = [(a, b) for a, b in edges if a != b]
    verts = sorted({x for e in edges for x in e})
    feats = {v: float(v * 3 + 1) for v in verts if v % 4 != 0}  # some missing
    g = graph_from_edges(spark, edges, directed=True)
    fdf = spark.createDataFrame(list(feats.items()), "id long, x double")
    got = {
        r["id"]: (r["nbr_count"], r["mean_x"], r["max_x"])
        for r in aggregate_neighbor_features(
            g, fdf, direction=direction, aggs=("mean", "max")
        ).collect()
    }
    want = _brute(edges, feats, verts, direction)
    assert set(got) == set(want)
    for v, (n, mean, mx) in want.items():
        gn, gm, gx = got[v]
        assert gn == n, (v, gn, n)
        if mean is None:
            assert gm is None and gx is None
        else:
            assert abs(gm - mean) < 1e-12 and gx == mx


def test_undirected_and_multiplicity(spark):
    # parallel edge (1,2)x2: neighbor 2 counts twice for vertex 1
    g = graph_from_edges(spark, [(1, 2), (1, 2), (2, 3)], directed=False)
    fdf = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, x double"
    )
    got = {
        r["id"]: (r["nbr_count"], r["mean_x"])
        for r in aggregate_neighbor_features(g, fdf, aggs=("mean",)).collect()
    }
    assert got[1] == (2, 20.0)
    assert got[2] == (3, (10.0 + 10.0 + 30.0) / 3)
    assert got[3] == (1, 20.0)


def test_validation(spark):
    g = graph_from_edges(spark, [(1, 2)], directed=True)
    fdf = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        aggregate_neighbor_features(g, fdf, aggs=("median",))
    with pytest.raises(ValueError):
        aggregate_neighbor_features(g, fdf, direction="sideways")


def test_neighbor_embeddings_mean(spark):
    from linkgraph.operators.features import aggregate_neighbor_embeddings

    edges = [(1, 3), (2, 3), (3, 1), (1, 3)]  # parallel (1,3) counts twice
    g = graph_from_edges(spark, edges, directed=True)
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 6.0]), (3, [5.0, 10.0])],
        "id long, vec array<double>",
    )
    got = {r["id"]: (r["nbr_count"], r["mean_vec"])
           for r in aggregate_neighbor_embeddings(g, emb).collect()}
    # vertex 3: in-nbrs 1,2,1 -> mean ([1,2],[3,6],[1,2]) = [5/3, 10/3]
    n, v = got[3]
    assert n == 3 and abs(v[0] - 5 / 3) < 1e-12 and abs(v[1] - 10 / 3) < 1e-12
    assert got[1] == (1, [5.0, 10.0])
    assert got[2][0] == 0 and got[2][1] is None
