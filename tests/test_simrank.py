"""Monte-Carlo SimRank vs an exact pure-Python replay of the same
coupled-walk estimator (identical portable counter hash), plus mode
equivalence and determinism."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph.operators.simrank import simrank_scores


def _h(seed, start, walk_no, t):
    s = f"{seed}:{start}:{walk_no}:{t}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_simrank(edges, decay, length, samples, seed):
    """Exact replay of the estimator: reverse adjacency, coupled
    deterministic walks, first-meeting decay average."""
    radj = {}
    for s, d in {(s, d) for s, d in edges}:
        radj.setdefault(d, set()).add(s)
    radj = {v: sorted(ins) for v, ins in radj.items()}
    verts = sorted({x for e in edges for x in e})
    walks = {}  # (start, walk_no) -> [pos at step 1..length]
    for v in verts:
        for wn in range(samples):
            pos, traj = v, []
            for t in range(1, length + 1):
                ins = radj.get(pos)
                if not ins:
                    break
                pos = ins[_h(seed, v, wn, t) % len(ins)]
                traj.append((t, pos))
            walks[(v, wn)] = traj
    scores = {}
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            tot = 0.0
            for wn in range(samples):
                met = [
                    t
                    for (t, p) in walks[(u, wn)]
                    if (t, p) in walks[(v, wn)]
                ]
                if met:
                    tot += decay ** min(met)
            if tot:
                scores[(u, v)] = tot / samples
    return scores


EDGES = [
    (1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5),
    (5, 1), (5, 2), (3, 6), (4, 6), (6, 2), (2, 6),
]


def test_simrank_matches_pure_python_replay(spark):
    g = graph_from_edges(spark, EDGES, directed=True)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in simrank_scores(
            g, decay=0.5, walk_length=4, samples=2, seed=11
        ).collect()
    }
    want = _py_simrank(
        [(s, d) for s, d in EDGES], decay=0.5, length=4, samples=2, seed=11
    )
    assert got == want  # dyadic decay => exact equality
    assert all(0.0 < s <= 1.0 for s in got.values())


def test_simrank_sources_mode_matches_all_pairs(spark):
    g = graph_from_edges(spark, EDGES, directed=True)
    srcs = spark.createDataFrame([(3,), (4,)], "id long")
    got = {
        (r["u"], r["v"]): r["score"]
        for r in simrank_scores(
            g, sources=srcs, decay=0.5, walk_length=4, samples=2, seed=11
        ).collect()
    }
    allp = {
        (r["u"], r["v"]): r["score"]
        for r in simrank_scores(
            g, decay=0.5, walk_length=4, samples=2, seed=11
        ).collect()
    }
    want = {}
    for (u, v), s in allp.items():
        if u in (3, 4):
            want[(u, v)] = s
        if v in (3, 4):
            want[(v, u)] = s
    assert got == want


def test_simrank_top_k_deterministic_cut(spark):
    g = graph_from_edges(spark, EDGES, directed=True)
    full = simrank_scores(g, decay=0.5, walk_length=4, samples=2, seed=11)
    k1 = simrank_scores(g, decay=0.5, walk_length=4, samples=2, seed=11, top_k=1)
    rows = {r["u"]: (r["v"], r["score"]) for r in k1.collect()}
    by_u = {}
    for r in full.collect():
        by_u.setdefault(r["u"], []).append((-r["score"], r["v"]))
    for u, lst in by_u.items():
        neg_s, v = min(lst)
        assert rows[u] == (v, -neg_s)


def test_simrank_validation(spark):
    g = graph_from_edges(spark, EDGES, directed=True)
    with pytest.raises(ValueError):
        simrank_scores(g, decay=1.0)
    with pytest.raises(ValueError):
        simrank_scores(g, samples=0)
