"""ACL PPR sweep cut vs a pure-Python replica, on a planted
two-clique graph where the right answer is unambiguous."""

import pytest
from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph.operators.localcluster import local_community


def _planted(spark):
    # clique A = 1..6, clique B = 11..16, one bridge 6-11
    edges = []
    for block in (range(1, 7), range(11, 17)):
        bs = list(block)
        edges += [(a, b) for i, a in enumerate(bs) for b in bs[i + 1:]]
    edges.append((6, 11))
    return edges, graph_from_edges(spark, edges, directed=False)


def _py_sweep(edges, seed, alpha, k):
    # undirected: both directions, unit weights
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    outw = {}
    for a, _ in sym:
        outw[a] = outw.get(a, 0) + 1
    # fixed-k sparse PPR push (personalized_pagerank_batch semantics)
    x = {seed: 1.0}
    for _ in range(k):
        nxt = {seed: 1.0 - alpha}
        for u, r in x.items():
            if u in outw:
                for a, b in sym:
                    if a == u:
                        nxt[b] = nxt.get(b, 0.0) + alpha * r / outw[u]
            else:
                nxt[seed] = nxt.get(seed, 0.0) + alpha * r
        x = nxt
    cand = {u: r for u, r in x.items() if r > 0}
    deg = {u: outw.get(u, 0) for u in cand}  # simple projection degree
    order = sorted(
        cand,
        key=lambda u: (-(cand[u] / deg[u]) if deg[u] else -(cand[u] - 1.0), u),
    )
    pos = {u: i + 1 for i, u in enumerate(order)}
    vt = sum(outw.values())
    vol = cut = internal = 0
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    rows = []
    for i, u in enumerate(order, 1):
        vol += deg[u]
        internal += sum(
            1 for (a, b) in canon
            if a in pos and b in pos and max(pos[a], pos[b]) == i
        )
        cut = vol - 2 * internal
        denom = min(vol, vt - vol)
        cond = cut / denom if denom > 0 else 1.0
        rows.append((i, u, cand[u], deg[u], vol, cut, cond))
    best = min(rows, key=lambda r: (r[6], r[0]))[0]
    return rows, best


def test_local_community_matches_replica_and_recovers_clique(spark):
    edges, g = _planted(spark)
    res = local_community(g, seed=1, alpha=0.85, k=4).collect()
    got = {
        r["pos"]: (r["id"], r["ppr"], r["degree"], r["vol"], r["cut"],
                   r["conductance"], r["in_community"])
        for r in res
    }
    rows, best = _py_sweep(edges, seed=1, alpha=0.85, k=4)
    assert len(got) == len(rows)
    for (i, u, ppr, d, vol, cut, cond) in rows:
        gid, gppr, gd, gvol, gcut, gcond, gin = got[i]
        assert gid == u and gd == d and gvol == vol and gcut == cut
        assert gppr == pytest.approx(ppr, rel=1e-9)
        assert gcond == pytest.approx(cond, rel=1e-9)
        assert gin == (i <= best)
    # the planted community is recovered exactly
    members = {r["id"] for r in res if r["in_community"]}
    assert members == set(range(1, 7))


def test_local_community_max_size_caps_the_cut(spark):
    edges, g = _planted(spark)
    res = local_community(g, seed=1, alpha=0.85, k=4, max_size=3).collect()
    members = [r["id"] for r in res if r["in_community"]]
    assert 0 < len(members) <= 3
