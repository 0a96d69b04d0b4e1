"""1-WL signatures vs a pure-Python color-refinement replica, plus
isomorphism-invariance properties."""

import hashlib

from conftest import graph_from_edges
from linkgraph.operators.wl import wl_graph_fingerprint, wl_signatures


def md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_wl(nodes, edges, rounds):
    adj = {v: [] for v in nodes}
    for s, d in {(min(a, b), max(a, b)) for a, b in edges if a != b}:
        adj[s].append(d)
        adj[d].append(s)
    lbl = {v: md5int(f"d:{len(adj[v])}") for v in nodes}
    for _ in range(rounds):
        lbl = {
            v: md5int(f"{lbl[v]}:" + ",".join(str(x) for x in sorted(lbl[u] for u in adj[v])))
            for v in nodes
        }
    return lbl


EDGES = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (2, 2), (3, 2)]
NODES = [1, 2, 3, 4, 5, 6, 7]  # 7 isolated


def test_matches_python_replica(spark):
    g = graph_from_edges(spark, EDGES, directed=False, vertices=NODES)
    for rounds in (0, 1, 3):
        got = {r["id"]: r["wl"] for r in wl_signatures(g, rounds).collect()}
        assert got == py_wl(NODES, EDGES, rounds)


def test_isomorphic_relabeling_same_multiset(spark):
    g1 = graph_from_edges(spark, EDGES, directed=False, vertices=NODES)
    shift = 10_000
    g2 = graph_from_edges(
        spark,
        [(s + shift, d + shift) for s, d in EDGES],
        directed=False,
        vertices=[v + shift for v in NODES],
    )
    m1 = sorted(r["wl"] for r in wl_signatures(g1, 3).collect())
    m2 = sorted(r["wl"] for r in wl_signatures(g2, 3).collect())
    assert m1 == m2
    f1 = wl_graph_fingerprint(g1, 3).collect()[0]
    f2 = wl_graph_fingerprint(g2, 3).collect()[0]
    assert (f1["n_vertices"], f1["fingerprint"]) == (f2["n_vertices"], f2["fingerprint"])


def test_nonisomorphic_rejected(spark):
    # path P4 vs star K1,3: same size, different degree sequence
    p4 = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    star = graph_from_edges(spark, [(1, 2), (1, 3), (1, 4)], directed=False)
    mp = sorted(r["wl"] for r in wl_signatures(p4, 2).collect())
    ms = sorted(r["wl"] for r in wl_signatures(star, 2).collect())
    assert mp != ms


def test_refinement_distinguishes_within_graph(spark):
    # in P4, ends and middles split at round 0 (degree); the two ends
    # share a signature at every round (they are symmetric)
    p4 = graph_from_edges(spark, [(1, 2), (2, 3), (3, 4)], directed=False)
    sig = {r["id"]: r["wl"] for r in wl_signatures(p4, 2).collect()}
    assert sig[1] == sig[4] and sig[2] == sig[3] and sig[1] != sig[2]
