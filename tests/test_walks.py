"""Deterministic random walks vs a pure-Python replica."""

from __future__ import annotations

import hashlib
import random

from conftest import graph_from_edges
from linkgraph.operators.walks import random_walks


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replica(edges, vertices, length, walks_per_node, seed, directed=True):
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    adj = {k: sorted(v) for k, v in adj.items()}
    rows = set()
    for v in vertices:
        for wn in range(walks_per_node):
            cur = v
            rows.add((v, wn, 0, v))
            for t in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_md5int(f"{seed}:{v}:{wn}:{t}") % len(nbrs)]
                rows.add((v, wn, t, cur))
    return rows


def test_walks_vs_replica_directed(spark):
    rng = random.Random(33)
    edges = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=True)
    got = {
        (r["start_id"], r["walk_no"], r["step"], r["id"])
        for r in random_walks(g, length=5, walks_per_node=2, seed=7).collect()
    }
    verts = sorted({x for e in edges for x in e})
    assert got == _replica(edges, verts, 5, 2, 7)


def test_walks_undirected_and_repeatable(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    g = graph_from_edges(spark, edges, directed=False)
    a = sorted(map(tuple, random_walks(g, length=6, seed=5).collect()))
    b = sorted(map(tuple, random_walks(g, length=6, seed=5).collect()))
    assert a == b
    verts = [1, 2, 3, 4]
    got = {
        (r["start_id"], r["walk_no"], r["step"], r["id"])
        for r in random_walks(g, length=6, seed=5).collect()
    }
    assert got == _replica(edges, verts, 6, 1, 5, directed=False)


def test_walks_stop_at_dangling(spark):
    # 1 -> 2 -> 3, 3 has no out-edges: every walk ends by step 2
    g = graph_from_edges(spark, [(1, 2), (2, 3)], directed=True)
    rows = random_walks(g, length=9, seed=1).collect()
    assert max(r["step"] for r in rows) <= 2
    assert {(r["start_id"], r["step"], r["id"]) for r in rows if r["start_id"] == 1} == {
        (1, 0, 1), (1, 1, 2), (1, 2, 3)
    }
