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


# --- node2vec second-order biased walks ---------------------------------------


def _n2v_replica(edges, vertices, length, p, q, walks_per_node, seed, directed=True):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    sadj = {k: sorted(v) for k, v in adj.items()}
    rows = set()
    for v in vertices:
        for wn in range(walks_per_node):
            prev, cur = None, v
            rows.add((v, wn, 0, v))
            for t in range(1, length + 1):
                nbrs = sadj.get(cur)
                if not nbrs:
                    break
                ws = []
                for nbr in nbrs:
                    if prev is not None and nbr == prev:
                        ws.append(1.0 / p)
                    elif prev is not None and nbr in adj.get(prev, ()):
                        ws.append(1.0)
                    else:
                        ws.append(1.0 / q)
                r = _md5int(f"{seed}:{v}:{wn}:{t}") / float(1 << 60)
                tot, cum, pick = sum(ws), 0.0, nbrs[-1]
                for nbr, w in zip(nbrs, ws):
                    cum += w
                    if cum > r * tot:
                        pick = nbr
                        break
                prev, cur = cur, pick
                rows.add((v, wn, t, cur))
    return rows


def test_node2vec_vs_replica_directed(spark):
    from linkgraph.operators.walks import node2vec_walks

    rng = random.Random(91)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(45)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges, directed=True)
    got = {
        (r["start_id"], r["walk_no"], r["step"], r["id"])
        for r in node2vec_walks(
            g, length=5, p=0.25, q=4.0, walks_per_node=2, seed=3
        ).collect()
    }
    verts = sorted({x for e in edges for x in e})
    assert got == _n2v_replica(edges, verts, 5, 0.25, 4.0, 2, 3)


def test_node2vec_vs_replica_undirected(spark):
    from linkgraph.operators.walks import node2vec_walks

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5), (5, 6)]
    g = graph_from_edges(spark, edges, directed=False)
    got = {
        (r["start_id"], r["walk_no"], r["step"], r["id"])
        for r in node2vec_walks(g, length=6, p=2.0, q=0.5, seed=11).collect()
    }
    verts = [1, 2, 3, 4, 5, 6]
    assert got == _n2v_replica(edges, verts, 6, 2.0, 0.5, 1, 11, directed=False)


def test_node2vec_return_bias_limit(spark):
    """p→0 forces an immediate backtrack whenever the predecessor is
    an out-neighbor: on the 2-cycle 1↔2 every step alternates."""
    from linkgraph.operators.walks import node2vec_walks

    g = graph_from_edges(spark, [(1, 2), (2, 1), (2, 3), (3, 2)], directed=True)
    rows = node2vec_walks(g, length=6, p=1e-9, q=1.0, seed=2).collect()
    byw = {}
    for r in rows:
        byw.setdefault(r["start_id"], {})[r["step"]] = r["id"]
    for start, steps in byw.items():
        for t in range(2, max(steps) + 1):
            assert steps[t] == steps[t - 2], (start, t, steps)
