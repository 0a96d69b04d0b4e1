"""Balanced label-propagation partitioning vs a pure-Python replica
(exact hash init, exact admission trajectories in both modes), plus
behavioral checks: strict caps under rank admission, locality
improvement on clustered graphs, determinism, resume, validation."""

import hashlib
import math

import pytest

from conftest import graph_from_edges
from linkgraph.operators.partition import balanced_partition, edge_locality


def md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_balanced_partition(edges, directed, n_parts, max_iter, slack, seed,
                          admission="rank"):
    """Bit-for-bit replica of the operator's round arithmetic."""
    sym = []
    for s, d in edges:
        sym.append((s, d))
        if directed:
            sym.append((d, s))
    if not directed:
        sym = list(edges) + [(d, s) for s, d in edges if s != d]
    ids = sorted({s for s, _ in sym} | {d for _, d in sym})
    cap = math.ceil(len(ids) / n_parts * (1.0 + slack))
    part = {i: md5int(f"bp:{seed}:{i}") % n_parts for i in ids}
    for rnd in range(max_iter):
        cnt = {}
        for s, d in sym:
            cnt.setdefault(d, {}).setdefault(part[s], 0)
            cnt[d][part[s]] += 1
        movers = []
        for i in ids:
            c = cnt.get(i)
            if not c:
                continue
            best = min(c, key=lambda t: (-c[t], t))
            cur = part[i]
            gain = c[best] - c.get(cur, 0)
            if best != cur and gain > 0:
                movers.append((i, best, gain))
        sizes = {}
        for i in ids:
            sizes[part[i]] = sizes.get(part[i], 0) + 1
        room = {t: max(0, cap - sizes.get(t, 0)) for t in range(n_parts)}
        admitted = {}
        if admission == "rank":
            per_t = {}
            for i, b, g in movers:
                per_t.setdefault(b, []).append((i, g))
            for t, lst in per_t.items():
                lst.sort(key=lambda x: (-x[1], x[0]))
                for i, _ in lst[: room[t]]:
                    admitted[i] = t
        else:
            demand = {}
            for i, b, _ in movers:
                demand[b] = demand.get(b, 0) + 1
            for i, b, _ in movers:
                dem = max(1, demand.get(b, 0))
                if dem <= room[b] or md5int(f"bpadm:{seed}:{rnd}:{i}") % dem < room[b]:
                    admitted[i] = b
        if not admitted:
            break
        for i, t in admitted.items():
            part[i] = t
    return part


EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (5, 6), (6, 4),
    (7, 8), (8, 9), (9, 7), (7, 1), (10, 7), (10, 2), (5, 10),
]


@pytest.mark.parametrize("admission", ["rank", "hash"])
def test_replica_exact(spark, admission):
    g = graph_from_edges(spark, EDGES)
    res = balanced_partition(
        g, n_parts=3, max_iter=4, slack=0.2, seed=9, admission=admission
    )
    got = {r["id"]: r["part"] for r in res.state.collect()}
    want = py_balanced_partition(
        EDGES, True, 3, 4, 0.2, 9, admission=admission
    )
    assert got == want


def test_rank_caps_are_strict(spark):
    # star-heavy graph that WANTS everyone in one part. The cap is an
    # ADMISSION constraint: a part can never grow past cap, but one
    # over-cap from the hash init only shrinks by voluntary departure
    # — so the invariant is final_t <= max(init_t, cap).
    edges = [(0, i) for i in range(1, 30)] + [(i, 0) for i in range(1, 30)]
    g = graph_from_edges(spark, edges)
    res = balanced_partition(g, n_parts=3, max_iter=5, slack=0.1, seed=1)
    sizes = {}
    for r in res.state.collect():
        sizes[r["part"]] = sizes.get(r["part"], 0) + 1
    init = {}
    for i in range(30):
        t = md5int(f"bp:1:{i}") % 3
        init[t] = init.get(t, 0) + 1
    cap = math.ceil(30 / 3 * 1.1)
    assert all(n <= max(cap, init.get(t, 0)) for t, n in sizes.items()), (
        sizes,
        init,
    )
    # and the star graph is NOT all in one part
    assert len(sizes) > 1


def test_locality_improves_on_cliques(spark):
    edges = []
    for base in (0, 100, 200):
        ids = [base + i for i in range(8)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges += [(0, 100), (100, 200)]
    g = graph_from_edges(spark, edges, directed=False)
    res = balanced_partition(g, n_parts=3, max_iter=8, slack=0.3, seed=4)
    loc = edge_locality(g, res.state).collect()[0]
    # compare against the hash-random initial assignment
    from linkgraph.operators.partition import _init_part

    init_parts = g.vertices.select("id", _init_part(3, 4).alias("part"))
    loc0 = edge_locality(g, init_parts).collect()[0]
    assert loc["locality"] > loc0["locality"]
    assert loc["n_edges"] == len(edges)


def test_determinism_across_runs(spark):
    g = graph_from_edges(spark, EDGES)
    a = {r["id"]: r["part"] for r in balanced_partition(
        g, n_parts=3, max_iter=3, seed=7
    ).state.collect()}
    b = {r["id"]: r["part"] for r in balanced_partition(
        g, n_parts=3, max_iter=3, seed=7
    ).state.collect()}
    assert a == b


def test_checkpoint_resume(spark, tmp_path):
    g = graph_from_edges(spark, EDGES)
    full = {r["id"]: r["part"] for r in balanced_partition(
        g, n_parts=3, max_iter=4, seed=9
    ).state.collect()}
    ck = str(tmp_path / "bp_ck")
    balanced_partition(
        g, n_parts=3, max_iter=2, seed=9, checkpoint_dir=ck, checkpoint_every=1
    )
    resumed = {r["id"]: r["part"] for r in balanced_partition(
        g, n_parts=3, max_iter=4, seed=9, checkpoint_dir=ck, checkpoint_every=1
    ).state.collect()}
    assert full == resumed


def test_validation(spark):
    g = graph_from_edges(spark, EDGES)
    with pytest.raises(ValueError, match="n_parts"):
        balanced_partition(g, n_parts=0)
    with pytest.raises(ValueError, match="slack"):
        balanced_partition(g, n_parts=2, slack=-0.1)
    with pytest.raises(ValueError, match="admission"):
        balanced_partition(g, n_parts=2, admission="lp")


def test_single_part_converges_immediately(spark):
    g = graph_from_edges(spark, EDGES)
    res = balanced_partition(g, n_parts=1, max_iter=5)
    assert {r["part"] for r in res.state.collect()} == {0}
    assert res.iterations <= 2
