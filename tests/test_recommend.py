"""Who-to-Follow (Gupta et al. WWW'13) vs an exact pure-Python
replay of the composite: batched sparse PPR → circle of trust →
per-seed bipartite personalized SALSA → exclusion + top-k."""

import numpy as np
import pytest

from conftest import graph_from_edges


def _py_wtf(edges, seeds, ppr_k, cot_size, salsa_k, topk, alpha=0.85):
    verts = sorted({v for e in edges for v in e})
    out = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    recs = {}
    for s in seeds:
        # sparse PPR: x0 = delta_seed, dangling folds onto the seed
        x = {s: 1.0}
        for _ in range(ppr_k):
            nxt = {}
            dang = 0.0
            for u, r in x.items():
                if u in out:
                    p = 1.0 / len(out[u])
                    for v in out[u]:
                        nxt[v] = nxt.get(v, 0.0) + alpha * r * p
                else:
                    dang += alpha * r
            nxt[s] = nxt.get(s, 0.0) + dang + (1.0 - alpha)
            x = nxt
        cot = sorted(x, key=lambda v: (-round(x[v], 9), v))[:cot_size]
        # bipartite: hubs = cot members with out-edges
        bip = [(h, v) for h in cot if h in out for v in out[h]]
        if not bip:
            recs[s] = []
            continue
        hubs = sorted({h for h, _ in bip})
        od = {h: sum(1 for x2, _ in bip if x2 == h) for h in hubs}
        idg = {}
        for _, v in bip:
            idg[v] = idg.get(v, 0) + 1
        hub = {h: 1.0 / len(hubs) for h in hubs}
        auth = {}
        for _ in range(salsa_k):
            a_raw = {}
            for h, v in bip:
                a_raw[v] = a_raw.get(v, 0.0) + hub[h] / od[h]
            tot = sum(a_raw.values())
            auth = {v: r / tot for v, r in a_raw.items()}
            h_raw = {}
            for h, v in bip:
                h_raw[h] = h_raw.get(h, 0.0) + auth[v] / idg[v]
            tot = sum(h_raw.values())
            hub = {h: r / tot for h, r in h_raw.items()}
        banned = set(out.get(s, [])) | {s}
        cand = [(v, round(a, 9)) for v, a in auth.items() if v not in banned]
        cand.sort(key=lambda t: (-t[1], t[0]))
        recs[s] = [(s, v, sc, i + 1) for i, (v, sc) in enumerate(cand[:topk])]
    return {r for rows in recs.values() for r in rows}


def test_wtf_vs_python_replica(spark):
    from linkgraph.operators.recommend import who_to_follow

    rng = np.random.RandomState(2718)
    edges = sorted({(int(rng.randint(0, 60)), int(rng.randint(0, 60))) for _ in range(280)})
    edges = [(a, b) for a, b in edges if a != b]
    g = graph_from_edges(spark, edges)
    seeds = [0, 7, 23]
    sdf = spark.createDataFrame([(s,) for s in seeds], "seed long")
    got = {
        (r["seed"], r["id"], round(r["score"], 9), r["pos"])
        for r in who_to_follow(g, sdf, ppr_k=3, cot_size=6, salsa_k=4, topk=5).collect()
    }
    want = _py_wtf(edges, seeds, ppr_k=3, cot_size=6, salsa_k=4, topk=5)
    assert got == want
    assert got  # non-degenerate: at least one recommendation produced
    # no seed is ever recommended to itself / an existing followee
    follows = set(edges)
    for s, v, _, _ in got:
        assert v != s and (s, v) not in follows


def test_wtf_no_out_edges_seed(spark):
    """A seed whose circle has no out-edges yields no rows, not a crash."""
    from linkgraph.operators.recommend import who_to_follow

    g = graph_from_edges(spark, [(1, 2), (2, 3)])
    sdf = spark.createDataFrame([(3,)], "seed long")  # sink vertex
    rows = who_to_follow(g, sdf, ppr_k=2, cot_size=4, salsa_k=2, topk=3).collect()
    # 3's PPR mass stays on {3}; cot={3}, 3 has no out-edges → empty
    assert rows == []


def test_wtf_rejects_zero_salsa_rounds(spark):
    from linkgraph.operators.recommend import who_to_follow

    with pytest.raises(ValueError):
        who_to_follow(None, None, salsa_k=0)
