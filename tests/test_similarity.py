import numpy as np

from linkgraph.operators.similarity import (
    ann_cosine_topk,
    cosine_topk,
    embedding_near_duplicates,
)


def _emb_df(spark, n=40, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[7] = vecs[3] * 2.0  # exact-direction duplicate pair (3, 7)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def _numpy_topk(vecs, qid, k):
    v = vecs.astype(np.float64)
    sims = v @ v[qid] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[qid]))
    order = sorted((-(s), i) for i, s in enumerate(sims) if i != qid)
    return [i for _, i in order[:k]]


def test_cosine_topk_exact(spark):
    df, vecs = _emb_df(spark)
    queries = df.filter("vec_id < 3")
    out = cosine_topk(df, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["sim"]))
    for q in range(3):
        got = [n for _, n, _ in sorted(by_q[q])]
        assert got == _numpy_topk(vecs, q, 5)
        sims = [s for _, _, s in sorted(by_q[q])]
        assert sims == sorted(sims, reverse=True)


def test_ann_finds_exact_duplicate_direction(spark):
    df, _ = _emb_df(spark)
    queries = df.filter("vec_id = 3")
    out = ann_cosine_topk(df, queries, k=3, n_planes=6).collect()
    # vec 7 is colinear with vec 3 → same LSH bucket always, sim 1.0
    top = sorted(out, key=lambda r: r["rank"])[0]
    assert top["neighbor_id"] == 7
    assert abs(top["sim"] - 1.0) < 1e-6


def test_ann_subset_of_exact_candidates(spark):
    df, vecs = _emb_df(spark)
    queries = df.filter("vec_id < 5")
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, queries, k=40).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in ann_cosine_topk(df, queries, k=40).collect()}
    assert approx <= exact  # ANN returns a subset (bucket-pruned)


def test_embedding_near_duplicates(spark):
    df, _ = _emb_df(spark)
    out = embedding_near_duplicates(df, threshold=0.99).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert (3, 7) in pairs


def test_ann_multiprobe_improves_recall(spark):
    """Multi-probe probes the smallest-margin neighbor buckets: its
    recall against the exact top-k must dominate single-probe's.
    Clustered embeddings (the case LSH exists for — iid gaussian
    vectors have no neighborhood structure to recover)."""
    rng = np.random.RandomState(11)
    centroids = rng.normal(size=(6, 16))
    vecs = np.vstack([
        c + 0.15 * rng.normal(size=(10, 16)) for c in centroids
    ]).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 8")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, queries, k=5).collect()
    }

    def recall(multiprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_cosine_topk(
                df, queries, k=5, n_planes=8, multiprobe=multiprobe
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r4 = recall(0), recall(4)
    assert r4 >= r0
    assert r4 >= 0.5  # 4 extra probes over 8 planes recovers most of top-5


def test_ivf_probe_all_equals_exact(spark):
    """nprobe = n_cells covers every (disjoint) cell exactly once —
    the IVF join must reproduce brute-force top-k verbatim."""
    from linkgraph.operators.similarity import ivf_cosine_topk

    df, _ = _emb_df(spark)
    queries = df.filter("vec_id < 4")
    exact = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in cosine_topk(df, queries, k=7).collect()
    )
    ivf = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in ivf_cosine_topk(df, queries, k=7, n_cells=4, nprobe=4).collect()
    )
    assert ivf == exact


def test_ivf_subset_and_colinear_hit(spark):
    """nprobe=1 prunes to one cell: results are a subset of exact,
    and the colinear pair (3, 7) shares a cell by construction."""
    from linkgraph.operators.similarity import ivf_cosine_topk

    df, _ = _emb_df(spark)
    queries = df.filter("vec_id < 5")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(df, queries, k=40).collect()}
    approx = ivf_cosine_topk(df, queries, k=40, n_cells=4, nprobe=1).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in approx} <= exact
    top3 = [r for r in approx if r["query_id"] == 3]
    assert min(top3, key=lambda r: r["rank"])["neighbor_id"] == 7


def test_kmeans_centroids_vs_numpy_lloyds(spark):
    """Distributed Lloyd's == a numpy replica (same init rule: the
    n_cells lowest-id vectors; same unit renormalization) on
    well-separated clusters, and the learned cells recover them."""
    from linkgraph.operators.similarity import ivf_cell_col, kmeans_centroids

    rng = np.random.RandomState(11)
    centers = np.eye(3, 12) * 8.0
    vecs = np.vstack([
        centers[i % 3] + rng.normal(scale=0.3, size=12) for i in range(45)
    ])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(45)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # float32 storage: replicate what Spark reads
    v64 = vecs.astype(np.float32).astype(np.float64)

    got = kmeans_centroids(df, n_cells=3, n_iter=5)

    cents = v64[:3] / np.linalg.norm(v64[:3], axis=1, keepdims=True)
    for _ in range(5):
        sims = v64 @ cents.T
        assign = np.argmax(sims, axis=1)
        new = cents.copy()
        for c in range(3):
            m = assign == c
            if m.any():
                new[c] = v64[m].sum(axis=0) / m.sum()
        cents = new / np.linalg.norm(new, axis=1, keepdims=True)
    assert np.allclose(got, cents, atol=1e-9)

    from pyspark.sql import functions as F
    cells = {r["vec_id"]: r["cell"] for r in df.select(
        "vec_id", ivf_cell_col("embedding", got).alias("cell")).collect()}
    for i in range(45):
        for j in range(45):
            if i % 3 == j % 3:
                assert cells[i] == cells[j]
            else:
                assert cells[i] != cells[j]


def test_topk_recall(spark):
    from linkgraph.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 33), (2, 34)],
        "query_id long, neighbor_id long",
    )
    got = {r["query_id"]: (r["k_exact"], r["hits"], r["recall"])
           for r in topk_recall(approx, exact).collect()}
    assert got[1] == (3, 2, 2 / 3)
    assert got[2] == (2, 0, 0.0)


# --- SemDeDup (Abbas et al. 2023) --------------------------------------------

import numpy as np
import pytest

from linkgraph.operators.similarity import semantic_dedup, seeded_centroids


def _semdedup_replica(vecs, centroids, threshold):
    ids = sorted(vecs)
    cells, csims = {}, {}
    for i in ids:
        x = np.asarray(vecs[i], dtype=float)
        dots = centroids @ x
        c = int(np.argmax(dots))  # np.argmax ties → lowest index
        cells[i] = c
        csims[i] = round(float(dots[c] / np.linalg.norm(x)), 9)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j and cells[i] == cells[j]:
                a, b = np.asarray(vecs[i], float), np.asarray(vecs[j], float)
                sim = round(
                    float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
                )
                if sim >= threshold:
                    parent[find(i)] = find(j)
    clusters = {}
    for i in ids:
        clusters.setdefault(find(i), []).append(i)
    out = {}
    for mem in clusters.values():
        cl = min(mem)
        keep = min(mem, key=lambda v: (csims[v], v))
        for v in mem:
            out[v] = (cells[v], cl, csims[v], v == keep)
    return out


def test_semantic_dedup_matches_replica(spark):
    rng = np.random.RandomState(3)
    dim = 16
    base = rng.normal(size=(6, dim))
    vecs = {}
    vid = 0
    for b in base:
        # a family of near-duplicates around each base vector...
        for _ in range(3):
            vecs[vid] = (b + 0.01 * rng.normal(size=dim)).tolist()
            vid += 1
    for _ in range(8):  # ...plus isolated singletons
        vecs[vid] = rng.normal(size=dim).tolist()
        vid += 1
    cents = seeded_centroids(dim, n_cells=4, seed=7)
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r.id: (r.cell, r.cluster, r.centroid_sim, r.keep)
        for r in semantic_dedup(
            df, threshold=0.98, n_cells=4, seed=7
        ).collect()
    }
    want = _semdedup_replica(vecs, cents, 0.98)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], ("cell", i)
        assert got[i][1] == want[i][1], ("cluster", i)
        assert got[i][2] == pytest.approx(want[i][2], abs=2e-9), ("csim", i)
        assert got[i][3] == want[i][3], ("keep", i)
    # dup families collapse: exactly one keeper per cluster
    keeps = {}
    for i, (_, cl, _, k) in got.items():
        keeps.setdefault(cl, 0)
        keeps[cl] += int(k)
    assert all(v == 1 for v in keeps.values())


def test_semantic_dedup_cross_cell_pairs_never_merge(spark):
    # two identical vectors forced into different cells never pair:
    # the paper's within-cluster comparison contract
    rng = np.random.RandomState(5)
    dim = 8
    cents = seeded_centroids(dim, n_cells=2, seed=7)
    a = cents[0] * 10.0
    b = cents[1] * 10.0
    df = spark.createDataFrame(
        [(0, a.tolist()), (1, b.tolist())], "vec_id long, embedding array<double>"
    )
    rows = semantic_dedup(df, threshold=-1.0, n_cells=2, seed=7).collect()
    assert {r.cluster for r in rows} == {0, 1}
    assert all(r.keep for r in rows)


# --- product quantization (encode / train / ADC top-k) -----------------------


def _np_pq_encode(X, B):
    import numpy as np

    m, k, d = B.shape
    out = []
    for x in X.astype(np.float64):
        out.append(
            [
                int(((B[s] - x[s * d:(s + 1) * d]) ** 2).sum(axis=1).argmin())
                for s in range(m)
            ]
        )
    return out


def _pq_fixture(spark, n=40, dim=16, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    V = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return V, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_matches_numpy(spark):
    from linkgraph.operators.similarity import pq_encode, seeded_pq_codebooks

    V, df = _pq_fixture(spark)
    books = seeded_pq_codebooks(16, 4, 4, seed=11)
    want = _np_pq_encode(V, books)
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert all(got[i] == want[i] for i in range(len(V)))


def test_pq_train_matches_numpy_lloyd(spark):
    import numpy as np

    from linkgraph.operators.similarity import pq_train, seeded_pq_codebooks

    V, df = _pq_fixture(spark)
    m, k, iters = 4, 4, 3
    B = seeded_pq_codebooks(16, m, k, 11).copy()
    d = 16 // m
    X = V.astype(np.float64)
    for _ in range(iters):
        for s in range(m):
            sub = X[:, s * d:(s + 1) * d]
            a = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            for c in range(k):
                if (a == c).any():
                    B[s][c] = sub[a == c].mean(axis=0)
    got = pq_train(df, m=m, k=k, n_iter=iters, seed=11)
    assert np.allclose(B, got, atol=1e-9)


def test_pq_topk_matches_numpy_adc(spark):
    import numpy as np

    from linkgraph.operators.similarity import pq_topk, seeded_pq_codebooks

    V, df = _pq_fixture(spark)
    books = seeded_pq_codebooks(16, 4, 4, seed=11)
    codes = _np_pq_encode(V, books)
    m, kc, d = books.shape
    want = {}
    for qi in (0, 1, 2):
        x = V[qi].astype(np.float64)
        lut = [
            np.array(
                [((books[s][c] - x[s * d:(s + 1) * d]) ** 2).sum() for c in range(kc)]
            )
            for s in range(m)
        ]
        sc = sorted(
            (round(sum(lut[s][codes[ni][s]] for s in range(m)), 6), ni)
            for ni in range(len(V))
            if ni != qi
        )
        want[qi] = [(ni, r + 1) for r, (_, ni) in enumerate(sc[:5])]
    got = {}
    rows = pq_topk(df, df.filter("vec_id < 3"), k=5, codebooks=books)
    for r in sorted(rows.collect(), key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.rank))
    assert got == want


def test_pq_validation(spark):
    from linkgraph.operators.similarity import pq_topk, pq_train, seeded_pq_codebooks

    with pytest.raises(ValueError, match="divisible"):
        seeded_pq_codebooks(10, 4, 8)
    _, df = _pq_fixture(spark)
    with pytest.raises(ValueError, match="empty"):
        pq_train(df.filter("vec_id < 0"))
    with pytest.raises(ValueError, match="empty"):
        pq_topk(df.filter("vec_id < 0"), df)
