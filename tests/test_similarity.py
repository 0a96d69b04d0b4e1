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
