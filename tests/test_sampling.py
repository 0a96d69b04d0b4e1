"""Deterministic sampling / splitting: stability across partitioning,
rate accuracy, nesting, split totality, and cross-engine (DuckDB)
agreement of the hash bucket."""

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import graph_from_edges
from linkgraph.operators.sampling import DENOM, _bucket, hash_split, stratified_sample


@pytest.fixture(scope="module")
def corpus(spark):
    # full-range 64-bit ids via xxhash64, three strata
    return (
        spark.range(6000)
        .select(
            F.xxhash64(F.col("id")).alias("doc_id"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("lang"),
        )
        .cache()
    )


def test_sample_deterministic_across_partitioning(corpus):
    rates = {"en": 0.5, "de": 0.2, "fr": 1.0}
    a = stratified_sample(corpus, "doc_id", "lang", rates, seed=7)
    b = stratified_sample(corpus.repartition(17, "lang"), "doc_id", "lang", rates, seed=7)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_sample_rates_and_default(corpus):
    got = (
        stratified_sample(corpus, "doc_id", "lang", {"en": 0.5, "de": 0.2}, seed=1)
        .groupBy("lang")
        .count()
        .collect()
    )
    by_lang = {r["lang"]: r["count"] for r in got}
    # 2000 docs per stratum; binomial sd ~22 at p=0.5 — allow 5 sd
    assert abs(by_lang["en"] - 1000) < 110
    assert abs(by_lang["de"] - 400) < 90
    assert "fr" not in by_lang  # default_rate=0 drops unlisted strata


def test_samples_nest_with_same_seed(corpus):
    small = stratified_sample(corpus, "doc_id", "lang", {"en": 0.1}, seed=3)
    big = stratified_sample(corpus, "doc_id", "lang", {"en": 0.4}, seed=3)
    assert small.exceptAll(big).count() == 0
    assert small.count() < big.count()


def test_different_seeds_differ(corpus):
    a = stratified_sample(corpus, "doc_id", "lang", {"en": 0.5}, seed=1)
    b = stratified_sample(corpus, "doc_id", "lang", {"en": 0.5}, seed=2)
    assert a.exceptAll(b).count() > 0


def test_sample_rate_validation(corpus):
    with pytest.raises(ValueError):
        stratified_sample(corpus, "doc_id", "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(corpus, "doc_id", "lang", {}, default_rate=-0.1)


def test_split_total_disjoint_deterministic(corpus):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s = hash_split(corpus, "doc_id", w, seed=5)
    counts = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert sum(counts.values()) == corpus.count()  # total + disjoint (1 row each)
    assert abs(counts["train"] - 4800) < 150
    s2 = hash_split(corpus.repartition(13), "doc_id", w, seed=5)
    assert s.exceptAll(s2).count() == 0


def test_split_weight_validation(corpus):
    with pytest.raises(ValueError):
        hash_split(corpus, "doc_id", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError):
        hash_split(corpus, "doc_id", {})


def test_bucket_matches_duckdb(corpus, spark):
    """The Spark hash bucket must equal the ANSI-SQL oracle bucket
    row-for-row (the cross-engine contract the oracles rely on)."""
    rows = (
        corpus.limit(50)
        .select("doc_id", _bucket(F.col("doc_id"), 9).alias("bucket"))
        .collect()
    )
    con = duckdb.connect()
    for r in rows:
        (b,) = con.sql(
            f"SELECT CAST(('0x' || substr(md5('{r['doc_id']}:9'), 1, 15)) AS BIGINT) % {DENOM}"
        ).fetchone()
        assert b == r["bucket"], r["doc_id"]


def test_negative_edges_properties(spark):
    from linkgraph.operators.sampling import negative_edges

    edges = [(i, (i + 1) % 20) for i in range(20)] + [(0, 5), (3, 11)]
    g = graph_from_edges(spark, edges, directed=True)
    rows = negative_edges(g, per_node=4, seed=13).collect()
    real = set(edges)
    per_src = {}
    for r in rows:
        assert (r["src"], r["dst"]) not in real
        assert r["src"] != r["dst"]
        per_src.setdefault(r["src"], []).append(r["rank"])
    for src, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4
    # every vertex has plenty of non-neighbors here -> full quota
    assert all(len(v) == 4 for v in per_src.values())
    assert set(per_src) == {x for e in edges for x in e}
    # deterministic: identical on a second run
    again = negative_edges(g, per_node=4, seed=13).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_negative_edges_undirected_excludes_both_orientations(spark):
    from linkgraph.operators.sampling import negative_edges

    edges = [(1, 2), (2, 3), (3, 4)]
    g = graph_from_edges(spark, edges, directed=False)
    rows = negative_edges(g, per_node=10, trials_factor=10, seed=3).collect()
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    assert rows, "sparse graph must yield negatives"
    for r in rows:
        assert (r["src"], r["dst"]) not in sym


def test_negative_edges_complete_graph_empty(spark):
    from linkgraph.operators.sampling import negative_edges

    n = 6
    edges = [(a, b) for a in range(n) for b in range(n) if a != b]
    g = graph_from_edges(spark, edges, directed=True)
    assert negative_edges(g, per_node=3, seed=5).count() == 0


def test_weighted_sample_inclusion_tracks_weight(spark):
    from linkgraph.operators.sampling import weighted_sample

    # two weight classes: heavy rows 100x the weight of light rows
    rows = [(i, 1000.0 if i % 2 == 0 else 10.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "doc_id", "w", k=100, seed=3).collect()
    heavy = sum(1 for r in got if r.doc_id % 2 == 0)
    assert len(got) == 100
    # heavy rows should dominate the sample (p ratio 100:1)
    assert heavy >= 85
    # deterministic: identical survivor set on re-run
    again = weighted_sample(df, "doc_id", "w", k=100, seed=3).collect()
    assert {r.doc_id for r in got} == {r.doc_id for r in again}
    # different seed → different (but same-sized) selection
    other = weighted_sample(df, "doc_id", "w", k=100, seed=4).collect()
    assert {r.doc_id for r in got} != {r.doc_id for r in other}


def test_weighted_sample_zero_weights_lose(spark):
    from linkgraph.operators.sampling import weighted_sample

    rows = [(i, 0.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "doc_id", "w", k=50, seed=0).collect()
    assert all(r.doc_id >= 50 for r in got)


# --- DSIR importance resampling (Xie et al. 2023) -----------------------------

import hashlib
import math
import re

import pytest

from linkgraph.operators.sampling import dsir_select, dsir_weights


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text, n_buckets):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for g in grams:
        h = _h(g) % n_buckets
        out[h] = out.get(h, 0) + 1
    return out


def _dsir_replica(raw, target, n_buckets, add_k):
    t_lm, r_lm = {}, {}
    for _, txt in target:
        for h, c in _feats(txt, n_buckets).items():
            t_lm[h] = t_lm.get(h, 0) + c
    for _, txt in raw:
        for h, c in _feats(txt, n_buckets).items():
            r_lm[h] = r_lm.get(h, 0) + c
    tt, rt = sum(t_lm.values()), sum(r_lm.values())
    out = {}
    for did, txt in raw:
        f = _feats(txt, n_buckets)
        lw = sum(
            c
            * (
                math.log((t_lm.get(h, 0) + add_k) / (tt + add_k * n_buckets))
                - math.log((r_lm.get(h, 0) + add_k) / (rt + add_k * n_buckets))
            )
            for h, c in f.items()
        )
        out[did] = (sum(f.values()), round(lw, 9))
    return out


RAW_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "stock prices rallied as markets opened higher today"),
    (3, "the dog chased the cat around the garden"),
    (4, "buy cheap pills online casino bonus click here now"),
    (5, "a recipe for bread uses flour water salt and yeast"),
    (6, "markets fell after the bank raised rates again"),
]
TARGET_DOCS = [
    (101, "markets rallied as investors cheered the bank decision"),
    (102, "stock prices and interest rates moved higher today"),
    (103, "the bank raised rates and markets reacted"),
]


def test_dsir_weights_match_replica(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_feats, r.logw)
        for r in dsir_weights(raw, tgt, n_buckets=512, add_k=0.5).collect()
    }
    want = _dsir_replica(RAW_DOCS, TARGET_DOCS, 512, 0.5)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-9)
    # in-domain docs outscore the spam doc
    assert got[2][1] > got[4][1] and got[6][1] > got[4][1]


def test_dsir_select_gumbel_topk_deterministic(spark):
    raw = spark.createDataFrame(RAW_DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET_DOCS, "doc_id long, text string")
    a = [(r.doc_id, r.rank) for r in dsir_select(raw, tgt, k=3, seed=7, n_buckets=512).collect()]
    b = [(r.doc_id, r.rank) for r in dsir_select(raw, tgt, k=3, seed=7, n_buckets=512).collect()]
    assert sorted(a) == sorted(b) and len(a) == 3
    # replica of the gumbel key on the replica weights
    want = _dsir_replica(RAW_DOCS, TARGET_DOCS, 512, 0.5)
    m = 9007199254740992
    keys = {}
    for did, (_, lw) in want.items():
        u = (_h(f"{did}:7") % m + 0.5) / m
        keys[did] = round(lw - math.log(-math.log(u)), 6)
    expect = sorted(keys, key=lambda d: (-keys[d], d))[:3]
    assert sorted(d for d, _ in a) == sorted(expect)
    # different seed may pick a different set, same cardinality
    c = dsir_select(raw, tgt, k=3, seed=8, n_buckets=512).collect()
    assert len(c) == 3
