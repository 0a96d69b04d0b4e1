"""TF-IDF top terms and exact group percentiles vs pure-Python
replicas."""

from __future__ import annotations

import math

import pytest

from linkgraph.operators.terms import group_percentiles, tfidf_top_terms


def test_tfidf_matches_replica(spark):
    docs = [
        ("a", "apple banana apple cherry"),
        ("a", "apple date"),
        ("b", "banana banana fig"),
        ("c", "cherry fig grape grape grape"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = [
        (r["group"], r["term"], r["tf"], r["df_groups"], r["tfidf"], r["pos"])
        for r in tfidf_top_terms(df, "source", "text", k=3).collect()
    ]
    # replica
    from collections import Counter

    tf = Counter()
    for g, t in docs:
        for term in t.split():
            tf[(g, term)] += 1
    groups = {g for g, _ in docs}
    dfreq = Counter(term for (_, term) in tf)
    scored = [
        (g, term, c, dfreq[term],
         c * (math.log((1 + len(groups)) / (1 + dfreq[term])) + 1))
        for (g, term), c in tf.items()
    ]
    want = []
    for g in sorted(groups):
        rows = sorted(
            [s for s in scored if s[0] == g], key=lambda s: (-s[4], s[1])
        )[:3]
        want += [(g, t, c, d, s, i + 1) for i, (g2, t, c, d, s) in enumerate(rows)]
    assert len(got) == len(want)
    for gr, wr in zip(sorted(got), sorted(want)):
        assert gr[:4] == wr[:4] and gr[5] == wr[5]
        assert abs(gr[4] - wr[4]) < 1e-9


def test_tfidf_validation(spark):
    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError):
        tfidf_top_terms(df, k=0)


def test_group_percentiles_exact(spark):
    vals = [("g1", float(v)) for v in range(1, 101)] + [("g2", 5.0), ("g2", 7.0)]
    df = spark.createDataFrame(vals, "g string, v double")
    got = {r["group"]: r for r in
           group_percentiles(df, "g", "v", (0.5, 0.9)).collect()}
    # 1..100: p50 = 50.5 (interpolated), p90 = 90.1
    assert got["g1"]["n"] == 100
    assert abs(got["g1"]["p50"] - 50.5) < 1e-9
    assert abs(got["g1"]["p90"] - 90.1) < 1e-9
    assert abs(got["g2"]["p50"] - 6.0) < 1e-9


def _entropy(counts):
    n = sum(counts)
    return -sum((c / n) * math.log2(c / n) for c in counts) if n else 0.0


def test_entropy_signals_matches_replica(spark):
    import re
    from collections import Counter

    from linkgraph.operators.terms import entropy_signals

    docs = [
        (1, "the cat sat on the mat"),
        (2, "aaaa aaaa aaaa"),          # degenerate: near-zero entropies
        (3, "zq"),                      # single bigram, one token
        (4, ""),                        # empty: zeros
        (5, "one"),                     # single token: word entropy 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in entropy_signals(df).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for doc_id, text in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        bgs = [text[i : i + 2] for i in range(len(text) - 1)]
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert math.isclose(
            r["word_entropy"], _entropy(Counter(toks).values()) if toks else 0.0,
            abs_tol=1e-12,
        )
        assert math.isclose(
            r["bigram_entropy"], _entropy(Counter(bgs).values()) if bgs else 0.0,
            abs_tol=1e-12,
        )
    # orderings: varied text above degenerate above empty
    assert got[1]["word_entropy"] > got[2]["word_entropy"] >= 0.0
    assert got[4]["word_entropy"] == got[4]["bigram_entropy"] == 0.0


# --- Okapi BM25 top-k retrieval ----------------------------------------------


def test_bm25_matches_pure_python(spark):
    import re

    from linkgraph.operators.terms import bm25_scores

    DOCS = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog sleeps all day"),
        (3, "quick quick quick fox"),
        (4, "an unrelated document about spark dataflow engines"),
        (5, ""),  # tokenless: counts toward N and avgdl at length 0
    ]
    QS = [(100, "quick fox"), (101, "lazy dog"), (102, "zzz")]

    def toks(s):
        return re.findall(r"[a-z0-9]+", s.lower())

    k1, b = 1.2, 0.75
    N = len(DOCS)
    tf, dl = {}, {}
    for d, t in DOCS:
        ws = toks(t)
        dl[d] = len(ws)
        for w in ws:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    avgdl = sum(dl.values()) / N
    dfq = {}
    for (_, w) in tf:
        dfq[w] = dfq.get(w, 0) + 1
    want = {}
    for qid, qt in QS:
        sc = {}
        for w in set(toks(qt)):
            if w not in dfq:
                continue
            idf = math.log(1 + (N - dfq[w] + 0.5) / (dfq[w] + 0.5))
            for d, _ in DOCS:
                f = tf.get((d, w), 0)
                if f:
                    sc[d] = sc.get(d, 0.0) + idf * f * (k1 + 1) / (
                        f + k1 * (1 - b + b * dl[d] / avgdl)
                    )
        ranked = sorted(
            ((round(s, 6), d) for d, s in sc.items()), key=lambda x: (-x[0], x[1])
        )
        want[qid] = [(d, s, i + 1) for i, (s, d) in enumerate(ranked)]

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QS, "query_id long, text string")
    got = {}
    for r in sorted(bm25_scores(docs, qs).collect(), key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.doc_id, r.score, r.rank))
    for qid, w in want.items():
        g = got.get(qid, [])
        assert len(g) == len(w), qid
        for (wd, ws, wr), (gd, gs, gr) in zip(w, g):
            assert wd == gd and wr == gr and abs(ws - gs) < 1e-9
    assert 102 not in got  # no term overlap → no rows


def test_bm25_top_k_truncates_and_ranks_deterministically(spark):
    from linkgraph.operators.terms import bm25_scores

    # 30 identical docs → identical scores; ties break on doc id asc
    docs = spark.createDataFrame(
        [(i, "same words here") for i in range(30)], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(1, "words")], "query_id long, text string")
    rows = sorted(bm25_scores(docs, qs, top_k=7).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in rows] == list(range(7))
    assert [r.rank for r in rows] == list(range(1, 8))
    with pytest.raises(ValueError, match="top_k"):
        bm25_scores(docs, qs, top_k=0)
