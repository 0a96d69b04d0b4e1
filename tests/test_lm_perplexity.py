"""Bigram-LM perplexity (CCNet-style quality score) vs a pure-Python
replica, plus ordering sanity (fluent text scores lower than
gibberish under an English-ish LM) and short-doc NULL semantics."""

import math
import re

import pytest
from pyspark.sql import functions as F

from linkgraph.operators.terms import lm_perplexity

TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat and the dog ran"),
    (4, "a cat ran on the mat"),
]
DOCS = [
    (10, "the cat sat on the mat"),     # in-domain: low perplexity
    (11, "the dog ran on the log"),
    (12, "zqx jvw kpl zqx vbn"),        # gibberish: high perplexity
    (13, "cat"),                        # < 2 tokens: NULLs
    (14, ""),                           # no tokens: NULLs
]


def _toks(s):
    return re.findall(r"[a-z0-9]+", s.lower())


def _py_perplexity(docs, train, k):
    uni, bi = {}, {}
    for _, t in train:
        ws = _toks(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for did, t in docs:
        ws = _toks(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out[did] = (None, None, None)
            continue
        lps = [
            math.log((bi.get(p, 0) + k) / (uni.get(p[0], 0) + k * v))
            for p in pairs
        ]
        avg = sum(lps) / len(lps)
        out[did] = (len(pairs), avg, math.exp(-avg))
    return out


def test_lm_perplexity_matches_pure_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["perplexity"])
        for r in lm_perplexity(docs, train, add_k=0.5).collect()
    }
    want = _py_perplexity(DOCS, TRAIN, 0.5)
    assert set(got) == set(want)
    for did, (n, avg, ppl) in want.items():
        gn, gavg, gppl = got[did]
        assert gn == n
        if avg is None:
            assert gavg is None and gppl is None
        else:
            assert gavg == pytest.approx(avg, rel=1e-12)
            assert gppl == pytest.approx(ppl, rel=1e-12)


def test_lm_perplexity_orders_fluent_below_gibberish(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    got = {
        r["doc_id"]: r["perplexity"]
        for r in lm_perplexity(docs, train).collect()
    }
    assert got[10] < got[12] and got[11] < got[12]


def test_lm_perplexity_validation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_perplexity(docs, docs, add_k=0.0)


# --- interpolated Kneser-Ney trigram ----------------------------------------

from linkgraph.operators.terms import kn_trigram_perplexity


def _py_kn(docs, train, D, k):
    c3, uni = {}, set()
    for _, t in train:
        ws = _toks(t)
        uni.update(ws)
        for g in zip(ws, ws[1:], ws[2:]):
            c3[g] = c3.get(g, 0) + 1
    h2, a3, t2 = {}, {}, {}
    for (w1, w2, w3), c in c3.items():
        h2[(w1, w2)] = h2.get((w1, w2), 0) + c
        a3[(w1, w2)] = a3.get((w1, w2), 0) + 1
        t2[(w2, w3)] = t2.get((w2, w3), 0) + 1
    n2, n3, t1 = {}, {}, {}
    for (w2, w3), c in t2.items():
        n2[w2] = n2.get(w2, 0) + c
        n3[w2] = n3.get(w2, 0) + 1
        t1[w3] = t1.get(w3, 0) + 1
    tt, v = len(t2), len(uni)

    def p3(w1, w2, w3):
        p = (t1.get(w3, 0) + k) / (tt + k * (v + 1))
        if n2.get(w2, 0) > 0:
            p = (max(t2.get((w2, w3), 0) - D, 0) + D * n3[w2] * p) / n2[w2]
        if h2.get((w1, w2), 0) > 0:
            p = (max(c3.get((w1, w2, w3), 0) - D, 0) + D * a3[(w1, w2)] * p) / h2[
                (w1, w2)
            ]
        return p

    out = {}
    for did, t in docs:
        ws = _toks(t)
        tris = list(zip(ws, ws[1:], ws[2:]))
        if not tris:
            out[did] = (None, None, None)
            continue
        lps = [math.log(p3(*g)) for g in tris]
        avg = sum(lps) / len(lps)
        out[did] = (len(tris), avg, math.exp(-avg))
    return out, (p3, uni)


def test_kn_trigram_matches_pure_python(spark):
    want, _ = _py_kn(DOCS, TRAIN, 0.75, 0.5)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logprob, r.perplexity)
        for r in kn_trigram_perplexity(docs, train).collect()
    }
    assert set(got) == set(want)
    for did, (n, avg, ppl) in want.items():
        gn, gavg, gppl = got[did]
        assert gn == n
        if avg is None:
            assert gavg is None and gppl is None
        else:
            assert abs(gavg - avg) < 1e-9 and abs(gppl - ppl) < 1e-6


def test_kn_levels_are_proper_distributions():
    # every level sums to exactly 1 over vocab + one unseen slot —
    # the property that makes perplexities comparable across docs
    _, (p3, uni) = _py_kn(DOCS, TRAIN, 0.75, 0.5)
    vocab = sorted(uni) + ["UNSEEN-SLOT"]
    for w1, w2 in (("the", "cat"), ("cat", "sat"), ("zq", "zq"), ("on", "zq")):
        total = sum(p3(w1, w2, w3) for w3 in vocab)
        assert abs(total - 1.0) < 1e-9, (w1, w2, total)


def test_kn_orders_fluent_below_gibberish(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ppl = {
        r.doc_id: r.perplexity
        for r in kn_trigram_perplexity(docs, train).collect()
        if r.perplexity is not None
    }
    assert ppl[10] < ppl[12]


def test_kn_validation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="discount"):
        kn_trigram_perplexity(docs, docs, discount=1.0)
    with pytest.raises(ValueError, match="add_k"):
        kn_trigram_perplexity(docs, docs, add_k=0.0)
