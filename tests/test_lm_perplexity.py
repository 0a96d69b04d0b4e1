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
