"""Logistic-regression quality classifier vs a pure-Python full-batch
GD replay (exact hashing, exact step arithmetic), plus behavioral
checks: a separable two-vocabulary corpus is separated, featureless
documents score sigma(bias), and validation is loud."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from linkgraph.operators.classifier import (
    INTERCEPT,
    hashed_text_features,
    logreg_score,
    logreg_train,
)

DOCS = [
    (1, "good clean prose with words and meaning", 1.0),
    (2, "more good clean text with meaning and words", 1.0),
    (3, "fine prose meaning words clean", 1.0),
    (4, "zx qq vv zx kk pp qq", 0.0),
    (5, "kk pp zx vv qq zx", 0.0),
    (6, "vv kk qq pp zx", 0.0),
    (7, "", 0.0),  # featureless: counts toward N, absent from grads
]
N_BUCKETS = 64


def _toks(s):
    return re.findall(r"[a-z0-9]+", s.lower())


def _feats(text):
    ws = _toks(text)
    grams = ws + [a + " " + b for a, b in zip(ws, ws[1:])]
    out = {}
    for g in grams:
        h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % N_BUCKETS
        out[h] = out.get(h, 0) + 1
    n = sum(out.values())
    return {h: c / n for h, c in out.items()}


def _py_train(docs, iters, lr, l2):
    rows = [(_feats(t), y) for _, t, y in docs]
    for f, _ in rows:
        f[INTERCEPT] = 1.0  # every labeled doc gets the bias feature
    keys = sorted({h for f, _ in rows for h in f})
    w = {h: 0.0 for h in keys}
    n = len(rows)
    for _ in range(iters):
        grad = {h: 0.0 for h in keys}
        for f, y in rows:
            m = sum(x * w[h] for h, x in f.items())
            r = 1.0 / (1.0 + math.exp(-m)) - y
            for h, x in f.items():
                grad[h] += x * r
        w = {h: w[h] - lr * (grad[h] / n + l2 * w[h]) for h in keys}
    return w


def _spark_train(spark, iters=3, lr=0.5, l2=0.01):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, t, y in DOCS], "doc_id long, y double"
    )
    feats = hashed_text_features(docs, n_buckets=N_BUCKETS)
    return docs, feats, logreg_train(feats, labels, iters=iters, lr=lr, l2=l2)


def test_logreg_train_matches_pure_python(spark):
    want = _py_train(DOCS, iters=3, lr=0.5, l2=0.01)
    _, _, w = _spark_train(spark, iters=3, lr=0.5, l2=0.01)
    got = {r.h: r.weight for r in w.collect()}
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, h


def test_logreg_separates_separable_corpus(spark):
    docs, feats, w = _spark_train(spark, iters=40, lr=2.0, l2=0.0)
    scores = {
        r.doc_id: r.score for r in logreg_score(feats, w, docs=docs).collect()
    }
    pos = [scores[i] for i, _, y in DOCS if y == 1.0]
    neg = [scores[i] for i, t, y in DOCS if y == 0.0 and t]
    assert min(pos) > max(neg)
    assert min(pos) > 0.6 and max(neg) < 0.4


def test_featureless_doc_scores_sigmoid_bias(spark):
    docs, feats, w = _spark_train(spark, iters=3, lr=0.5, l2=0.01)
    bias = {r.h: r.weight for r in w.collect()}[INTERCEPT]
    scores = {
        r.doc_id: r.score for r in logreg_score(feats, w, docs=docs).collect()
    }
    assert abs(scores[7] - 1.0 / (1.0 + math.exp(-bias))) < 1e-12


def test_logreg_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    labels = spark.createDataFrame([(1, 1.0)], "doc_id long, y double")
    feats = hashed_text_features(docs, n_buckets=8)
    with pytest.raises(ValueError, match="iters"):
        logreg_train(feats, labels, iters=0)
    with pytest.raises(ValueError, match="lr"):
        logreg_train(feats, labels, lr=0.0)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(feats, labels.filter("y > 5"))


# --- multi-class softmax (fastText-style lang-id shape) -------------------

MC_DOCS = [
    (1, "the quick brown fox jumps over things", "en"),
    (2, "a lazy dog sleeps in the quick sun", "en"),
    (3, "le renard brun saute par dessus le chien", "fr"),
    (4, "un chien paresseux dort sous le soleil", "fr"),
    (5, "der schnelle fuchs springt ueber den hund", "de"),
    (6, "ein fauler hund schlaeft unter der sonne", "de"),
    (7, "", "en"),  # featureless: bias-only logits
]


def _py_softmax_train(docs, iters, lr, l2):
    rows = [(_feats(t), y) for _, t, y in docs]
    for f, _ in rows:
        f[INTERCEPT] = 1.0
    classes = sorted({y for _, y in rows})
    keys = sorted({h for f, _ in rows for h in f})
    w = {(h, c): 0.0 for h in keys for c in classes}
    n = len(rows)
    for _ in range(iters):
        grad = {k: 0.0 for k in w}
        for f, y in rows:
            logits = {
                c: sum(x * w[(h, c)] for h, x in f.items()) for c in classes
            }
            mx = max(logits.values())
            es = {c: math.exp(m - mx) for c, m in logits.items()}
            z = sum(es.values())
            for c in classes:
                r = es[c] / z - (1.0 if c == y else 0.0)
                for h, x in f.items():
                    grad[(h, c)] += x * r
        w = {k: w[k] - lr * (grad[k] / n + l2 * w[k]) for k in w}
    return w


def _spark_softmax(spark, iters=3, lr=0.5, l2=0.01):
    from linkgraph.operators.classifier import softmax_train

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in MC_DOCS], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in MC_DOCS], "doc_id long, y string"
    )
    feats = hashed_text_features(docs, n_buckets=N_BUCKETS)
    return docs, feats, softmax_train(feats, labels, iters=iters, lr=lr, l2=l2)


def test_softmax_train_matches_pure_python(spark):
    want = _py_softmax_train(MC_DOCS, iters=3, lr=0.5, l2=0.01)
    _, _, w = _spark_softmax(spark, iters=3, lr=0.5, l2=0.01)
    got = {(r.h, r.cls): r.weight for r in w.collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_softmax_separates_languages(spark):
    from linkgraph.operators.classifier import softmax_predict

    docs, feats, w = _spark_softmax(spark, iters=40, lr=2.0, l2=0.0)
    preds = {
        r.id: r.pred for r in softmax_predict(feats, w, docs=docs).collect()
    }
    for i, t, y in MC_DOCS:
        if t:
            assert preds[i] == y, (i, preds[i], y)


def test_softmax_probs_sum_to_one_and_bias_only(spark):
    from linkgraph.operators.classifier import softmax_score

    docs, feats, w = _spark_softmax(spark, iters=3, lr=0.5, l2=0.01)
    rows = softmax_score(feats, w, docs=docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, {})[r.cls] = r.prob
    for i, ps in by_doc.items():
        assert abs(sum(ps.values()) - 1.0) < 1e-9, i
        assert len(ps) == 3
    # featureless doc 7: softmax of the three bias weights alone
    bias = {r.cls: r.weight for r in w.filter(f"h = {INTERCEPT}").collect()}
    mx = max(bias.values())
    es = {c: math.exp(v - mx) for c, v in bias.items()}
    z = sum(es.values())
    for c in es:
        assert abs(by_doc[7][c] - es[c] / z) < 1e-9


def test_softmax_checkpoint_resume(spark, tmp_path):
    from linkgraph.operators.classifier import softmax_train

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in MC_DOCS], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in MC_DOCS], "doc_id long, y string"
    )
    feats = hashed_text_features(docs, n_buckets=N_BUCKETS)
    full = {
        (r.h, r.cls): r.weight
        for r in softmax_train(feats, labels, iters=4, lr=0.5).collect()
    }
    ck = str(tmp_path / "sm_ck")
    softmax_train(feats, labels, iters=2, lr=0.5, checkpoint_dir=ck,
                  checkpoint_every=1)
    resumed = {
        (r.h, r.cls): r.weight
        for r in softmax_train(
            feats, labels, iters=4, lr=0.5, checkpoint_dir=ck,
            checkpoint_every=1
        ).collect()
    }
    for k in full:
        assert abs(full[k] - resumed[k]) < 1e-12, k
    with pytest.raises(ValueError, match="past the requested"):
        softmax_train(feats, labels, iters=1, lr=0.5, checkpoint_dir=ck)
