"""Distributed tie-aware AUC and confusion metrics vs independent
pure-Python formulations (pairwise Mann-Whitney for AUC), including
tie structure, single-class NULLs and empty inputs."""

import random

import pytest

from linkgraph.operators.metrics import confusion_metrics, ranking_auc


def py_pairwise_auc(pairs):
    pos = [s for s, y in pairs if y == 1.0]
    neg = [s for s, y in pairs if y == 0.0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def test_auc_matches_pairwise_with_ties(spark):
    rng = random.Random(3)
    # coarse scores force heavy ties
    pairs = [
        (round(rng.random(), 1), float(rng.random() < 0.4)) for _ in range(500)
    ]
    df = spark.createDataFrame(pairs, "score double, y double")
    row = ranking_auc(df).collect()[0]
    want = py_pairwise_auc(pairs)
    assert row["n_pos"] == sum(1 for _, y in pairs if y == 1.0)
    assert row["n_neg"] == len(pairs) - row["n_pos"]
    assert abs(row["auc"] - want) < 1e-12


def test_auc_perfect_and_inverted(spark):
    pairs = [(float(i), 1.0 if i >= 50 else 0.0) for i in range(100)]
    df = spark.createDataFrame(pairs, "score double, y double")
    assert abs(ranking_auc(df).collect()[0]["auc"] - 1.0) < 1e-12
    inv = spark.createDataFrame(
        [(-s, y) for s, y in pairs], "score double, y double"
    )
    assert abs(ranking_auc(inv).collect()[0]["auc"] - 0.0) < 1e-12


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(0.3, 1.0), (0.9, 1.0)], "score double, y double")
    row = ranking_auc(df).collect()[0]
    assert row["auc"] is None and row["n_pos"] == 2 and row["n_neg"] == 0
    empty = ranking_auc(df.filter("score > 5")).collect()[0]
    assert empty["auc"] is None and empty["n_pos"] == 0


def test_auc_partition_invariance(spark):
    rng = random.Random(9)
    pairs = [(rng.random(), float(rng.random() < 0.5)) for _ in range(300)]
    df = spark.createDataFrame(pairs, "score double, y double")
    a = ranking_auc(df, partitions=1).collect()[0]["auc"]
    b = ranking_auc(df, partitions=7).collect()[0]["auc"]
    c = ranking_auc(df.repartition(13), partitions=3).collect()[0]["auc"]
    assert abs(a - b) < 1e-12 and abs(a - c) < 1e-12


def test_confusion_metrics(spark):
    rows = [
        (0.9, 1.0), (0.8, 1.0), (0.6, 0.0), (0.4, 1.0), (0.2, 0.0), (0.1, 0.0),
    ]
    df = spark.createDataFrame(rows, "score double, y double")
    m = confusion_metrics(df, threshold=0.5).collect()[0]
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (2, 1, 2, 1)
    assert abs(m["precision"] - 2 / 3) < 1e-12
    assert abs(m["recall"] - 2 / 3) < 1e-12
    assert abs(m["f1"] - 2 / 3) < 1e-12
    assert abs(m["accuracy"] - 4 / 6) < 1e-12
    # degenerate: nothing predicted positive -> precision NULL
    m0 = confusion_metrics(df, threshold=2.0).collect()[0]
    assert m0["precision"] is None and m0["tp"] == 0 and m0["recall"] == 0.0


# --- average precision ----------------------------------------------------


def py_average_precision(pairs):
    """Threshold-sweep AP over distinct scores descending (sklearn's
    step form): AP = sum (R_k - R_{k-1}) * P_k."""
    pos_total = sum(1 for _, y in pairs if y == 1.0)
    if pos_total == 0:
        return None
    scores = sorted({s for s, _ in pairs}, reverse=True)
    ap, prev_r, seen, seen_pos = 0.0, 0.0, 0, 0
    for t in scores:
        rows = [(s, y) for s, y in pairs if s == t]
        seen += len(rows)
        seen_pos += sum(1 for _, y in rows if y == 1.0)
        p = seen_pos / seen
        r = seen_pos / pos_total
        ap += (r - prev_r) * p
        prev_r = r
    return ap


def test_average_precision_matches_sweep(spark):
    from linkgraph.operators.metrics import average_precision

    rng = random.Random(11)
    pairs = [
        (round(rng.random(), 1), float(rng.random() < 0.3)) for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, "score double, y double")
    row = average_precision(df).collect()[0]
    want = py_average_precision(pairs)
    assert abs(row["ap"] - want) < 1e-12
    assert row["n_pos"] == sum(1 for _, y in pairs if y == 1.0)


def test_average_precision_edges(spark):
    from linkgraph.operators.metrics import average_precision

    perfect = spark.createDataFrame(
        [(float(i), 1.0 if i >= 50 else 0.0) for i in range(100)],
        "score double, y double",
    )
    assert abs(average_precision(perfect).collect()[0]["ap"] - 1.0) < 1e-12
    nopos = spark.createDataFrame([(0.5, 0.0)], "score double, y double")
    assert average_precision(nopos).collect()[0]["ap"] is None
    # partition invariance
    rng = random.Random(2)
    pairs = [(rng.random(), float(rng.random() < 0.5)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "score double, y double")
    a = average_precision(df, partitions=1).collect()[0]["ap"]
    b = average_precision(df.repartition(9), partitions=5).collect()[0]["ap"]
    assert abs(a - b) < 1e-12


def test_null_scores_dropped_not_ranked(spark):
    """NULL-score rows are excluded from both metrics (not silently
    ranked as a tied group); counts reflect only scored rows."""
    from linkgraph.operators.metrics import average_precision

    pairs = [(0.9, 1.0), (0.7, 0.0), (0.4, 1.0), (0.1, 0.0)]
    clean = spark.createDataFrame(pairs, "score double, y double")
    dirty = clean.unionAll(
        spark.createDataFrame(
            [(None, 1.0), (None, 0.0), (None, 1.0)], "score double, y double"
        )
    )
    for fn in (ranking_auc, average_precision):
        a = fn(clean).collect()[0]
        b = fn(dirty).collect()[0]
        assert a["n_pos"] == b["n_pos"] == 2
        assert a["n_neg"] == b["n_neg"] == 2
        key = "auc" if fn is ranking_auc else "ap"
        assert abs(a[key] - b[key]) < 1e-12
    # all-NULL scores → empty ranked set → NULL metric, zero counts
    allnull = dirty.filter("score IS NULL")
    row = ranking_auc(allnull).collect()[0]
    assert row["auc"] is None and row["n_pos"] == 0 and row["n_neg"] == 0
