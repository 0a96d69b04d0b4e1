"""Checkpoint-resume for the multi-frame peeling operators (SCC /
MST / core_numbers): kill after peel k (budget exhaustion raises
ConvergenceError mid-run with per-peel commits on disk), restart, and
assert the resumed result is identical to an uninterrupted run —
the north rule's resumability contract for driver-loop operators."""

import json
import os

import pytest

from conftest import graph_from_edges
from linkgraph.operators.components import strongly_connected_components
from linkgraph.operators.kcore import core_numbers
from linkgraph.operators.mst import minimum_spanning_forest
from linkgraph.plans.iterate import ConvergenceError


def _latest_meta(d):
    metas = sorted(f for f in os.listdir(d) if f.endswith(".meta.json"))
    assert metas, "no peel checkpoint was committed before the kill"
    with open(os.path.join(d, metas[-1])) as f:
        return json.load(f)


def test_scc_resume_after_kill(spark, tmp_path):
    # two SCCs in a chain: {1,2,3} then {4,5} — exactly 2 peels
    g = graph_from_edges(
        spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4)]
    )
    want = {
        (r["id"], r["component"])
        for r in strongly_connected_components(g).collect()
    }
    d = str(tmp_path / "scc")
    with pytest.raises(ConvergenceError):
        strongly_connected_components(
            g, max_peels=1, checkpoint_dir=d, checkpoint_every=1
        )
    assert _latest_meta(d)["round"] == 0  # peel 0 durably committed
    got = {
        (r["id"], r["component"])
        for r in strongly_connected_components(
            g, checkpoint_dir=d, checkpoint_every=1
        ).collect()
    }
    assert got == want
    # the resumed run continued from peel 1, not from scratch
    assert _latest_meta(d)["round"] >= 1


def test_mst_resume_after_kill(spark, tmp_path):
    # alternating light/heavy path: Borůvka needs 2 rounds (light
    # edges pair up components, heavy edges then bridge the pairs)
    edges = [
        (1, 2, 1.0), (2, 3, 10.0), (3, 4, 1.5),
        (4, 5, 11.0), (5, 6, 2.0), (6, 7, 12.0), (7, 8, 2.5),
    ]
    g = graph_from_edges(spark, edges, directed=False)
    want = {
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g).collect()
    }
    d = str(tmp_path / "mst")
    with pytest.raises(ConvergenceError):
        minimum_spanning_forest(g, max_rounds=1, checkpoint_dir=d, checkpoint_every=1)
    assert _latest_meta(d)["round"] == 0
    got = {
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g, checkpoint_dir=d).collect()
    }
    assert got == want


def test_core_numbers_resume_after_kill(spark, tmp_path):
    # triangle + tail: peel 1 assigns the tail at k=1, peel 2 the
    # triangle at k=2
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)], directed=False)
    want = {(r["id"], r["core"]) for r in core_numbers(g).collect()}
    assert want == {(1, 2), (2, 2), (3, 2), (4, 1)}
    d = str(tmp_path / "cores")
    with pytest.raises(ConvergenceError):
        core_numbers(g, max_rounds=1, checkpoint_dir=d, checkpoint_every=1)
    meta = _latest_meta(d)
    assert meta["round"] == 1 and meta["extra"]["k"] == 1
    got = {
        (r["id"], r["core"])
        for r in core_numbers(g, checkpoint_dir=d).collect()
    }
    assert got == want


def test_peel_checkpoint_gc_keeps_latest_only(spark, tmp_path):
    """Older committed peels are deleted once a newer meta is durable
    — bounded disk for long decompositions."""
    g = graph_from_edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)], directed=False)
    d = str(tmp_path / "gc")
    core_numbers(g, checkpoint_dir=d, checkpoint_every=1, resume=False)
    metas = [f for f in os.listdir(d) if f.endswith(".meta.json")]
    assert len(metas) == 1  # only the newest round's commit survives


def test_anf_resume_extends_horizon(spark, tmp_path):
    from linkgraph.operators.anf import neighborhood_function

    g = graph_from_edges(spark, [(i, i + 1) for i in range(1, 7)])
    want = sorted(
        tuple(r)
        for r in neighborhood_function(g, max_h=5, n_sketches=4).stats.collect()
    )
    d = str(tmp_path / "anf")
    neighborhood_function(
        g, max_h=2, n_sketches=4, checkpoint_dir=d, checkpoint_every=1
    )
    assert _latest_meta(d)["round"] == 2
    got = sorted(
        tuple(r)
        for r in neighborhood_function(
            g, max_h=5, n_sketches=4, checkpoint_dir=d, checkpoint_every=1
        ).stats.collect()
    )
    assert got == want
    assert _latest_meta(d)["round"] >= 3  # continued, not restarted


def test_temporal_resume_after_kill(spark, tmp_path):
    from linkgraph.operators.temporal import earliest_arrival

    edges = [(i, i + 1, i) for i in range(1, 8)]
    e = spark.createDataFrame(edges, "src long, dst long, ts long")
    src = spark.createDataFrame([(1,)], "id long")
    want = {(r.id, r.arrival) for r in earliest_arrival(e, src).collect()}
    d = str(tmp_path / "temporal")
    with pytest.raises(ConvergenceError):
        earliest_arrival(
            e, src, max_rounds=2, checkpoint_dir=d, checkpoint_every=1
        )
    assert _latest_meta(d)["round"] == 1
    got = {
        (r.id, r.arrival)
        for r in earliest_arrival(
            e, src, checkpoint_dir=d, checkpoint_every=1
        ).collect()
    }
    assert got == want
    assert _latest_meta(d)["round"] >= 2


def test_louvain_resume_preserves_parity(spark, tmp_path):
    from linkgraph.operators.louvain import louvain_local_moves

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 10)]
    g = graph_from_edges(spark, edges, directed=False)
    want = {
        (r.id, r.community) for r in louvain_local_moves(g, rounds=4).collect()
    }
    d = str(tmp_path / "louvain")
    louvain_local_moves(g, rounds=2, checkpoint_dir=d, checkpoint_every=1)
    assert _latest_meta(d)["round"] == 2
    got = {
        (r.id, r.community)
        for r in louvain_local_moves(
            g, rounds=4, checkpoint_dir=d, checkpoint_every=1
        ).collect()
    }
    assert got == want
    assert _latest_meta(d)["round"] == 4


def test_opic_resume_after_kill(spark, tmp_path):
    from linkgraph.operators.crawl import opic

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (4, 5), (2, 5)]
    g = graph_from_edges(spark, edges)
    want = sorted(tuple(r) for r in opic(g, rounds=6).collect())
    d = str(tmp_path / "opic")
    # "killed" run: commits every round, stops after round 3
    opic(g, rounds=3, checkpoint_dir=d, checkpoint_every=1)
    assert _latest_meta(d)["round"] == 3
    got = sorted(
        tuple(r)
        for r in opic(g, rounds=6, checkpoint_dir=d, checkpoint_every=1).collect()
    )
    assert got == want
    assert _latest_meta(d)["round"] == 6  # continued, not restarted


def test_hyperball_resume_extends_horizon(spark, tmp_path):
    from linkgraph.operators.anf import hyperball_centralities

    g = graph_from_edges(spark, [(i, i + 1) for i in range(1, 8)])
    want = sorted(
        tuple(r)
        for r in hyperball_centralities(g, max_h=5, n_sketches=4).collect()
    )
    d = str(tmp_path / "hb")
    hyperball_centralities(
        g, max_h=2, n_sketches=4, checkpoint_dir=d, checkpoint_every=1
    ).collect()
    assert _latest_meta(d)["round"] == 2
    got = sorted(
        tuple(r)
        for r in hyperball_centralities(
            g, max_h=5, n_sketches=4, checkpoint_dir=d, checkpoint_every=1
        ).collect()
    )
    assert got == want
    assert _latest_meta(d)["round"] >= 3  # continued, not restarted


def test_logreg_resume_after_kill(spark, tmp_path):
    # 1 committed GD step, then resume to 3 — equals the
    # uninterrupted 3-step model exactly; a checkpoint trained PAST
    # the requested iters refuses loudly
    from linkgraph.operators.classifier import hashed_text_features, logreg_train

    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "bb cc dd"), (3, "zz yy xx"), (4, "xx zz yy")],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 0.0), (4, 0.0)], "doc_id long, y double"
    )
    feats = hashed_text_features(docs, n_buckets=32)
    want = {
        r.h: r.weight
        for r in logreg_train(feats, labels, iters=3, lr=0.5, l2=0.01).collect()
    }
    d = str(tmp_path / "lr")
    logreg_train(
        feats, labels, iters=1, lr=0.5, l2=0.01,
        checkpoint_dir=d, checkpoint_every=1,
    )
    assert _latest_meta(d)["extra"]["it"] == 1
    got = {
        r.h: r.weight
        for r in logreg_train(
            feats, labels, iters=3, lr=0.5, l2=0.01,
            checkpoint_dir=d, checkpoint_every=1,
        ).collect()
    }
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, h
    assert _latest_meta(d)["extra"]["it"] == 3
    with pytest.raises(ValueError, match="past the requested"):
        logreg_train(feats, labels, iters=2, checkpoint_dir=d)


def test_fraudar_resume_after_kill(spark, tmp_path):
    # the peel needs 4 rounds on this input; kill after round 1's
    # durable commit, resume, and match the uninterrupted snapshot
    import random

    from linkgraph.operators.densest import suspicious_block

    rng = random.Random(3)
    es = set()
    while len(es) < 80:
        es.add((rng.randrange(30), 1000 + rng.randrange(20)))
    for s in range(6):
        for d2 in range(6):
            es.add((100 + s, 2000 + d2))
    g = graph_from_edges(spark, sorted(es), directed=True)
    want_rows = suspicious_block(g, epsilon=0.1).collect()
    want = {(r.side, r.id) for r in want_rows}
    d = str(tmp_path / "fraudar")
    with pytest.raises(ConvergenceError):
        suspicious_block(
            g, epsilon=0.1, max_rounds=1, checkpoint_dir=d, checkpoint_every=1
        )
    assert _latest_meta(d)["extra"]["round"] == 1
    rows = suspicious_block(
        g, epsilon=0.1, checkpoint_dir=d, checkpoint_every=1
    ).collect()
    assert {(r.side, r.id) for r in rows} == want
    assert abs(rows[0].suspiciousness - want_rows[0].suspiciousness) < 1e-12
