"""Iteration driver: truncation, checkpoint commit, resume parity
(SURVEY.md §5.2 item 5: kill after iteration k, restart, identical
final state)."""

import numpy as np
import pyspark.sql.functions as F

from conftest import collect_map
from linkgraph.operators.pagerank import pagerank
import pytest

from linkgraph.plans.iterate import (
    ConvergenceError,
    commit_checkpoint,
    iterate,
    latest_checkpoint,
)


def _counting_step(state, i):
    new = state.withColumn("v", F.col("v") + 1)
    maxv = 10
    delta = float(new.agg(F.max("v")).collect()[0][0] < maxv)
    return new, delta


def test_iterate_runs_to_convergence(spark):
    init = spark.createDataFrame([(1, 0)], "id long, v int")
    res = iterate(init, _counting_step, tol=0.0, max_iter=50)
    assert res.state.collect()[0]["v"] == 10
    assert res.iterations == 10


def test_iterate_max_iter_cap(spark):
    init = spark.createDataFrame([(1, 0)], "id long, v int")
    res = iterate(init, _counting_step, tol=0.0, max_iter=3)
    assert res.state.collect()[0]["v"] == 3


def test_checkpoint_commit_and_latest(spark, tmp_path):
    d = str(tmp_path / "ck")
    df = spark.createDataFrame([(1, 5)], "id long, v int")
    commit_checkpoint(df, d, 4, 0.5)
    meta = latest_checkpoint(d)
    assert meta["iteration"] == 4 and meta["delta"] == 0.5 and meta["rows"] == 1


def test_resume_mid_run(spark, tmp_path):
    d = str(tmp_path / "ck2")
    init = spark.createDataFrame([(1, 0)], "id long, v int")
    # "crash" after 4 iterations (checkpoint every 2 → last commit at i=3)
    iterate(init, _counting_step, tol=0.0, max_iter=4,
            checkpoint_dir=d, checkpoint_every=2, resume=False)
    assert latest_checkpoint(d)["iteration"] == 3
    # restart: resumes from i=4, runs to convergence
    res = iterate(init, _counting_step, tol=0.0, max_iter=50,
                  checkpoint_dir=d, checkpoint_every=2)
    assert res.state.collect()[0]["v"] == 10
    assert res.stats[0].resumed


def test_pagerank_resume_identical(spark, tmp_path, two_cliques_bridge):
    g = two_cliques_bridge
    full = collect_map(pagerank(g, tol=1e-10).state, "id", "rank")
    d = str(tmp_path / "prck")
    # interrupted run: only 3 iterations, checkpointing every 2.
    # Exhausting the budget unconverged now raises (loud-failure
    # contract) — the durable checkpoint is committed before that.
    with pytest.raises(ConvergenceError):
        pagerank(g, tol=1e-10, max_iter=3, checkpoint_dir=d, checkpoint_every=2)
    # resumed run completes from the durable checkpoint
    resumed = collect_map(
        pagerank(g, tol=1e-10, checkpoint_dir=d, checkpoint_every=2).state, "id", "rank"
    )
    a = np.array([full[k] for k in sorted(full)])
    b = np.array([resumed[k] for k in sorted(resumed)])
    assert np.allclose(a, b, atol=1e-9)


def test_checkpoint_uri_scheme_roundtrip(spark, tmp_path):
    """An HDFS/object-store checkpoint dir must reach metas through
    the Hadoop FileSystem API, not driver-local os IO (which would
    strand the commit markers on the driver's disk while the data
    lands remotely). Exercised via the file:// scheme — the identical
    code path as hdfs:// or s3a://."""
    d = "file://" + str(tmp_path / "ck_uri")
    init = spark.createDataFrame([(1, 0)], "id long, v int")
    iterate(init, _counting_step, tol=0.0, max_iter=4,
            checkpoint_dir=d, checkpoint_every=2, resume=False)
    assert latest_checkpoint(d, spark)["iteration"] == 3
    res = iterate(init, _counting_step, tol=0.0, max_iter=50,
                  checkpoint_dir=d, checkpoint_every=2)
    assert res.state.collect()[0]["v"] == 10
    assert res.stats[0].resumed


def test_peel_checkpoint_uri_scheme(spark, tmp_path):
    from linkgraph.plans.iterate import PeelCheckpoint, _list_meta_names

    d = "file://" + str(tmp_path / "peel_uri")
    ck = PeelCheckpoint(d, spark)
    f0 = spark.createDataFrame([(1,)], "id long")
    ck.commit(0, {"a": f0}, extra={"k": 1})
    ck.commit(1, {"a": f0.withColumn("id", F.col("id") + 1)}, extra={"k": 2})
    meta = ck.latest()
    assert meta["round"] == 1 and meta["extra"]["k"] == 2
    assert ck.load(meta)["a"].collect()[0]["id"] == 2
    # the stale round-0 commit was GC'd through the same FS API
    assert _list_meta_names(d, spark) == ["peel_000001.meta.json"]


def test_meta_recommit_writes_versioned_sibling(spark, tmp_path):
    """Re-committing an already-committed round on a scheme-qualified
    dir must never delete-then-rename the live meta (a crash between
    the two leaves the round meta-less after older rounds were GC'd).
    The fix writes a versioned sibling that lexicographically sorts
    after the original and before the next round, so the sorted-latest
    readers pick it up with no reader change."""
    from linkgraph.plans.iterate import (
        _list_meta_names,
        _write_meta,
        latest_checkpoint,
    )

    d = "file://" + str(tmp_path / "recommit")
    (tmp_path / "recommit").mkdir()
    p0 = d + "/iter_000005.meta.json"
    _write_meta(p0, {"iteration": 5, "v": "first"}, spark)
    _write_meta(p0, {"iteration": 5, "v": "second"}, spark)
    _write_meta(p0, {"iteration": 5, "v": "third"}, spark)
    names = _list_meta_names(d, spark)
    assert names == [
        "iter_000005.meta.json",
        "iter_000005.v001.meta.json",
        "iter_000005.v002.meta.json",
    ]
    assert latest_checkpoint(d, spark)["v"] == "third"
    # a later round still sorts after every version of round 5
    _write_meta(d + "/iter_000006.meta.json", {"iteration": 6, "v": "r6"}, spark)
    assert latest_checkpoint(d, spark)["v"] == "r6"
