"""SnapshotTable: Iceberg-style commit/read/time-travel/incremental/
expire semantics over plain parquet (sources/snapshots.py), including
the file:// URI path that exercises the Hadoop FileSystem branch and
the crash-safety invariant (data without a meta is invisible)."""

import os

import pytest

from linkgraph.sources.snapshots import SnapshotError, SnapshotTable


def _batch(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS src", "id + 1 AS dst")


def _ids(df):
    return {r["src"] for r in df.collect()}


def test_append_read_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    s1 = t.commit_append(_batch(spark, 0, 10))
    s2 = t.commit_append(_batch(spark, 10, 25))
    s3 = t.commit_append(_batch(spark, 25, 30))
    assert (s1, s2, s3) == (1, 2, 3)
    assert t.latest() == 3
    assert _ids(t.read(spark)) == set(range(30))
    assert _ids(t.read(spark, snapshot=1)) == set(range(10))  # time travel
    assert _ids(t.read(spark, snapshot=2)) == set(range(25))
    metas = t.snapshots()
    assert [m["rows_appended"] for m in metas] == [10, 15, 5]
    assert metas[1]["parent"] == 1 and metas[0]["parent"] is None


def test_incremental_scan(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit_append(_batch(spark, 0, 10))
    t.commit_append(_batch(spark, 10, 25))
    t.commit_append(_batch(spark, 25, 30))
    assert _ids(t.added_since(1, spark=spark)) == set(range(10, 30))
    assert _ids(t.added_since(2, until=3, spark=spark)) == set(range(25, 30))
    assert _ids(t.added_since(3, spark=spark)) == set()  # empty, not an error


def test_overwrite_blocks_incremental_but_reads(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit_append(_batch(spark, 0, 10))
    t.commit_overwrite(_batch(spark, 100, 105))
    t.commit_append(_batch(spark, 105, 110))
    assert _ids(t.read(spark)) == set(range(100, 110))
    assert _ids(t.read(spark, snapshot=1)) == set(range(10))
    with pytest.raises(SnapshotError, match="overwrite"):
        t.added_since(1, spark=spark)
    assert _ids(t.added_since(2, spark=spark)) == set(range(105, 110))


def test_data_without_meta_is_invisible(spark, tmp_path):
    """Crash between data write and meta rename: the table must not
    see the orphan directory — meta existence IS the commit."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    t.commit_append(_batch(spark, 0, 10))
    _batch(spark, 50, 60).write.parquet(os.path.join(root, "data", "snap_000002"))
    assert t.latest() == 1
    assert _ids(t.read(spark)) == set(range(10))
    # and the next real commit does not resurrect the orphan
    t.commit_append(_batch(spark, 10, 12))
    assert t.latest() == 3 or t.latest() == 2  # id collision allowed to skip
    assert 50 not in _ids(t.read(spark))


def test_expire_gc(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit_append(_batch(spark, 0, 10))
    t.commit_overwrite(_batch(spark, 20, 25))
    t.commit_append(_batch(spark, 25, 30))
    gone = t.expire(keep_last=2)
    assert gone == [1]
    assert _ids(t.read(spark)) == set(range(20, 30))
    assert _ids(t.read(spark, snapshot=2)) == set(range(20, 25))
    with pytest.raises(SnapshotError):
        t.read(spark, snapshot=1)
    # snapshot 1's data dir (referenced by nobody) is deleted
    assert not os.path.exists(str(tmp_path / "tbl" / "data" / "snap_000001"))
    # survivors' dirs intact
    assert os.path.exists(str(tmp_path / "tbl" / "data" / "snap_000003"))


def test_file_uri_hadoop_branch(spark, tmp_path):
    """file:// root drives the exact py4j Hadoop FileSystem code used
    for hdfs:///s3a:// (verify-skill gotcha: plain paths take the
    local-os fast branch and skip it)."""
    t = SnapshotTable(f"file://{tmp_path}/tbl", spark=spark)
    t.commit_append(_batch(spark, 0, 5))
    t.commit_append(_batch(spark, 5, 8))
    assert t.latest() == 2
    assert _ids(t.read(spark)) == set(range(8))
    assert _ids(t.added_since(1, spark=spark)) == set(range(5, 8))
    assert t.expire(keep_last=1) == [1]
    assert _ids(t.read(spark)) == set(range(8))


def test_incremental_feeds_warm_start_wcc(spark, tmp_path):
    """The intended composition: crawl deltas land as snapshot
    appends; incremental WCC warm-starts from yesterday's labels over
    the snapshot reads and matches a cold run exactly."""
    from linkgraph import LinkGraph
    from linkgraph.operators.components import weakly_connected_components

    t = SnapshotTable(str(tmp_path / "edges"))
    t.commit_append(
        spark.createDataFrame(
            [(0, 1), (2, 3), (4, 5)], "src long, dst long"
        ).selectExpr("src", "dst", "CAST(1.0 AS DOUBLE) AS weight")
    )
    g1 = LinkGraph(t.read(spark), directed=True)
    day1 = weakly_connected_components(g1)
    t.commit_append(
        spark.createDataFrame([(1, 2)], "src long, dst long").selectExpr(
            "src", "dst", "CAST(1.0 AS DOUBLE) AS weight"
        )
    )
    assert _ids(t.added_since(1, spark=spark)) == {1}
    g2 = LinkGraph(t.read(spark), directed=True)
    warm = weakly_connected_components(g2, init_labels=day1.state)
    cold = weakly_connected_components(g2)
    w = {r["id"]: r["component"] for r in warm.state.collect()}
    c = {r["id"]: r["component"] for r in cold.state.collect()}
    assert w == c
    assert w[3] == 0  # the delta merged {0,1} with {2,3}


def test_compact_preserves_rows_and_collapses_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl_c"))
    for lo, hi in [(0, 10), (10, 25), (25, 30)]:
        t.commit_append(_batch(spark, lo, hi))
    pre = t.file_stats()
    assert pre["n_dirs"] == 3 and pre["n_files"] >= 3
    sid = t.compact(n_files=1, spark=spark)
    assert t.latest() == sid
    assert t.snapshots()[-1]["operation"] == "compact"
    # identical row multiset at the new snapshot
    assert _ids(t.read(spark)) == set(range(30))
    assert t.read(spark).count() == 30
    # pre-compaction snapshots stay time-travelable
    assert _ids(t.read(spark, snapshot=2)) == set(range(25))
    post = t.file_stats()
    assert post["n_dirs"] == 1 and post["n_files"] == 1
    assert post["bytes"] > 0
    # default n_files path (rows << ROWS_PER_PARTITION -> 1 file)
    t.commit_append(_batch(spark, 30, 32))
    sid2 = t.compact(spark=spark)
    assert t.file_stats()["n_files"] == 1
    assert _ids(t.read(spark, snapshot=sid2)) == set(range(32))


def test_added_since_skips_compaction(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl_i"))
    t.commit_append(_batch(spark, 0, 10))
    t.commit_append(_batch(spark, 10, 25))
    t.compact(n_files=1, spark=spark)  # snapshot 3
    t.commit_append(_batch(spark, 25, 30))  # snapshot 4
    # the compact commit adds nothing: scans across it see only the
    # genuine appends, with no double counting of rewritten rows
    assert _ids(t.added_since(2, spark=spark)) == set(range(25, 30))
    assert _ids(t.added_since(0, spark=spark)) == set(range(30))
    assert t.added_since(0, spark=spark).count() == 30
    # a true overwrite still refuses
    t.commit_overwrite(_batch(spark, 0, 5))
    with pytest.raises(SnapshotError, match="overwrite"):
        t.added_since(1, spark=spark)


def test_compact_empty_and_expire_interplay(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl_e"))
    with pytest.raises(SnapshotError, match="empty"):
        t.compact(spark=spark)
    t.commit_append(_batch(spark, 0, 10))
    t.commit_append(_batch(spark, 10, 20))
    t.compact(n_files=1, spark=spark)
    expired = t.expire(keep_last=1)
    assert expired == [1, 2]
    # the surviving compact snapshot reads fine; expired ones do not
    assert _ids(t.read(spark)) == set(range(20))
    with pytest.raises(SnapshotError):
        t.read(spark, snapshot=1)
    # the pre-compaction data dirs are gone from disk
    import os as _os

    data = str(tmp_path / "tbl_e" / "data")
    assert sorted(_os.listdir(data)) == ["snap_000003"]
