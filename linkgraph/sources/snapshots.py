"""Snapshot-log table: Iceberg-style commits over plain parquet.

The north rule's durable surface is an Iceberg table of crawl
snapshots — appends land as table commits, readers get snapshot
isolation, incremental consumers scan only the appended files, and
old snapshots stay time-travelable until expired. This module gives
the engine those SEMANTICS with nothing but a filesystem Spark can
write (the sandbox has no Iceberg runtime jar; on a real deployment
``spark.read.format("iceberg")`` replaces ``read`` and each
``commit_*`` becomes one table commit — the call sites don't change).

Layout under one root::

    data/snap_000001/part-*.parquet   one directory per commit's files
    snaps/snap_000001.meta.json       the commit record (see below)

A snapshot meta lists EVERY data directory visible at that snapshot
(its parent's plus its own for ``append``; only its own for
``overwrite``), so a read is one ``spark.read.parquet(*dirs)`` —
no log replay. Commit protocol is the engine's checkpoint protocol
(plans/iterate): parquet data (with _SUCCESS) first, THEN the meta
via write-then-rename — a meta existing implies its data is
complete, and a crash mid-commit leaves invisible garbage, never a
broken table. Works on any URI (file:///hdfs:///s3a://) through the
same scheme-aware helpers. Single-writer per table, like Iceberg
without a catalog lock — concurrent committers need the catalog.

``rows``/``partitions`` ride each meta: the per-commit lineage
metrics the north rule asks checkpoints to carry.
"""

from __future__ import annotations

import os
import posixpath

from pyspark.sql import DataFrame, SparkSession

from linkgraph.plans.iterate import (
    _fs,
    _list_meta_names,
    _read_json,
    _rm_path,
    _write_meta,
)


def _rm_file(path: str, spark: SparkSession | None) -> None:
    """Delete a single FILE on any FS (_rm_path is rmtree-shaped and
    silently no-ops on a local file)."""
    if "://" not in path or path.startswith("file:"):
        try:
            os.remove(path.removeprefix("file:"))
        except FileNotFoundError:
            pass
        return
    fs, hpath, _ = _fs(spark, path)
    fs.delete(hpath, False)


class SnapshotError(RuntimeError):
    pass


class SnapshotTable:
    def __init__(self, root: str, spark: SparkSession | None = None) -> None:
        self.root = root.rstrip("/")
        self.spark = spark

    # -- log access ---------------------------------------------------------

    def _snaps_dir(self) -> str:
        return f"{self.root}/snaps"

    def _meta_path(self, sid: int) -> str:
        return f"{self._snaps_dir()}/snap_{sid:06d}.meta.json"

    def snapshots(self) -> list[dict]:
        """All committed snapshot metas, oldest first."""
        names = _list_meta_names(self._snaps_dir(), self.spark)
        return [
            _read_json(posixpath.join(self._snaps_dir(), n), self.spark)
            for n in names
        ]

    def latest(self) -> int | None:
        names = _list_meta_names(self._snaps_dir(), self.spark)
        if not names:
            return None
        # versioned re-commit siblings (iter.vNNN pattern) don't occur
        # here — snapshot ids only grow — so the last name is the tip
        return int(names[-1].split("_")[1].split(".")[0])

    def _meta(self, sid: int) -> dict:
        try:
            return _read_json(self._meta_path(sid), self.spark)
        except Exception as exc:
            raise SnapshotError(f"no committed snapshot {sid} under {self.root}") from exc

    # -- commits ------------------------------------------------------------

    def _commit(self, df: DataFrame, operation: str) -> int:
        parent = self.latest()
        sid = (parent or 0) + 1
        data_dir = f"{self.root}/data/snap_{sid:06d}"
        df.write.mode("overwrite").parquet(data_dir)
        spark = df.sparkSession
        committed = spark.read.parquet(data_dir)
        rows = committed.count()
        dirs = [] if operation in ("overwrite", "compact") or parent is None else list(
            self._meta(parent)["dirs"]
        )
        dirs.append(f"data/snap_{sid:06d}")
        meta = {
            "snapshot": sid,
            "parent": parent,
            "operation": operation,
            "dirs": dirs,
            "rows_appended": rows,
            "partitions": committed.rdd.getNumPartitions(),
        }
        snaps = self._snaps_dir()
        if "://" not in snaps or snaps.startswith("file:"):
            os.makedirs(snaps.removeprefix("file:"), exist_ok=True)
        # (scheme'd paths: Hadoop fs.create makes parents itself)
        _write_meta(self._meta_path(sid), meta, spark)
        return sid

    def commit_append(self, df: DataFrame) -> int:
        """Append ``df`` as a new snapshot; returns its id."""
        return self._commit(df, "append")

    def commit_overwrite(self, df: DataFrame) -> int:
        """Replace the table's visible contents with ``df`` (old
        snapshots stay time-travelable until :meth:`expire`)."""
        return self._commit(df, "overwrite")

    # -- reads --------------------------------------------------------------

    def _resolve(self, spark: SparkSession | None) -> SparkSession:
        s = spark or self.spark or SparkSession.getActiveSession()
        if s is None:
            raise SnapshotError("no SparkSession to read with")
        return s

    def read(self, spark: SparkSession | None = None, snapshot: int | None = None) -> DataFrame:
        """The table at ``snapshot`` (default: latest) — time travel
        is just reading an older meta's file list."""
        s = self._resolve(spark)
        sid = self.latest() if snapshot is None else snapshot
        if sid is None:
            raise SnapshotError(f"empty snapshot table at {self.root}")
        dirs = [f"{self.root}/{d}" for d in self._meta(sid)["dirs"]]
        return s.read.parquet(*dirs)

    def added_since(
        self, after: int, until: int | None = None, spark: SparkSession | None = None
    ) -> DataFrame:
        """Incremental scan: rows committed after snapshot ``after``
        up to ``until`` (default latest) — reads ONLY the appended
        files, the input of incremental consumers (edge_delta /
        warm-start PageRank / incremental WCC). Raises if the range
        crosses an ``overwrite`` commit, where "added rows" is not
        defined by the file log (diff the two reads instead)."""
        s = self._resolve(spark)
        until = self.latest() if until is None else until
        if until is None or until < after:
            raise SnapshotError(f"bad incremental range ({after}, {until}]")
        new_dirs: list[str] = []
        for sid in range(after + 1, until + 1):
            m = self._meta(sid)
            if m["operation"] == "compact":
                # a compaction rewrites the SAME row multiset into a
                # new file layout — it adds nothing, so incremental
                # consumers skip it (Iceberg's incremental append
                # scan skips replace snapshots the same way)
                continue
            if m["operation"] != "append":
                raise SnapshotError(
                    f"incremental scan ({after}, {until}] crosses a "
                    f"{m['operation']!r} commit at snapshot {sid}"
                )
            new_dirs.append(f"{self.root}/data/snap_{sid:06d}")
        if not new_dirs:
            base = self.read(s, until)
            return base.limit(0)
        return s.read.parquet(*new_dirs)

    # -- maintenance --------------------------------------------------------

    def compact(
        self,
        n_files: int | None = None,
        spark: SparkSession | None = None,
    ) -> int:
        """Rewrite the CURRENT table contents into one bin-packed data
        directory and commit it as a ``compact`` snapshot — Iceberg's
        ``rewrite_data_files`` maintenance action. A long-running
        crawl appends thousands of micro-batch snapshots whose small
        files make every later scan pay per-file open cost; compaction
        collapses them without changing a single row:

          * readers at the new snapshot see the identical row multiset
            (asserted by the caller's tests, guaranteed by the
            read→repartition→write dataflow);
          * older snapshots stay time-travelable until :meth:`expire`
            (their metas still reference the pre-compaction dirs);
          * incremental consumers skip the compact commit entirely
            (``added_since`` treats it as adding nothing, like
            Iceberg's incremental scan over replace snapshots).

        ``n_files``: output file count; default sizes by rows
        (plans/partitioning.ROWS_PER_PARTITION per file, ≥ 1).
        Returns the new snapshot id. Same single-writer caveat as
        every commit."""
        s = self._resolve(spark)
        current = self.read(s)
        if n_files is None:
            from linkgraph.plans.partitioning import ROWS_PER_PARTITION

            rows = current.count()
            n_files = max(1, (rows + ROWS_PER_PARTITION - 1) // ROWS_PER_PARTITION)
        if n_files < 1:
            raise ValueError(f"n_files must be >= 1, got {n_files}")
        return self._commit(current.repartition(n_files), "compact")

    def file_stats(self, snapshot: int | None = None) -> dict:
        """Small-file report for the ``snapshot`` (default latest):
        {"snapshot", "n_dirs", "n_files", "bytes"} over its visible
        data directories — the when-to-compact signal (Iceberg stores
        the same numbers in manifest summaries). Driver-side listing
        via the scheme-aware FileSystem; cost is one RPC per file,
        fine for maintenance cadence."""
        sid = self.latest() if snapshot is None else snapshot
        if sid is None:
            raise SnapshotError(f"empty snapshot table at {self.root}")
        dirs = self._meta(sid)["dirs"]
        n_files = 0
        n_bytes = 0
        for d in dirs:
            full = f"{self.root}/{d}"
            if "://" not in full or full.startswith("file:"):
                local = full.removeprefix("file:")
                for name in os.listdir(local):
                    if name.endswith(".parquet"):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(local, name))
            else:
                fs, hpath, _ = _fs(self.spark, full)
                for st in fs.listStatus(hpath):
                    name = st.getPath().getName()
                    if name.endswith(".parquet"):
                        n_files += 1
                        n_bytes += st.getLen()
        return {
            "snapshot": sid,
            "n_dirs": len(dirs),
            "n_files": n_files,
            "bytes": n_bytes,
        }

    def expire(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots and delete
        data directories no surviving snapshot references. Metas go
        first, data second — a crash in between leaves unreferenced
        (harmless) files, never a meta pointing at deleted data.
        Returns the expired snapshot ids."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        metas = self.snapshots()
        if len(metas) <= keep_last:
            return []
        survivors = metas[-keep_last:]
        expired = metas[:-keep_last]
        live = {d for m in survivors for d in m["dirs"]}
        for m in expired:
            _rm_file(self._meta_path(m["snapshot"]), self.spark)
        for m in expired:
            for d in m["dirs"]:
                if d not in live:
                    _rm_path(f"{self.root}/{d}", self.spark)
        return [m["snapshot"] for m in expired]
