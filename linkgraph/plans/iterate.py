"""Generic convergence-driven iteration over a state DataFrame.

This is the one piece of engine machinery Catalyst does NOT give us
(SURVEY.md §4.2): iterative DataFrame jobs grow an unbounded logical
plan (each iteration's join/agg nests inside the next), which blows
up optimizer time and driver memory long before data size matters.
The driver here:

1. truncates lineage every ``truncate_every`` iterations via
   ``localCheckpoint`` (RDD materialization, plan reset);
2. optionally commits a durable checkpoint (Parquet + meta JSON with
   iteration number, delta, per-partition row counts) every
   ``checkpoint_every`` iterations — the resumability contract of the
   north rule: a restarted run scans for the latest valid commit and
   continues mid-computation;
3. records per-iteration stats (delta, rows, wall seconds) so
   convergence is observable, mirroring the level-synchronous loop
   shape the reference itself uses for its parallel ops
   (graph.rs:1289-1341 — par expansion, sequential merge).

The pattern is batch-iterative, not Structured Streaming, matching
both the reference (fully batch) and the north rule.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class ConvergenceError(RuntimeError):
    """An iterative operator exhausted its iteration budget without
    converging. Raised instead of silently returning a partial /
    unconverged result (the NetworkX PowerIterationFailedConvergence
    analog) — a truncated fixpoint is a WRONG answer for
    WCC/SCC/MST/core-numbers, not a degraded one."""


_TRUNC_SEQ = [0]


def _rm_path(path: str, spark: SparkSession | None = None) -> None:
    """Delete a checkpoint/trunc directory wherever it lives.

    ``shutil.rmtree`` silently no-ops on non-local URIs — exactly the
    HDFS/object-store checkpoint dirs session.py tells cluster users
    to configure — so hot loops would leak trunc dirs unboundedly on
    a real cluster. Route scheme-qualified paths through the Hadoop
    FileSystem API instead; plain paths stay on the cheap local
    branch."""
    if "://" not in path or path.startswith("file:"):
        shutil.rmtree(path.removeprefix("file:"), ignore_errors=True)
        return
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        import sys

        print(
            f"WARNING linkgraph.iterate: cannot delete {path} — no active "
            "SparkSession for the Hadoop FileSystem API; trunc dir leaked",
            file=sys.stderr,
        )
        return
    try:
        jvm = spark._jvm
        jsc = spark.sparkContext._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    except Exception as exc:  # best-effort GC, never fail the loop
        import sys

        print(f"WARNING linkgraph.iterate: failed to delete {path}: {exc}", file=sys.stderr)


_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def _has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def _fs(spark: SparkSession | None, path: str):
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"checkpoint path {path} has a filesystem scheme but there is no "
            "active SparkSession for the Hadoop FileSystem API"
        )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _write_meta(meta_path: str, meta: dict, spark: SparkSession | None = None) -> None:
    """Write-then-rename JSON commit wherever the checkpoint dir lives.

    A meta marks its round's parquet data complete, so it must land in
    the SAME filesystem as the data: with an HDFS/object-store
    checkpoint dir (the cluster setup session.py instructs), plain
    ``open()``/``os.replace`` would silently drop the marker on
    driver-LOCAL disk — after a driver loss the new driver finds data
    but no metas and restarts from zero, the exact failure
    resumability exists to prevent. Scheme-qualified paths go through
    the Hadoop FileSystem API; plain paths stay on cheap local IO."""
    payload = json.dumps(meta)
    if not _has_scheme(meta_path):
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, meta_path)  # atomic on POSIX — no unreadable window
        return
    fs, target, jvm = _fs(spark, meta_path)
    if fs.exists(target):
        # Re-commit of an already-committed round (e.g. a caller
        # restarted with resume=False on a used dir). NEVER
        # delete-then-rename the live meta: a crash between the two
        # would leave the round meta-less, and with older rounds
        # already GC'd a later resume would silently restart from
        # zero. (fs.rename isn't atomic on s3a anyway.) Instead write
        # under a fresh VERSIONED sibling — `iter_000005.meta.json` →
        # `iter_000005.v001.meta.json` — chosen so plain lexicographic
        # order ranks it after the original and before the next round
        # ('m' < 'v' < any higher round digit); the sorted-latest
        # readers pick it up with no reader changes, and a valid meta
        # for the round exists at every instant.
        v = 1
        while True:
            cand = meta_path[: -len(".meta.json")] + f".v{v:03d}.meta.json"
            target = jvm.org.apache.hadoop.fs.Path(cand)
            if not fs.exists(target):
                meta_path = cand
                break
            v += 1
    tmp = jvm.org.apache.hadoop.fs.Path(meta_path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, target):
        raise IOError(f"checkpoint meta rename failed: {meta_path}")


def _read_json(path: str, spark: SparkSession | None = None) -> dict:
    if not _has_scheme(path):
        with open(path) as f:
            return json.load(f)
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        # commons-io ships with Spark; avoids byte-at-a-time py4j reads
        content = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(content)


def _list_meta_names(dir_path: str, spark: SparkSession | None = None) -> list[str]:
    """Sorted ``*.meta.json`` basenames under a checkpoint dir (any FS)."""
    if not _has_scheme(dir_path):
        if not os.path.isdir(dir_path):
            return []
        names = os.listdir(dir_path)
    else:
        fs, hpath, _ = _fs(spark, dir_path)
        if not fs.exists(hpath):
            return []
        names = [s.getPath().getName() for s in fs.listStatus(hpath)]
    return sorted(n for n in names if n.endswith(".meta.json"))


def _remove_file(path: str, spark: SparkSession | None = None) -> None:
    if not _has_scheme(path):
        os.remove(path)
    else:
        fs, hpath, _ = _fs(spark, path)
        fs.delete(hpath, False)


def _ensure_dir(path: str, spark: SparkSession | None = None) -> None:
    if not _has_scheme(path):
        os.makedirs(path, exist_ok=True)
    else:
        fs, hpath, _ = _fs(spark, path)
        fs.mkdirs(hpath)


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and cut its logical plan.

    Default mechanism is a Parquet roundtrip into the SparkContext's
    checkpoint dir (get_spark always sets one; on a cluster it is
    HDFS/object storage — the Iceberg-state-table pattern): one write
    job computes the frame exactly once, the read back is lazy, and
    the truncated frame is DISK-BACKED — immune to cache eviction.
    The alternatives both lose: ``localCheckpoint`` dies with "Block
    rdd_N does not exist" when memory pressure evicts a block whose
    lineage was already discarded, and reliable ``df.checkpoint``
    computes every frame twice (materialize + rewrite). Falls back to
    localCheckpoint when no checkpoint dir is configured."""
    import os

    try:
        ckpt = df.sparkSession.sparkContext.getCheckpointDir()
    except Exception:
        ckpt = None
    if ckpt:
        _TRUNC_SEQ[0] += 1
        path = os.path.join(ckpt, f"trunc-{os.getpid()}-{_TRUNC_SEQ[0]:06d}")
        df.write.mode("overwrite").parquet(path)
        out = df.sparkSession.read.parquet(path)
        out._lg_trunc_path = path  # consumed by LineageChain GC
        return out
    return df.localCheckpoint(eager=True)


class LineageChain:
    """truncate_lineage with garbage collection for hot loops.

    Each ``cut`` materializes the new frame, then deletes the parquet
    directory of the PREVIOUS frame cut by this same chain (safe: the
    successor is fully materialized and owns its own copy of the
    data). One chain per logically-advancing frame (state, frontier,
    visited, …) so loops no longer grow disk unboundedly — a
    core_numbers peel used to leave ~4 directories per round behind.
    Only directories created by this chain are ever deleted; frames
    truncated by callers are never touched."""

    def __init__(self) -> None:
        self._prev: str | None = None
        self._spark: SparkSession | None = None

    def cut(self, df: DataFrame) -> DataFrame:
        self._spark = df.sparkSession
        out = truncate_lineage(df)
        new_path = getattr(out, "_lg_trunc_path", None)
        if self._prev and new_path and self._prev != new_path:
            _rm_path(self._prev, self._spark)
        self._prev = new_path or self._prev
        return out

    def release(self) -> None:
        """Drop the last directory too (call when the chain's final
        frame has been consumed/copied elsewhere)."""
        if self._prev:
            _rm_path(self._prev, self._spark)
            self._prev = None


@dataclass
class IterationStats:
    iteration: int
    delta: float
    rows: int
    seconds: float
    resumed: bool = False


@dataclass
class IterationResult:
    state: DataFrame
    stats: list[IterationStats] = field(default_factory=list)

    @property
    def iterations(self) -> int:
        return self.stats[-1].iteration + 1 if self.stats else 0


def _meta_path(ckpt_dir: str, i: int) -> str:
    return os.path.join(ckpt_dir, f"iter_{i:06d}.meta.json")


def _data_path(ckpt_dir: str, i: int) -> str:
    return os.path.join(ckpt_dir, f"iter_{i:06d}.parquet")


def commit_checkpoint(
    state: DataFrame,
    ckpt_dir: str,
    iteration: int,
    delta: float,
    partition_audit: bool = True,
) -> None:
    """Atomic-enough commit: Parquet write (with _SUCCESS marker),
    THEN the meta JSON. A meta file existing implies its data is
    complete; resume only trusts metas. On Iceberg this is a single
    table commit with the meta as snapshot properties.

    ``partitions`` is the committed frame's TRUE partition count
    (``getNumPartitions``, empty partitions included). The
    ``partition_rows`` lineage audit (row count per non-empty
    partition — the north rule's per-partition lineage) costs one
    extra scan+collect per commit; set ``partition_audit=False`` to
    skip it for very large states."""
    path = _data_path(ckpt_dir, iteration)
    state.write.mode("overwrite").parquet(path)
    committed = state.sparkSession.read.parquet(path)
    from pyspark.sql import functions as F

    n_partitions = committed.rdd.getNumPartitions()
    if partition_audit:
        part_rows = {
            int(r["p"]): r["n"]
            for r in committed.groupBy(
                F.spark_partition_id().alias("p")
            ).agg(F.count("*").alias("n")).collect()
        }
        rows = sum(part_rows.values())
    else:
        part_rows = None
        rows = committed.count()
    meta = {
        "iteration": iteration,
        "delta": delta,
        "rows": rows,
        "partitions": n_partitions,
        "partition_rows": part_rows,
        "path": path,
    }
    _write_meta(_meta_path(ckpt_dir, iteration), meta, state.sparkSession)


class PeelCheckpoint:
    """Durable commits for MULTI-FRAME driver loops (SCC/MST/core
    peeling), the resumability contract of the north rule extended to
    operators whose loop state is several DataFrames plus scalars.

    Per committed round: each frame goes to
    ``<dir>/peel_<round>/<name>.parquet`` (parquet _SUCCESS marker
    per frame), THEN the round's meta JSON is renamed into place — a
    meta existing implies every frame under it is complete; resume
    only trusts metas (same protocol as commit_checkpoint). The
    previous round's data is deleted once the new meta is durable, so
    a 10-hour peel holds at most two rounds of state on disk. Scalars
    (current k, etc.) ride the meta's ``extra`` dict."""

    def __init__(self, ckpt_dir: str, spark: SparkSession) -> None:
        self._dir = ckpt_dir
        self._spark = spark
        _ensure_dir(ckpt_dir, spark)

    def _meta(self, r: int) -> str:
        return os.path.join(self._dir, f"peel_{r:06d}.meta.json")

    def commit(self, round_i: int, frames: dict[str, DataFrame], extra: dict | None = None) -> None:
        base = os.path.join(self._dir, f"peel_{round_i:06d}")
        paths, rows = {}, {}
        for name, df in frames.items():
            p = os.path.join(base, f"{name}.parquet")
            df.write.mode("overwrite").parquet(p)
            paths[name] = p
            rows[name] = self._spark.read.parquet(p).count()
        meta = {"round": round_i, "frames": paths, "rows": rows, "extra": extra or {}}
        _write_meta(self._meta(round_i), meta, self._spark)
        # GC every older committed round now that this one is durable
        for m in _list_meta_names(self._dir, self._spark):
            if m < os.path.basename(self._meta(round_i)):
                old = _read_json(os.path.join(self._dir, m), self._spark)
                for p in old["frames"].values():
                    _rm_path(p, self._spark)
                _remove_file(os.path.join(self._dir, m), self._spark)

    def latest(self) -> dict | None:
        metas = _list_meta_names(self._dir, self._spark)
        if not metas:
            return None
        return _read_json(os.path.join(self._dir, metas[-1]), self._spark)

    def load(self, meta: dict) -> dict[str, DataFrame]:
        return {name: self._spark.read.parquet(p) for name, p in meta["frames"].items()}


def latest_checkpoint(ckpt_dir: str, spark: SparkSession | None = None) -> dict | None:
    metas = _list_meta_names(ckpt_dir, spark)
    if not metas:
        return None
    return _read_json(os.path.join(ckpt_dir, metas[-1]), spark)


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], tuple[DataFrame, float]],
    tol: float = 0.0,
    max_iter: int = 100,
    truncate_every: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    spark: SparkSession | None = None,
    on_exhaustion: str = "ok",
) -> IterationResult:
    """Run ``step(state, i) -> (state', delta)`` until delta <= tol.

    ``delta`` is whatever convergence metric the algorithm defines
    (L1 rank change for PageRank, changed-label count for WCC/LPA);
    the driver only compares it to ``tol``. Each step builds ONE
    lazily-planned Spark job; the only driver-side action per
    iteration is computing delta (an agg) — no collect of state.

    ``on_exhaustion``: what to do when max_iter runs out with
    delta > tol — "ok" (return as-is; fixed-iteration callers),
    "warn" (stderr warning), or "raise" (ConvergenceError; the right
    default for operators whose partial result is a wrong answer).
    """
    spark = spark or state.sparkSession
    result = IterationResult(state=state)
    start_i = 0
    chain = LineageChain()

    if checkpoint_dir and resume:
        meta = latest_checkpoint(checkpoint_dir, spark)
        if meta is not None:
            state = spark.read.parquet(meta["path"])
            start_i = meta["iteration"] + 1
            result.stats.append(
                IterationStats(meta["iteration"], meta["delta"], meta["rows"], 0.0, resumed=True)
            )
            if meta["delta"] <= tol:
                result.state = state
                return result

    delta = float("inf")
    for i in range(start_i, max_iter):
        t0 = time.time()
        state, delta = step(state, i)
        if truncate_every and (i + 1) % truncate_every == 0:
            # Materialize + cut lineage; eager so timing is honest.
            # The chain deletes the previous iteration's trunc dir
            # once this one is durable.
            cut = chain.cut(state)
            state.unpersist()  # no-op unless step persisted it
            state = cut
        if checkpoint_dir and checkpoint_every and (i + 1) % checkpoint_every == 0:
            commit_checkpoint(state, checkpoint_dir, i, delta)
        result.stats.append(IterationStats(i, delta, -1, time.time() - t0))
        if delta <= tol:
            break
    else:
        if delta > tol and on_exhaustion != "ok":
            msg = (
                f"iteration budget exhausted: delta={delta} > tol={tol} "
                f"after {max_iter} iterations"
            )
            if on_exhaustion == "raise":
                raise ConvergenceError(msg)
            import sys

            print(f"WARNING linkgraph.iterate: {msg}", file=sys.stderr)
    result.state = state
    return result
