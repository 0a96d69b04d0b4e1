"""SparkSession factory with scale-appropriate defaults.

Defaults chosen for iterative graph workloads on columnar data:
AQE on (runtime broadcast conversion, shuffle coalescing, skew-join
splitting), Arrow on (all our UDFs are vectorized pandas UDFs),
shuffle partitions sized to the local core count (on a real cluster
this is set to ~2-3x total executor cores via --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linkgraph",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'. ``master``
    overrides the local[K] default entirely — used by the scaling
    bench for process-isolated ``local-cluster[N,C,M]`` runs. On a
    real cluster the master/executor topology comes from
    spark-submit; everything set here is topology-independent.
    """
    if master is None:
        if cores is None:
            env = os.environ.get("SPARK_GRAFT_CPUS")
            master = f"local[{env}]" if env else "local[*]"
        else:
            master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("LINKGRAPH_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Iterative-graph tuning: AQE re-plans each iteration's shuffle
        # (broadcast conversion once ranks fit, skew-split on hub keys).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # All Python crossings are Arrow-vectorized.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep timestamps sane across engines (DuckDB oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode niceties; harmless on a cluster.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("LINKGRAPH_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    if master.startswith("local-cluster"):
        # Process-isolated executors spawn their own Python workers,
        # which must import this package — the sandbox analogue of
        # spark-submit --py-files. Derive the repo root from the
        # package location rather than assuming cwd.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        pypath = f"{repo_root}:{existing}" if existing else repo_root
        builder = builder.config("spark.executorEnv.PYTHONPATH", pypath)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if spark.sparkContext.getCheckpointDir() is None:
        # Reliable-checkpoint target for iterative lineage truncation
        # (plans/iterate.truncate_lineage). On a cluster point this at
        # HDFS/object storage via setCheckpointDir before first use.
        import atexit
        import shutil
        import tempfile

        if not spark.sparkContext.master.startswith("local"):
            # A driver-local checkpoint path is WRONG on a real
            # cluster: executors write parquet parts to their own
            # local filesystems and the lazy read-back in
            # truncate_lineage fails. Refuse rather than corrupt.
            raise RuntimeError(
                f"master={spark.sparkContext.master} but no checkpoint dir is set; "
                "call spark.sparkContext.setCheckpointDir(<HDFS/object-store path>) "
                "before using iterative operators — a driver-local tempdir does "
                "not work across executors"
            )
        ckpt = tempfile.mkdtemp(prefix="linkgraph-ckpt-")
        spark.sparkContext.setCheckpointDir(ckpt)
        atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    return spark
