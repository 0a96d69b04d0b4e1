"""A minimal production-shaped linkgraph job for spark-submit.

Run exactly as the north rule deploys the engine:

    spark-submit --master local[4] \
        --py-files dist/linkgraph.zip scripts/submit_job.py out.json [n_pages]

``linkgraph`` is imported from the --py-files zip (this file's own
directory is scripts/, so the package cannot leak in via sys.path[0];
tests/test_submit.py additionally runs with cwd=/tmp). The job is the
engine's flagship pipeline — synthetic Common-Crawl-style pages →
pandas-UDF link extraction → edge table → PageRank + WCC — and writes
a deterministic summary JSON that the smoke test compares against an
in-process run of the same computation.
"""

from __future__ import annotations

import json
import sys


def run(spark, n_pages: int):
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph
    from linkgraph.operators.components import weakly_connected_components
    from linkgraph.operators.pagerank import pagerank_fixed_iterations
    from linkgraph.sources.pages import pages_dataframe

    pages = pages_dataframe(spark, n_pages, n_domains=20, seed=7)
    g = LinkGraph.from_pages(pages)
    ranks = pagerank_fixed_iterations(g, 3)
    wcc = weakly_connected_components(g).state
    rank_row = ranks.agg(
        F.count("*").alias("n"),
        F.round(F.sum("rank"), 6).alias("rank_sum"),
        F.round(F.max("rank"), 9).alias("rank_max"),
    ).collect()[0]
    n_components = wcc.select("component").distinct().count()
    return {
        "vertices": rank_row["n"],
        "edges": g.edges.count(),
        "rank_sum": float(rank_row["rank_sum"]),
        "rank_max": float(rank_row["rank_max"]),
        "components": n_components,
    }


def main() -> None:
    out_path = sys.argv[1]
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    # Production shape: spark-submit owns master/deploy topology; the
    # job sets only job-level conf on the builder it is handed.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("linkgraph-submit-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    import tempfile

    spark.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="linkgraph-submit-ckpt-"))
    try:
        summary = run(spark, n_pages)
    finally:
        spark.stop()
    with open(out_path, "w") as fh:
        json.dump(summary, fh, sort_keys=True)
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
