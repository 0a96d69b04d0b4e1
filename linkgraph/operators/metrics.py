"""Evaluation metrics for pipeline models, as distributed dataflow —
the readouts every quality-classifier / lang-id / link-prediction /
dedup-threshold stage needs before its scores gate a 10^12-document
corpus: ROC AUC (rank-based Mann-Whitney, tie-aware) and thresholded
confusion metrics.

AUC without a global window: ranking 10^9 scored rows through one
``Window.orderBy`` funnels the corpus into a single task. Instead:

  1. aggregate per DISTINCT score (groupBy score → row count +
     positive count) — map-side combined, output bounded by the
     number of distinct score values;
  2. range-repartition the distinct scores (globally ordered
     partitions), per-partition running count windows, and a tiny
     driver-side per-partition offset map — the same two-level
     distributed prefix sum the sequence packer uses
     (packing._running_end), transposed from id order to score order
     (range partitioning replaces high-bit bucketing because scores
     are doubles, and per-score pre-aggregation guarantees a distinct
     score never straddles a partition boundary);
  3. average rank of a tied score group = C(<s) + (cnt+1)/2;
     AUC = (Σ_pos avg_rank − P(P+1)/2) / (P·N) — the Mann-Whitney U
     statistic with the standard tie correction, exactly what
     sklearn's roc_auc_score computes.

Determinism note for cross-engine replay: round scores BEFORE the
metric (the contract rounds to 6 dp) so the TIE STRUCTURE — which
changes avg ranks discontinuously — is identical on both engines;
sub-ulp score differences would otherwise flip ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.plans.iterate import truncate_lineage


def ranking_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    partitions: int | None = None,
) -> DataFrame:
    """1-row DataFrame(n_pos, n_neg, auc): tie-aware ROC AUC of
    ``score_col`` against binary ``label_col`` (values cast to double,
    positive = 1.0). ``auc`` is NULL when either class is absent (the
    metric is undefined, not 0.5 — a silent default would hide a
    single-class bug upstream). Rows with a NULL score are DROPPED
    before ranking (documented, consistent with the no-silent-defaults
    policy: a NULL would otherwise sort first and form a silent tied
    rank group; sklearn raises on NaN scores — here unscored rows are
    simply not rankable and ``n_pos``/``n_neg`` reflect the drop).
    See the module docstring for the distributed rank construction."""
    spark = df.sparkSession
    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    s = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("y"),
    ).filter(F.col("s").isNotNull())
    per_score = s.groupBy("s").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("pos"),
    )
    # materialize ONCE (parquet roundtrip): the range partitioner's
    # sampled boundaries must be identical for the offset collect and
    # the ranking plan — two independent computations could sample
    # different boundaries and mismatch the offset map
    ranged = truncate_lineage(
        per_score.repartitionByRange(n_part, "s").withColumn(
            "_p", F.spark_partition_id()
        )
    )
    part_sums = {
        int(r["_p"]): int(r["c"])
        for r in ranged.groupBy("_p").agg(F.sum("cnt").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(part_sums):
        offsets[p] = acc
        acc += part_sums[p]
    if not offsets:
        offsets = {0: 0}
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
        F.col("_p")
    ]
    w = (
        Window.partitionBy("_p")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = ranged.withColumn("cum", F.sum("cnt").over(w) + off).select(
        "s",
        "cnt",
        "pos",
        # average rank of the tied group at this score (1-based)
        (
            (F.col("cum") - F.col("cnt")).cast("double")
            + (F.col("cnt") + 1).cast("double") / 2.0
        ).alias("avg_rank"),
    )
    return ranked.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("cnt") - F.sum("pos"), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(F.col("pos") * F.col("avg_rank")).alias("_rank_sum"),
    ).select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (
                F.col("_rank_sum")
                - F.col("n_pos").cast("double")
                * (F.col("n_pos") + 1).cast("double")
                / 2.0
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
        ).alias("auc"),
    )


def confusion_metrics(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    threshold: float = 0.5,
) -> DataFrame:
    """1-row DataFrame(tp, fp, tn, fn, precision, recall, f1,
    accuracy) at ``score >= threshold``. Ratio columns are NULL when
    their denominator is 0 (no silent 0-defaults)."""
    s = df.select(
        (F.col(score_col).cast("double") >= float(threshold)).alias("p"),
        (F.col(label_col).cast("double") == 1.0).alias("t"),
    )
    c = s.agg(
        F.count(F.when(F.col("p") & F.col("t"), 1)).alias("tp"),
        F.count(F.when(F.col("p") & ~F.col("t"), 1)).alias("fp"),
        F.count(F.when(~F.col("p") & ~F.col("t"), 1)).alias("tn"),
        F.count(F.when(~F.col("p") & F.col("t"), 1)).alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    )
    return c.select(
        "tp",
        "fp",
        "tn",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
            2.0 * prec * rec / (prec + rec),
        ).alias("f1"),
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn"))
        ).alias("accuracy"),
    )


def average_precision(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    partitions: int | None = None,
) -> DataFrame:
    """1-row DataFrame(n_pos, n_neg, ap): average precision (the
    PR-curve summary retrieval/filter pipelines quote next to ROC
    AUC), computed rank-distributed with the SAME per-distinct-score
    pre-agg + range-partitioned prefix sums as :func:`ranking_auc` —
    no global window, no sort-collect.

    Definition (sklearn's step-wise interpolation-free form, with
    ties handled as one block — every row of a tied score group
    shares the group's precision):

        AP = Σ_groups  pos_g · P_g / n_pos
        P_g = (pos above-or-at group) / (rows above-or-at group)

    descending-score order, so the prefix sums here run over
    DESCENDING score (the same ranked frame negated). NULL when no
    positive exists. Rows with a NULL score are DROPPED before
    ranking (same contract as :func:`ranking_auc` — an unscored row
    is not rankable; silently treating NULLs as a tied group would
    skew the metric)."""
    spark = df.sparkSession
    n_part = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    s = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("double").alias("y"),
    ).filter(F.col("s").isNotNull())
    per_score = s.groupBy("s").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("pos"),
    )
    ranged = truncate_lineage(
        per_score.repartitionByRange(n_part, F.col("s").desc()).withColumn(
            "_p", F.spark_partition_id()
        )
    )
    part_sums = {
        int(r["_p"]): (int(r["c"]), int(r["pc"]))
        for r in ranged.groupBy("_p")
        .agg(F.sum("cnt").alias("c"), F.sum("pos").alias("pc"))
        .collect()
    }
    off_c, off_p, acc_c, acc_p = {}, {}, 0, 0
    for p in sorted(part_sums):
        off_c[p], off_p[p] = acc_c, acc_p
        acc_c += part_sums[p][0]
        acc_p += part_sums[p][1]
    if not off_c:
        off_c, off_p = {0: 0}, {0: 0}
    oc = F.create_map(*[F.lit(x) for kv in off_c.items() for x in kv])[F.col("_p")]
    op = F.create_map(*[F.lit(x) for kv in off_p.items() for x in kv])[F.col("_p")]
    w = (
        Window.partitionBy("_p")
        .orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = ranged.select(
        "cnt",
        "pos",
        (F.sum("cnt").over(w) + oc).alias("cum_cnt"),
        (F.sum("pos").over(w) + op).alias("cum_pos"),
    )
    return ranked.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("cnt") - F.sum("pos"), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(
            F.col("pos")
            * (F.col("cum_pos").cast("double") / F.col("cum_cnt"))
        ).alias("_num"),
    ).select(
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0, F.col("_num") / F.col("n_pos").cast("double")
        ).alias("ap"),
    )
