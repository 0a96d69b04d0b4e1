"""Distributed logistic-regression quality classifier over hashed
n-gram features — the linear-filter stage of web training pipelines
(GPT-3 trained an LR classifier of trusted-vs-crawl documents, Brown
et al. 2020 §A; fastText quality filters in LLaMA-class pipelines are
the same shape): label a trusted slice positive and the raw crawl
negative, fit a linear model on hashed bag-of-ngrams, keep documents
the model scores in-domain. Complements the engine's generative
scorers (``lm_perplexity``, ``kn_trigram_perplexity``, DSIR) with the
discriminative one.

Training is full-batch gradient descent run AS DATAFLOW — the model
(one weight per hash bucket, ≤ a few thousand rows) is the only small
state; the E-sized feature table never moves:

    margins  features ⋈(broadcast) weights → per-doc sum
    resid    sigmoid(margin) − label        (doc-keyed join)
    grad     features ⋈ resid → per-bucket sum / N (+ l2·w)
    update   w ← w − lr·grad                (bucket-keyed outer join)

The feature table is cached hash-partitioned by doc id once, so the
per-iteration doc-keyed join and per-doc aggregation reuse that
partitioning; the only per-iteration shuffle is the bucket-keyed
gradient sum, map-side-combined down to n_buckets rows. The weight
frame rides a parquet lineage cut per iteration (tiny writes — the
model IS small; unbounded plan growth is what kills iterative jobs).

Deterministic and engine-portable: hashing is the md5-60-bit portable
hash (functions/text.md5int_col), GD is full batch (no sampling, no
shuffling of example order matters to a sum), so the driver contract
replays the trained weights value-exactly in unrolled DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.sampling import _hashed_gram_features
from linkgraph.plans.iterate import PeelCheckpoint, truncate_lineage

INTERCEPT = -1  # bucket id of the bias feature (hash buckets are >= 0)


def hashed_text_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DataFrame(id, h, x): L1-normalized hashed unigram+bigram
    bag-of-ngrams per document — x = count(gram in bucket h) / total
    grams, so every document's feature vector sums to 1 whatever its
    length (bounded scale keeps one global learning rate stable).
    Documents with no tokens produce no rows (the trainer and scorer
    treat them as all-zero vectors)."""
    counts = _hashed_gram_features(docs, id_col, text_col, n_buckets)
    tot = counts.groupBy("id").agg(F.sum("c").alias("n"))
    return counts.join(tot, "id").select(
        "id", "h", (F.col("c") / F.col("n")).alias("x")
    )


def logreg_train(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
    intercept: bool = True,
    partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """DataFrame(h, weight): logistic-regression weights after
    ``iters`` full-batch gradient steps from w = 0.

    ``features``: (id, h, x) sparse rows (``hashed_text_features`` or
    any other featurizer). ``labels``: (id_col, y) with y ∈ {0, 1};
    N = |labels| is the batch size. Step:

        w ← w − lr · ( Σ_d x_dh·(σ(Σ_h x_dh·w_h) − y_d) / N + l2·w_h )

    ``intercept`` adds a constant-1 bias feature in bucket
    ``INTERCEPT`` (= −1) to EVERY labeled document — so a tokenless
    document still carries the bias (margin = w_b, standard LR);
    with ``intercept=False`` it counts toward N but is absent from
    every gradient sum and scores σ(0) = 0.5.

    ``checkpoint_dir``/``checkpoint_every``: durable per-step commits
    of the weight frame (the whole loop state — features and labels
    are recomputed from the caller's deterministic inputs); a
    restarted call with the same dir continues GD from the committed
    step. A checkpoint trained past the requested ``iters`` raises
    (the model on disk is NOT the model asked for)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")
    spark = features.sparkSession
    n_part = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    y = labels.select(F.col(id_col).alias("id"), F.col("y").cast("double"))
    feats = features.select("id", "h", F.col("x").cast("double"))
    if intercept:
        feats = feats.unionByName(
            y.select(
                "id", F.lit(INTERCEPT).cast("long").alias("h"), F.lit(1.0).alias("x")
            )
        )
    feats = feats.repartition(n_part, "id").persist()
    y = y.repartition(n_part, "id").persist()
    n = float(y.count())
    if n == 0:
        raise ValueError("labels is empty")
    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    meta = ckpt.latest() if (ckpt and resume) else None
    start = 0
    if meta is not None:
        start = int(meta["extra"]["it"])
        if start > iters:
            raise ValueError(
                f"checkpoint at step {start} is past the requested iters={iters}; "
                "pass a larger iters to extend training or a fresh checkpoint_dir"
            )
        w = ckpt.load(meta)["w"]
    else:
        w = truncate_lineage(
            feats.select("h").distinct().withColumn("weight", F.lit(0.0))
        )
    for it in range(start, iters):
        margins = (
            feats.join(F.broadcast(w), "h")
            .groupBy("id")
            .agg(F.sum(F.col("x") * F.col("weight")).alias("m"))
        )
        resid = y.join(margins, "id", "left").select(
            "id",
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce("m", F.lit(0.0))))
                - F.col("y")
            ).alias("r"),
        )
        grad = (
            feats.join(resid, "id")
            .groupBy("h")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(n)).alias("g"))
        )
        w = truncate_lineage(
            w.join(grad, "h", "left").select(
                "h",
                (
                    F.col("weight")
                    - F.lit(float(lr))
                    * (F.coalesce("g", F.lit(0.0)) + F.lit(float(l2)) * F.col("weight"))
                ).alias("weight"),
            )
        )
        if ckpt and checkpoint_every and (it + 1) % checkpoint_every == 0:
            ckpt.commit(it + 1, {"w": w}, extra={"it": it + 1})
    feats.unpersist()
    y.unpersist()
    return w


def logreg_score(
    features: DataFrame,
    weights: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame(id, score): σ(w·x) per document. ``docs`` (optional,
    any frame with ``id_col``) pins the output id set so featureless
    documents still appear at σ(intercept-only margin); without it the
    ids present in ``features`` are scored. The intercept contributes
    automatically when ``weights`` carries bucket −1 (every document
    implicitly has that feature at 1.0)."""
    ids = (
        docs.select(F.col(id_col).alias("id")).distinct()
        if docs is not None
        else features.select("id").distinct()
    )
    margins = (
        features.filter(F.col("h") != INTERCEPT)
        .join(F.broadcast(weights), "h")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("m"))
    )
    b = weights.filter(F.col("h") == INTERCEPT).agg(
        F.coalesce(F.sum("weight"), F.lit(0.0)).alias("_b")
    )
    return (
        ids.join(margins, "id", "left")
        .crossJoin(F.broadcast(b))
        .select(
            F.col("id").alias(id_col),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.coalesce("m", F.lit(0.0)) + F.col("_b"))))
            ).alias("score"),
        )
    )


def softmax_train(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
    intercept: bool = True,
    partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> DataFrame:
    """Multi-class (softmax) generalization of :func:`logreg_train` —
    the fastText-supervised shape of web-pipeline LANGUAGE-ID and
    domain classifiers (Joulin et al. 2017; CCNet's lang-id stage):
    one weight per (hash bucket, class), cross-entropy full-batch GD
    run as dataflow. Returns DataFrame(h, cls, weight).

    ``labels``: (id_col, label_col) with arbitrary class values
    (cast to string); the class set is taken from the labels.

    Per step (N = |labels|):

        logits   features ⋈(broadcast) weights → per-(doc, cls) sum
        softmax  exp(logit − per-doc max) / per-doc sum  (stable)
        resid    p_dc − 1[y_d = c]
        grad     features ⋈ resid → per-(bucket, cls) sum / N + l2·w
        update   w ← w − lr·grad

    Plan shape: the feature table is cached doc-partitioned once and
    never moves; the model (n_buckets·K rows) broadcasts; the only
    per-iteration shuffles are the (doc, cls) logit sum and the
    (bucket, cls) gradient sum, both map-side combined. The weight
    frame rides a parquet lineage cut per iteration, with optional
    PeelCheckpoint durable commits (same resume contract as
    logreg_train). Docs absent from ``features`` (tokenless) carry
    only the intercept row, exactly like the binary trainer.

    Deterministic and engine-portable: no sampling, plain float64
    sums; the driver contract replays trained weights value-exactly
    in unrolled DuckDB SQL (same stable-softmax operand order)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")
    spark = features.sparkSession
    n_part = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    y = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("string").alias("y")
    )
    classes = y.select(F.col("y").alias("cls")).distinct()
    feats = features.select("id", "h", F.col("x").cast("double"))
    if intercept:
        feats = feats.unionByName(
            y.select(
                "id", F.lit(INTERCEPT).cast("long").alias("h"), F.lit(1.0).alias("x")
            )
        )
    feats = feats.repartition(n_part, "id").persist()
    y = y.repartition(n_part, "id").persist()
    n = float(y.count())
    if n == 0:
        raise ValueError("labels is empty")
    ckpt = PeelCheckpoint(checkpoint_dir, spark) if checkpoint_dir else None
    meta = ckpt.latest() if (ckpt and resume) else None
    start = 0
    if meta is not None:
        start = int(meta["extra"]["it"])
        if start > iters:
            raise ValueError(
                f"checkpoint at step {start} is past the requested iters={iters}; "
                "pass a larger iters to extend training or a fresh checkpoint_dir"
            )
        w = ckpt.load(meta)["w"]
    else:
        w = truncate_lineage(
            feats.select("h").distinct().crossJoin(classes)
            .withColumn("weight", F.lit(0.0))
        )
    for it in range(start, iters):
        logits = (
            feats.join(F.broadcast(w), "h")
            .groupBy("id", "cls")
            .agg(F.sum(F.col("x") * F.col("weight")).alias("m"))
        )
        # stable softmax: subtract the per-doc max logit before exp
        mx = logits.groupBy("id").agg(F.max("m").alias("_mx"))
        probs = logits.join(mx, "id").select(
            "id", "cls", F.exp(F.col("m") - F.col("_mx")).alias("e")
        )
        tot = probs.groupBy("id").agg(F.sum("e").alias("z"))
        resid = (
            probs.join(tot, "id")
            .join(y, "id")
            .select(
                "id",
                "cls",
                (
                    F.col("e") / F.col("z")
                    - F.when(F.col("cls") == F.col("y"), 1.0).otherwise(0.0)
                ).alias("r"),
            )
        )
        grad = (
            feats.join(resid, "id")
            .groupBy("h", "cls")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(n)).alias("g"))
        )
        w = truncate_lineage(
            w.join(grad, ["h", "cls"], "left").select(
                "h",
                "cls",
                (
                    F.col("weight")
                    - F.lit(float(lr))
                    * (F.coalesce("g", F.lit(0.0)) + F.lit(float(l2)) * F.col("weight"))
                ).alias("weight"),
            )
        )
        if ckpt and checkpoint_every and (it + 1) % checkpoint_every == 0:
            ckpt.commit(it + 1, {"w": w}, extra={"it": it + 1})
    feats.unpersist()
    y.unpersist()
    return w


def softmax_score(
    features: DataFrame,
    weights: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame(id, cls, prob): the softmax class distribution per
    document under ``weights`` (h, cls, weight). ``docs`` pins the id
    set so featureless documents still score (intercept-only logits —
    uniform if no intercept was trained). Argmax readout is
    ``prob``-then-``cls`` deterministic:
    ``softmax_predict`` below."""
    ids = (
        docs.select(F.col(id_col).alias("id")).distinct()
        if docs is not None
        else features.select("id").distinct()
    )
    classes = weights.select("cls").distinct()
    margins = (
        features.filter(F.col("h") != INTERCEPT)
        .join(F.broadcast(weights), "h")
        .groupBy("id", "cls")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("m"))
    )
    bias = weights.filter(F.col("h") == INTERCEPT).select(
        "cls", F.col("weight").alias("_b")
    )
    logits = (
        ids.crossJoin(classes)
        .join(margins, ["id", "cls"], "left")
        .join(F.broadcast(bias), "cls", "left")
        .select(
            "id",
            "cls",
            (F.coalesce("m", F.lit(0.0)) + F.coalesce("_b", F.lit(0.0))).alias("m"),
        )
    )
    mx = logits.groupBy("id").agg(F.max("m").alias("_mx"))
    e = logits.join(mx, "id").select(
        "id", "cls", F.exp(F.col("m") - F.col("_mx")).alias("e")
    )
    z = e.groupBy("id").agg(F.sum("e").alias("z"))
    return e.join(z, "id").select(
        "id", "cls", (F.col("e") / F.col("z")).alias("prob")
    )


def softmax_predict(
    features: DataFrame,
    weights: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame(id, pred, prob): deterministic argmax readout of
    :func:`softmax_score` (max prob, ties to the lexicographically
    smallest class — a map-side-combinable min_by, no per-doc
    window)."""
    s = softmax_score(features, weights, docs, id_col)
    return s.groupBy("id").agg(
        F.expr("min_by(cls, struct(-prob, cls))").alias("pred"),
        F.max("prob").alias("prob"),
    )
