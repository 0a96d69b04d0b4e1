"""Deterministic corpus sampling and splitting for training-data
mixing — per-stratum Bernoulli sampling and train/val/test hash
splits.

Both operators are pure narrow column expressions over the portable
md5-derived 60-bit hash (functions/text.md5int_col): no shuffle, no
RNG state, no driver coordination. A row's fate depends only on
(id, seed), so the SAME rows survive at any parallelism, partition
layout or cluster size — the property a 100 TB mixing job actually
needs (re-runs, backfills and per-shard retries all agree), and the
property `df.sample()` (partition-seeded XORShift) does not give.
The sampling predicate sits directly above the parquet scan, so
column pruning and (for partition-column strata) partition pruning
still apply; downstream sees an ordinary filtered frame.

Reference scope note: networkx-rust has no corpus operators; these
serve the training-pipeline surface (SURVEY §2.8b) next to dedup/
text-stats, matching the engines the reference's users feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import md5int_col

# sampling resolution: rates are quantized to 1/DENOM. 60-bit hash
# mod 1e6 is uniform to ~1e-12 bias — far below sampling noise.
DENOM = 1_000_000


def _bucket(id_col: Column, seed: int) -> Column:
    """Uniform bucket in [0, DENOM) from row id + seed, identical in
    Spark and ANSI SQL (md5 hex → 60-bit int → mod)."""
    return md5int_col(F.concat(id_col.cast("string"), F.lit(f":{seed}"))) % DENOM


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep fraction in [0, 1]; strata not
    listed keep ``default_rate``. Selection is per-row Bernoulli on
    the (id, seed) hash bucket, so expected per-stratum counts are
    rate·n with binomial noise, and the selected id set is stable
    across runs, partitionings and engines. Changing ``seed`` draws an
    independent sample; nested rates with the same seed nest the
    samples (a 10% sample contains the 5% sample), which is how
    training-data ablation subsets stay comparable.
    """
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = F.lit(int(round(default_rate * DENOM)))
    for value, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == F.lit(value), F.lit(int(round(rate * DENOM))))
            .otherwise(threshold)
        )
    return df.filter(_bucket(F.col(id_col), seed) < threshold)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash bucket.

    ``weights`` maps split name → fraction; fractions must sum to 1
    (±1/DENOM). Buckets are carved into consecutive ranges in sorted
    split-name order, so the assignment is a total, disjoint,
    deterministic function of (id, seed) — holdout rows never migrate
    between runs or cluster sizes, and the train split at weight w
    equals ``stratified_sample`` at rate w with the same seed when
    its range starts at bucket 0.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = sum(weights.values())
    if abs(total - 1.0) > 1.0 / DENOM:
        raise ValueError(f"split weights must sum to 1, got {total}")
    expr = None
    hi = 0
    bucket = _bucket(F.col(id_col), seed)
    names = sorted(weights)
    for name in names[:-1]:
        hi += int(round(weights[name] * DENOM))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def negative_edges(
    graph,
    per_node: int = 5,
    trials_factor: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Deterministic negative sampling for link-prediction/GNN
    training: DataFrame(src, dst, rank) of up to ``per_node``
    NON-adjacent vertices per source, drawn by a counter hash —
    reproducible bit-for-bit across runs, partitionings and cluster
    sizes (the same property stratified_sample gives rows).

    Draw t of vertex u proposes the vertex at dense index
    md5(seed:u:t) mod n (the distributed high-bit-bucket index, no
    global window); self-pairs and real edges (both orientations on
    undirected graphs) are anti-joined out, duplicate draws collapse
    to their first trial, and the ``per_node`` survivors with the
    lowest trial numbers win. ``trials_factor`` oversamples to cover
    collision/adjacency losses; near-complete-neighborhood vertices
    can yield fewer than ``per_node`` rows (sparse web graphs never
    hit this).

    Scale shape: V·trials candidate rows, one equi-join on the dense
    index (uniform by construction), one anti-join on the edge key,
    one per-source window over ≤ trials rows. No quadratic set, no
    driver loop.
    """
    from linkgraph.operators.layout import _indexed
    from pyspark.sql import Window

    if per_node <= 0 or trials_factor <= 0:
        raise ValueError("per_node and trials_factor must be positive")
    v_idx = _indexed(graph.vertices)
    n = graph.vertices.count()
    if n < 2:
        return graph.edges.sparkSession.createDataFrame(
            [], "src long, dst long, rank int"
        )
    trials = per_node * trials_factor
    cand = (
        v_idx.select(F.col("id").alias("src"))
        .withColumn("t", F.explode(F.sequence(F.lit(0), F.lit(trials - 1))))
        .withColumn(
            "i",
            md5int_col(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("t").cast("string"),
                )
            )
            % n,
        )
    )
    cand = (
        cand.join(v_idx.select(F.col("i"), F.col("id").alias("dst")), "i")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "t")
    )
    probe = (graph.edges if graph.directed else graph.sym_edges).select(
        "src", "dst"
    ).distinct()
    cand = (
        cand.join(probe, ["src", "dst"], "left_anti")
        .groupBy("src", "dst")
        .agg(F.min("t").alias("t"))
    )
    w = Window.partitionBy("src").orderBy("t", "dst")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_node)
        .select("src", "dst", "rank")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k
    rows with the largest Efraimidis–Spirakis priorities
    u^(1/w), u = uniform hash of (id, seed) — each row's inclusion
    probability is proportional to its weight, the standard one-pass
    distributed weighted reservoir (A-Res, public). Zero/negative
    weights never win (priority 0).

    Same determinism contract as the other samplers: the survivor
    set depends only on (id, seed, weights), not parallelism. The
    top-k is TakeOrdered (per-partition heads + driver merge), never
    a full sort shuffle. The priority is rounded to 9 decimals with
    an id tiebreak so the selection replays bit-identically in ANSI
    SQL (pow last-ulp differences sit ~7 orders below the rounding
    step). Output: the sampled rows + ``wkey`` (rounded priority)."""
    u = (
        md5int_col(
            F.concat(F.col(id_col).cast("string"), F.lit(f":w:{seed}"))
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**60))  # u in (0, 1]: +1 avoids pow(0, ...) = 0 ties
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.pow(u, F.lit(1.0) / w)).otherwise(F.lit(0.0))
    return (
        df.withColumn("wkey", F.round(key, 9))
        .orderBy(F.desc("wkey"), F.asc(id_col))
        .limit(int(k))
    )


def _hashed_gram_features(
    df: DataFrame, id_col: str | None, text_col: str, n_buckets: int
) -> DataFrame:
    """Hashed unigram+bigram bag-of-ngrams counts: (id?, h, c). The
    DSIR feature space — grams hash into ``n_buckets`` via the
    portable md5 hash, so both LM fitting and doc scoring run over
    bounded-width tables whatever the vocabulary."""
    from linkgraph.functions.text import tokens_col

    keep = [F.col(id_col).cast("long").alias("id")] if id_col else []
    t = df.select(*keep, tokens_col(F.col(text_col)).alias("t"))
    grams = t.select(
        *([F.col("id")] if id_col else []),
        F.explode(
            F.concat(
                F.col("t"),
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> x || ' ' || t[i + 1])"
                ),
            )
        ).alias("g"),
    )
    h = (md5int_col(F.col("g")) % n_buckets).alias("h")
    if id_col:
        return grams.select("id", h).groupBy("id", "h").agg(
            F.count("*").alias("c")
        )
    return grams.select(h).groupBy("h").agg(F.count("*").alias("c"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    add_k: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    Selection for Language Models via Importance Resampling", public
    paper): log w(doc) = Σ_features c_doc(h)·[ln p_target(h) −
    ln p_raw(h)] under add-k-smoothed hashed-ngram unigram LMs fit on
    the target (trusted, in-domain) and raw corpora. High log w =
    the document looks like the target distribution. Returns
    DataFrame(doc_id, n_feats, logw) — logw rounded to 9 so the score
    replays in SQL despite sum-order drift.

    Plan: tokenize + in-row bigram zip per side (no positional
    self-join), three map-side-combined count aggs (doc features,
    target LM, raw LM), then two hash joins keyed on the uniform
    hashed-feature id — LM tables are n_buckets-wide, so AQE
    broadcasts them when small and shuffles otherwise. Zero Python.
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    doc_f = _hashed_gram_features(raw, id_col, text_col, n_buckets)
    t_lm = _hashed_gram_features(target, None, text_col, n_buckets).withColumnRenamed(
        "c", "tc"
    )
    r_lm = _hashed_gram_features(raw, None, text_col, n_buckets).withColumnRenamed(
        "c", "rc"
    )
    t_tot = t_lm.agg(F.sum("tc").cast("double").alias("tt"))
    r_tot = r_lm.agg(F.sum("rc").cast("double").alias("rt"))
    k = float(add_k)
    lam = (
        F.log(
            (F.coalesce("tc", F.lit(0)) + F.lit(k))
            / (F.col("tt") + F.lit(k * n_buckets))
        )
        - F.log(
            (F.coalesce("rc", F.lit(0)) + F.lit(k))
            / (F.col("rt") + F.lit(k * n_buckets))
        )
    )
    return (
        doc_f.join(t_lm, "h", "left")
        .join(r_lm, "h", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * lam), 9).alias("logw"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    add_k: float = 0.5,
) -> DataFrame:
    """DSIR selection: sample ``k`` documents without replacement
    with inclusion odds ∝ importance weight, via the Gumbel-top-k
    trick the paper uses — key = log w + Gumbel(0,1), take the k
    largest. The Gumbel noise is a pure (id, seed) hash (same
    portable-hash discipline as stratified_sample), so the selected
    set is identical at any parallelism. Returns
    DataFrame(doc_id, logw, key, rank), rank 1..k by descending key.

    The top-k is a TakeOrdered (never a global sort) — right for k up
    to ~10^7; for resampling a constant FRACTION of a 10^12-doc
    corpus, filter on a key threshold from percentile_approx instead
    (exact DSIR semantics, approximate cut point).
    """
    w = dsir_weights(raw, target, id_col, text_col, n_buckets, add_k)
    m = 9007199254740992  # 2^53: exact-double modulus for u ∈ (0,1)
    u = (
        md5int_col(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))) % m
        + 0.5
    ) / m
    key = F.round(F.col("logw") - F.log(-F.log(u)), 6)
    top = (
        w.select(id_col, "logw", key.alias("key"))
        .orderBy(F.desc("key"), F.asc(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    # rank only the k selected rows — a bounded single-task window
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("key"), F.asc(id_col))
        ).cast("long"),
    )
