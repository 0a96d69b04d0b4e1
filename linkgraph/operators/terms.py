"""Corpus term statistics: TF-IDF top terms per group and exact
per-group quantiles — the calibration/reporting aggregates a corpus
pipeline runs before setting filter thresholds.

Both are single-plan Catalyst aggregations over the portable
tokenizer (functions/text.py): no Python, no driver loop. TF-IDF's
term explode shuffles on the term string (uniform; stopword-hot
VALUES are tamed by map-side partial aggregation), the per-group
top-k is a bounded window over each group's term rows.

Reference scope: networkx-rust has no text surface; these serve the
training-pipeline inventory (SURVEY §2.8b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.functions.text import tokens_col


def tfidf_top_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
    min_term_len: int = 2,
) -> DataFrame:
    """DataFrame(group, term, tf, df_groups, tfidf, pos): the top-k
    terms of each group by smoothed TF-IDF.

    tf = term occurrences within the group (with multiplicity);
    df_groups = number of groups containing the term; tfidf =
    tf · (ln((1 + N) / (1 + df_groups)) + 1) — the smoothed sklearn
    formulation with groups as documents. Ties break by term string
    ascending (deterministic across engines); terms shorter than
    ``min_term_len`` are dropped (single letters carry no signal).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    toks = df.select(
        F.col(group_col).alias("group"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.length("term") >= min_term_len)
    tf = toks.groupBy("group", "term").agg(F.count("*").alias("tf"))
    n_groups = df.select(group_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_groups"))
    scored = tf.join(dfreq, "term").select(
        "group",
        "term",
        "tf",
        "df_groups",
        (
            F.col("tf")
            * (
                F.log((F.lit(1.0) + n_groups) / (F.lit(1.0) + F.col("df_groups")))
                + F.lit(1.0)
            )
        ).alias("tfidf"),
    )
    # two-level top-k: a naive Window.partitionBy(group) funnels a
    # group's ENTIRE vocabulary through one task — salt first, take k
    # per (group, salt), then rank the ≤ 16k survivors per group
    salt = (F.xxhash64("term") % 16).alias("_s")
    w_local = Window.partitionBy("group", "_s").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    pre = (
        scored.withColumn("_s", salt)
        .withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= k)
    )
    w = Window.partitionBy("group").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        pre.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("group", "term", "tf", "df_groups", "tfidf", "pos")
    )


def entropy_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DataFrame(doc_id, n_tokens, word_entropy, bigram_entropy):
    per-document Shannon entropies — the cheap perplexity proxy a
    corpus pipeline uses to flag degenerate text (low entropy =
    repetitive/templated, suspiciously high = random noise) before
    paying for model-based scoring.

    word_entropy is over the portable tokenizer's unigram
    distribution; bigram_entropy over raw character bigrams (captures
    within-word degeneracy that token stats miss). Both are plain
    explode + two aggregations — no Python, shuffles keyed on doc_id
    (uniform), per-doc term counts bounded by doc length. Documents
    with no tokens (or fewer than 2 chars) get 0.0, matching the
    single-symbol case exactly: -(1/1)·log2(1) = 0."""
    base = df.select(F.col(id_col).alias("doc_id"))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    n = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    frac = F.col("c") / F.col("n")
    went = (
        cnt.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.sum(-frac * F.log2(frac)).alias("word_entropy"),
        )
    )
    bg = (
        df.filter(F.length(text_col) >= 2)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.length(text_col).cast("long") - 1)
            ).alias("p"),
            F.col(text_col).alias("_t"),
        )
        .select("doc_id", F.col("_t").substr(F.col("p"), F.lit(2)).alias("bgr"))
    )
    bcnt = bg.groupBy("doc_id", "bgr").agg(F.count("*").alias("c"))
    bn = bcnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    bent = (
        bcnt.join(bn, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(-frac * F.log2(frac)).alias("bigram_entropy"))
    )
    return (
        base.join(went, "doc_id", "left")
        .join(bent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("word_entropy", F.lit(0.0)).alias("word_entropy"),
            F.coalesce("bigram_entropy", F.lit(0.0)).alias("bigram_entropy"),
        )
    )


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """DataFrame(group, n, p<NN>…): exact (continuous-interpolation)
    per-group percentiles of a numeric column — the calibration step
    before turning a quality score into a filter threshold. Exact
    `percentile`, not approx_percentile: the result is deterministic
    and engine-portable (matches DuckDB's quantile_cont), at the cost
    of a per-group sort — the right trade for calibration runs, which
    aggregate to a handful of groups. For always-on monitoring over
    huge groups swap in approx_percentile and drop the oracle claim.
    """
    exprs = [F.count("*").alias("n")] + [
        F.expr(f"percentile({value_col}, {p})").alias(f"p{int(p * 100):02d}")
        for p in percentiles
    ]
    return df.groupBy(F.col(group_col).alias("group")).agg(*exprs)


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
    min_df: int = 1,
    max_postings: int = 20,
) -> DataFrame:
    """DataFrame(term, df, cf, postings): the champion-list inverted
    index of a corpus — per term its document frequency (exact),
    collection frequency (exact), and the first ``max_postings``
    doc ids ascending as a comma-joined string (the bounded posting
    prefix search engines keep hot; full postings live in the
    (doc_id, term, tf) frame this derives from).

    Scale shape: the tokenize/explode fans out map-side; the per-doc
    tf groupBy and the per-term aggregation both map-side combine.
    The posting-list truncation is the hub hazard — a stopword term
    appears in EVERY document, and collecting its full posting list
    into one aggregation cell is O(corpus). So the prefix is built
    two-level, like tfidf's salted top-k: smallest ``max_postings``
    ids per (term, salt) first, then the ≤ 16·max_postings survivors
    merge per term — every cell stays O(max_postings), whatever the
    term's df.
    """
    if max_postings <= 0:
        raise ValueError("max_postings must be positive")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.length("term") >= min_term_len)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    per_term = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    k = int(max_postings)
    lvl1 = (
        tf.withColumn("_s", F.xxhash64("doc_id") % 16)
        .groupBy("term", "_s")
        .agg(F.slice(F.sort_array(F.collect_list("doc_id")), 1, k).alias("ids"))
    )
    lvl2 = lvl1.groupBy("term").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("ids"))), 1, k).alias("ids")
    )
    return (
        per_term.join(lvl2, "term")
        .filter(F.col("df") >= min_df)
        .select(
            "term",
            "df",
            "cf",
            F.array_join(
                F.transform(F.col("ids"), lambda x: x.cast("string")), ","
            ).alias("postings"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """DataFrame(w1, w2, pair_count, pmi): pointwise mutual
    information of adjacent token pairs across the corpus — the
    collocation-detection primitive (tokenizer-merge candidates,
    multi-word-expression mining) of a training-data pipeline.

    pmi = ln(P(w1,w2) / (P(w1)·P(w2))) with P from corpus counts
    (pairs over total bigrams, unigrams over total tokens). Bigrams
    never cross document boundaries. Only pairs with
    ``pair_count >= min_count`` are kept — rare-pair PMI is noise and
    the threshold also bounds the output. Plan: one tokenize +
    in-row zip (no self-join for adjacency), two map-side-combined
    count aggregations, one broadcastable scalar row of totals.
    """
    toks = df.select(tokens_col(F.col(text_col)).alias("t"))
    # adjacent pairs built inside the row: no positional self-join
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    totals = uni.agg(F.sum("c").alias("n_tokens"))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    n_bigrams = bi.agg(F.sum("pair_count").alias("n_bigrams"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        # no broadcast hint on the unigram-count side: c1/c2 are
        # VOCABULARY-sized (billions of distinct tokens on a web
        # corpus) — AQE broadcasts when they fit, shuffles on the
        # (uniform) token key otherwise. The two 1-row totals stay
        # explicit broadcasts.
        bi.filter(F.col("pair_count") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_bigrams))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") * 1.0 * F.col("n_tokens") * F.col("n_tokens"))
                    / (F.col("n_bigrams") * 1.0 * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
) -> DataFrame:
    """DataFrame(id_col, n_bigrams, avg_logprob, perplexity): each
    document's perplexity under an add-k-smoothed bigram language
    model fit on ``train`` — the CCNet-style quality filter (Wenzek
    et al., LREC 2020 score documents with a KenLM model trained on
    a trusted slice; low perplexity ~ fluent in-domain text, high ~
    gibberish/boilerplate). A bigram LM over the portable tokenizer
    stands in for KenLM (not in this container) with the same
    pipeline shape and a closed-form, engine-portable definition.

    P(w2|w1) = (c2(w1,w2) + k) / (c1(w1) + k·V) with counts from
    ``train`` and V = distinct train tokens (unseen histories reduce
    to the uniform 1/V). avg_logprob = mean ln P over the document's
    adjacent token pairs (bigrams never cross documents);
    perplexity = exp(-avg_logprob). Documents with < 2 tokens carry
    NULLs (no bigram evidence, kept so the filter join is total).

    Plan shape (10^12 docs): one tokenize + in-row zip per side (the
    pmi_collocations adjacency trick — no positional self-join), two
    map-side-combined count aggregations over ``train``, then two
    hash joins keyed on the (uniform) gram strings; the counts tables
    are vocabulary-sized, so no broadcast hint — AQE broadcasts small
    LMs and shuffles web-sized ones. No Python anywhere.
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")

    def bigrams(df, *keep):
        t = df.select(*keep, tokens_col(F.col(text_col)).alias("t"))
        return t.select(
            *keep,
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
                )
            ).alias("p"),
        ).select(*keep, "p.w1", "p.w2")

    train_toks = train.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
    uni = train_toks.groupBy("w").agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count("*").cast("double").alias("v"))
    bi = bigrams(train).groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    doc_bi = bigrams(docs, id_col)
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(add_k)))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(add_k)) * F.col("v"))
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("lp").alias("avg_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            "n_bigrams",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )


def kn_trigram_perplexity(
    docs: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    add_k: float = 0.5,
) -> DataFrame:
    """DataFrame(id_col, n_trigrams, avg_logprob, perplexity): each
    document's perplexity under an interpolated Kneser-Ney TRIGRAM
    model fit on ``train`` — the KenLM-shaped upgrade of
    ``lm_perplexity``'s add-k bigram (Kneser & Ney, ICASSP 1995; Chen
    & Goodman, CSL 1999): absolute discounting at the top order, and
    CONTINUATION counts (type counts, "how many distinct contexts
    precede this gram") at the backoff orders, so frequent-but-
    context-narrow words ("Francisco") stop inflating the backoff.

    With D = ``discount``, counts from ``train``'s within-document
    trigrams (c3, h2 = Σ_w3 c3, a3 = distinct w3 after (w1,w2)),
    trigram-TYPE continuation counts (t2(w2,w3) = distinct w1,
    n2(w2) = Σ_w3 t2, n3(w2) = distinct w3 after w2, t1(w3) =
    distinct w2, T = Σ_w3 t1) and V = distinct train tokens:

        P1(w3)       = (t1 + k) / (T + k·(V+1))
        P2(w3|w2)    = (max(t2-D, 0) + D·n3·P1) / n2   [n2=0 → P1]
        P3(w3|w1,w2) = (max(c3-D, 0) + D·a3·P2) / h2   [h2=0 → P2]

    Each level sums to exactly 1 over the vocabulary plus one unseen
    slot (the add-k floor at the bottom keeps every word strictly
    positive, KenLM's <unk> role), so perplexities are comparable
    across documents with different OOV rates. avg_logprob = mean
    ln P3 over the document's within-document trigrams; documents
    with < 3 tokens carry NULLs (kept so the filter join is total).

    Plan shape (10^12 docs): one tokenize + in-row zip per side, four
    map-side-combined count aggregations over ``train`` (each keyed
    on a gram, never a doc), then five hash joins against gram-keyed
    count tables — vocabulary-sized, so AQE broadcasts small LMs and
    shuffles web-sized ones. No Python anywhere.
    """
    if not 0.0 <= discount < 1.0:
        raise ValueError(f"discount must be in [0, 1), got {discount}")
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    D = float(discount)
    k = float(add_k)

    def trigrams(df, *keep):
        t = df.select(*keep, tokens_col(F.col(text_col)).alias("t"))
        return t.select(
            *keep,
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 2, 0)),"
                    " (x, i) -> struct(x AS w1, t[i + 1] AS w2, t[i + 2] AS w3))"
                )
            ).alias("p"),
        ).select(*keep, "p.w1", "p.w2", "p.w3")

    tri = trigrams(train).groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    hist = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("h2"), F.count("*").alias("a3")
    )
    t2 = tri.groupBy("w2", "w3").agg(F.count("*").alias("t2"))
    lvl2 = t2.groupBy("w2").agg(F.sum("t2").alias("n2"), F.count("*").alias("n3"))
    t1 = t2.groupBy("w3").agg(F.count("*").alias("t1"))
    scalars = t2.agg(F.count("*").cast("double").alias("tt")).crossJoin(
        train.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").cast("double").alias("v"))
    )

    doc_tri = trigrams(docs, id_col)
    p1 = (F.coalesce(F.col("t1"), F.lit(0)) + F.lit(k)) / (
        F.col("tt") + F.lit(k) * (F.col("v") + 1)
    )
    p2 = F.when(
        F.col("n2").isNull(), p1
    ).otherwise(
        (
            F.greatest(F.coalesce(F.col("t2"), F.lit(0)) - F.lit(D), F.lit(0.0))
            + F.lit(D) * F.col("n3") * p1
        )
        / F.col("n2")
    )
    p3 = F.when(
        F.col("h2").isNull(), p2
    ).otherwise(
        (
            F.greatest(F.coalesce(F.col("c3"), F.lit(0)) - F.lit(D), F.lit(0.0))
            + F.lit(D) * F.col("a3") * p2
        )
        / F.col("h2")
    )
    scored = (
        doc_tri.join(tri, ["w1", "w2", "w3"], "left")
        .join(hist, ["w1", "w2"], "left")
        .join(t2, ["w2", "w3"], "left")
        .join(lvl2, ["w2"], "left")
        .join(t1, ["w3"], "left")
        .crossJoin(F.broadcast(scalars))
        .select(id_col, F.log(p3).alias("lp"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_trigrams"), F.avg("lp").alias("avg_logprob"))
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            "n_trigrams",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """DataFrame(query_id, doc_id, score, rank): Okapi BM25 top-k
    retrieval (Robertson & Walker, SIGIR'94) — the lexical ranking
    behind retrieval-based decontamination and nearest-neighbor text
    lookup over a training corpus.

    score(q, d) = Σ_{t ∈ distinct(q) ∩ d} idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·len_d/avgdl)) with the non-negative idf
    ln(1 + (N − df + ½)/(df + ½)); N = |docs|, avgdl over ALL docs
    (tokenless docs count with length 0). Query terms enter once
    (bag-of-words query, no query-tf component). Scores are rounded
    to 6 decimals BEFORE ranking and ties break on ascending doc id,
    so the top-k set is deterministic across engines and runs.

    Plan shape (10^12 docs, few queries): the term equi-join IS the
    inverted index — no index structure is materialized; candidates
    fan out only for docs sharing a query term. The per-query top-k
    is the salted two-level pattern (smallest k per (query, salt),
    then the ≤16k survivors merge), so a stopword query that matches
    the whole corpus never concentrates one aggregation cell.
    """
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    lens = ids.join(
        toks.groupBy("doc_id").agg(F.count("*").alias("dl")), "doc_id", "left"
    ).select("doc_id", F.coalesce("dl", F.lit(0)).alias("dl"))
    scalars = lens.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(tokens_col(F.col(query_text_col))).alias("term"),
    ).distinct()
    part = (
        F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        qterms.join(
            dfreq.crossJoin(F.broadcast(scalars)).select(
                "term",
                "avgdl",
                F.log(
                    1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ).alias("idf"),
            ),
            "term",
        )
        .join(tf, "term")
        .join(lens, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(part), 6).alias("score"))
    )
    k = int(top_k)
    lvl1 = (
        scored.withColumn("_s", F.xxhash64("doc_id") % 16)
        .groupBy("query_id", "_s")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct((-F.col("score")).alias("ns"), F.col("doc_id"))
                    )
                ),
                1,
                k,
            ).alias("c")
        )
    )
    return (
        lvl1.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))), 1, k
            ).alias("c")
        )
        .select("query_id", F.posexplode("c").alias("pos", "e"))
        .select(
            "query_id",
            F.col("e.doc_id").alias("doc_id"),
            (-F.col("e.ns")).alias("score"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
    )
