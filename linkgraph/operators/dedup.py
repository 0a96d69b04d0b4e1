"""Document deduplication at corpus scale — exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Everything is JVM-side column math over the portable md5-derived
60-bit hash (functions/text.md5int_col), so each stage is (a)
whole-stage-codegen'd and (b) exactly reproducible in ANSI SQL for
the DuckDB oracles. Scale shape:

- exact: one groupBy on a 64-bit fingerprint — the cheapest shuffle.
- MinHash/LSH: shingle explode (map-side), per-doc signature agg
  (one shuffle), band explode + bucket self-join (the candidate-pair
  shuffle is keyed by band hash, NOT doc id, so hot documents don't
  make hot partitions) — the standard sub-quadratic near-dup plan.
- SimHash: per-row column expression, zero shuffles until bucketing.
- n-gram Jaccard: exact verification on candidate pairs only (or
  all-pairs for small corpora / oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import doc_fingerprint_col, md5int_col, tokens_col

MERSENNE31 = 2_147_483_647  # minhash modulus; a*h + b stays < 2^62


def _mix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_j(x) = (a_j·x + b_j) mod P."""
    return [
        (1 + _mix64(seed * 1000 + j) % (MERSENNE31 - 1), _mix64(seed * 2000 + j) % MERSENNE31)
        for j in range(n_hashes)
    ]


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct token k-gram shingles per doc: (id, shingle).
    Docs shorter than k tokens yield no rows (sequence(1, n-k+1)
    would descend through slice(…, 0, …), which throws — the CaseWhen
    branch keeps short docs off that path; explode drops the empty
    array)."""
    toks = tokens_col(F.col(text_col))
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups by normalized-text fingerprint:
    (fingerprint, n_docs, keep_id) for groups with n_docs > 1;
    keep_id = min doc id (the canonical survivor)."""
    fp = df.select(F.col(id_col).alias("id"), doc_fingerprint_col(F.col(text_col)).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>): per-doc MinHash signature. One explode +
    one groupBy; the n_hashes mins are computed as parallel aggregate
    expressions over the exploded shingles (map-side combined)."""
    sh = shingles(df, id_col, text_col, shingle_k)
    h = (md5int_col(F.col("shingle")) % MERSENNE31).alias("h")
    base = sh.select("id", h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"mh{j}")
        for j, (a, b) in enumerate(minhash_params(n_hashes, seed))
    ]
    sig = base.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"mh{j}" for j in range(n_hashes)]).alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """(a, b) candidate pairs sharing ≥1 LSH band (a < b). Band key =
    the band's signature slice — the shuffle key, so skew follows
    band-collision rates, not document popularity."""
    n = len(signatures.select("sig").first()["sig"])
    rows = n // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(",", *[F.col("sig")[i * rows + r].cast("string") for r in range(rows)]).alias("key"),
            )
            for i in range(bands)
        ]
    )
    exploded = signatures.select("id", F.explode(band_structs).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → verify by
    signature agreement (estimated Jaccard): (a, b, est_jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, seed).persist()
    cands = lsh_candidate_pairs(sigs, bands)
    sa = sigs.select(F.col("id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ) / F.lit(float(n_hashes))
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (a, b, jaccard ≥
    threshold). With ``candidates`` (a DataFrame(a, b), e.g. LSH
    output) only those pairs are scored — the scale path: the work is
    |candidates| × shingles-per-doc, never corpus². Without it, an
    all-pairs shingle co-occurrence join — the labeled oracle mode
    for modest corpora."""
    sh = shingles(df, id_col, text_col, k).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    if candidates is not None:
        common = (
            candidates.select("a", "b")
            .join(a, "a")
            .join(b, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    else:
        common = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        common.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup CLUSTERS with one canonical survivor each — the step
    that decides which documents a training pipeline drops:
    (doc_id, canonical_id, is_duplicate), one row per input doc.

    Pipeline: MinHash signatures → banded LSH candidates → exact
    n-gram Jaccard verify (candidates only) → connected components
    over the verified-pair graph, run by the engine's own distributed
    WCC; the min-label component id IS the canonical (minimum) member
    id, so survivor selection is free. Transitive closure is
    deliberate: near-dup clusters chain (A≈B≈C with A̸≈C), and
    keeping one doc per chained cluster is the standard dedup
    semantics. Every stage is a bucketed join or label propagation —
    nothing is corpus²."""
    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import weakly_connected_components

    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, seed)
    cands = lsh_candidate_pairs(sigs, bands)
    verified = ngram_jaccard_pairs(
        df, id_col, text_col, k=shingle_k, threshold=threshold, candidates=cands
    )
    edges = verified.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
    )
    wcc = weakly_connected_components(LinkGraph(edges, directed=False)).state
    docs = df.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        docs.join(wcc, docs.doc_id == wcc.id, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("canonical_id"),
        )
        .withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_id"))
    )


def _pos_grams(df: DataFrame, host_col: str, id_col: str, text_col: str, k: int) -> tuple:
    """(base, grams): base = (host, id, t tokens array); grams =
    (host, id, s 0-based start, gram) — shared by the host-boilerplate
    detector and remover (same construction as
    remove_duplicated_spans, plus the host key)."""
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(host_col).alias("host"), F.col(id_col).alias("id"), toks.alias("t")
    )
    grams = base.select(
        "host",
        "id",
        F.posexplode(
            F.when(
                F.size("t") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, k)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("s", "gram"),
    )
    return base, grams


def host_boilerplate(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 2,
    min_frac: float = 0.5,
) -> DataFrame:
    """(host, gram, n_docs, doc_frac): token k-grams occurring in at
    least ``min_frac`` of a host's documents (and ≥ ``min_docs``
    absolutely) — template/boilerplate detection scoped to the host,
    the navigation/footer remover of web-corpus pipelines. Corpus-wide
    repeated-span stats (``duplicated_ngram_stats``) can't do this
    job: a host's template is often unique to the host (missed
    corpus-wide) while famous quotes repeat corpus-wide without
    being boilerplate anywhere (over-fired).

    Scale shape: one map-side gram explode, one (host, gram)-keyed
    distinct+count (hot template VALUES combine map-side), one join
    against the per-host doc-count agg. No pairwise anything.
    ``doc_frac`` rounds to 6 dp (SQL-replayable thresholding).
    """
    _, grams = _pos_grams(df, host_col, id_col, text_col, k)
    host_docs = df.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(id_col).alias("hd")
    )
    return (
        grams.select("host", "id", "gram")
        .distinct()
        .groupBy("host", "gram")
        .agg(F.count("*").alias("n_docs"))
        .join(host_docs, "host")
        .withColumn("doc_frac", F.round(F.col("n_docs") / F.col("hd"), 6))
        .filter((F.col("n_docs") >= min_docs) & (F.col("doc_frac") >= min_frac))
        .select("host", "gram", "n_docs", "doc_frac")
    )


def remove_host_boilerplate(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 2,
    min_frac: float = 0.5,
) -> DataFrame:
    """Excise every token covered by a host-boilerplate k-gram
    (``host_boilerplate``'s flag set) and re-join the survivors:
    (id, n_tokens, n_removed, clean_text) — the remove_duplicated_
    spans rebuild, scoped per host. Pure Catalyst throughout."""
    base, grams = _pos_grams(df, host_col, id_col, text_col, k)
    flagged = host_boilerplate(
        df, host_col, id_col, text_col, k, min_docs, min_frac
    ).select("host", "gram")
    starts = (
        grams.join(flagged, ["host", "gram"], "left_semi")
        .select("id", "s")
        .distinct()
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
    )
    joined = base.join(starts, "id", "left").withColumn(
        "ss", F.coalesce("ss", F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.transform(F.col("t"), lambda w, i: F.struct(w.alias("w"), i.alias("i"))),
        lambda x: ~F.exists(
            F.col("ss"), lambda s: (s <= x["i"]) & (x["i"] < s + k)
        ),
    )
    return joined.select(
        "id",
        F.size("t").cast("long").alias("n_tokens"),
        (F.size("t") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(F.transform(kept, lambda x: x["w"]), " ").alias("clean_text"),
    )


def simhash_col(text, bits: int = 16):
    """Per-row SimHash over token hashes: bit i set iff a strict
    majority of tokens have bit i set in their md5int hash. Pure
    column expression — no shuffle."""
    toks = tokens_col(text)
    n = F.size(toks)
    hashes = F.transform(toks, lambda t: md5int_col(t))
    acc = F.lit(0).cast("long")
    for i in range(bits):
        hits = F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << i)) != 0))
        acc = acc + F.when(hits * 2 > n, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return acc


def simhash_duplicates(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Docs sharing a SimHash bucket: (simhash, n_docs, keep_id)."""
    s = df.select(F.col(id_col).alias("id"), simhash_col(F.col(text_col), bits).alias("simhash"))
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 48,
    k: int = 3,
) -> DataFrame:
    """All document pairs whose ``bits``-bit SimHashes differ in at
    most ``k`` bits (Manku, Jain & Das Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW'07) — the web-crawl
    near-dup detector that catches boilerplate edits exact-bucket
    ``simhash_duplicates`` misses.

    Pigeonhole candidate generation: split the fingerprint into
    ``k+1`` disjoint bit-blocks; two fingerprints within Hamming
    distance k MUST agree exactly on at least one block, so the
    candidate set is a (block_idx, block_bits) equi-self-join —
    never all-pairs. Verification is exact:
    ``bit_count(a XOR b) <= k`` on the joined row. The result is
    therefore EXACTLY the Hamming-ball pairs (the blocking is
    recall-lossless, unlike MinHash bands), which is what the
    all-pairs DuckDB oracle checks.

    Scale shape: the shuffle key is the block value, not the doc id,
    so hub documents don't make hot partitions; a bucket of b docs
    sharing one block costs b² verify rows — the same within-bucket
    quadratic every LSH scheme carries, bounded in practice because
    agreeing on bits/(k+1) fingerprint bits is rare for non-dups
    (Manku §3: table sizes stay near-linear at 8B docs with
    bits=64, k=3). Returns (id_a, id_b, hamming), id_a < id_b.

    ``bits`` must be ≤ 60 (the portable md5int hash width) and
    > k so every block is non-empty.
    """
    if not (k < bits <= 60):
        raise ValueError(f"need k < bits <= 60, got bits={bits} k={k}")
    nblocks = k + 1
    widths = [bits // nblocks + (1 if i < bits % nblocks else 0) for i in range(nblocks)]
    s = df.select(
        F.col(id_col).alias("id"),
        simhash_col(F.col(text_col), bits).alias("simhash"),
    )
    blocks, lo = [], 0
    for i, w in enumerate(widths):
        blocks.append(
            F.struct(
                F.lit(i).alias("b"),
                F.shiftright("simhash", lo).bitwiseAND(F.lit((1 << w) - 1)).alias("v"),
            )
        )
        lo += w
    e = s.select("id", "simhash", F.explode(F.array(*blocks)).alias("blk")).select(
        "id", "simhash", F.col("blk.b").alias("b"), F.col("blk.v").alias("v")
    )
    return (
        e.alias("x")
        .join(e.alias("y"), ["b", "v"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    k: int = 5,
    threshold: float = 0.2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per-training-doc overlap of distinct
    token k-grams against an eval/benchmark corpus —
    (id, n_ngrams, contaminated_ngrams, contamination, flagged).

    ``contamination`` = |doc k-grams ∩ benchmark k-grams| / |doc
    k-grams| (0.0 for docs shorter than k tokens); ``flagged`` =
    contamination >= threshold. This is the standard n-gram-collision
    decontamination pass of LLM training pipelines, expressed as one
    map-side shingle explode per corpus plus one join.

    Scale shape: eval sets are tiny next to a training corpus, so the
    distinct benchmark k-gram set is broadcast by default — the
    training side then never shuffles on the k-gram, only on doc id
    for the final per-doc counts. Set ``broadcast_benchmark=False``
    for a large benchmark side: the overlap join becomes a shuffle
    keyed by the k-gram string (uniformly distributed — no hot-doc
    skew), still sub-quadratic.
    """
    bench_id = bench_id_col or id_col
    bench_text = bench_text_col or text_col
    train_sh = shingles(docs, id_col, text_col, k)
    bench_sh = shingles(benchmark, bench_id, bench_text, k).select("shingle").distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    sizes = train_sh.groupBy("id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        train_sh.join(bench_sh, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("contaminated_ngrams"))
    )
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    return (
        all_ids.join(sizes, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("contaminated_ngrams", F.lit(0)).alias("contaminated_ngrams"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.coalesce("contaminated_ngrams", F.lit(0)) / F.col("n_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
            (
                F.when(
                    F.coalesce("n_ngrams", F.lit(0)) > 0,
                    F.coalesce("contaminated_ngrams", F.lit(0)) / F.col("n_ngrams"),
                ).otherwise(F.lit(0.0))
                >= threshold
            ).alias("flagged"),
        )
    )


def duplicated_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Cross-document exact-substring duplication signal:
    (id, n_ngrams, dup_ngrams, dup_frac) where a doc's distinct token
    k-gram counts as duplicated when the SAME k-gram occurs in at
    least one other document — the corpus-level repeated-span measure
    behind suffix-array training-data dedup (Lee et al.), computed at
    k-gram granularity. Docs shorter than k tokens report 0/0/0.0.

    Scale shape: one map-side shingle explode, one groupBy keyed on
    the k-gram string (uniformly distributed — boilerplate k-grams
    are hot VALUES but partial aggregation combines them map-side),
    one semi-join back and one per-doc count. No pairwise expansion
    anywhere: cost is linear in total shingle volume regardless of
    how many documents share a span.
    """
    sh = shingles(df, id_col, text_col, k)
    shared = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        sh.join(shared, "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("dup_ngrams"))
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(sizes, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).alias("dup_ngrams"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.coalesce("dup_ngrams", F.lit(0)) / F.col("n_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    the MOSS algorithm): DataFrame(id, fp, pos) — from the sequence
    of token k-gram hashes, each sliding window of ``window``
    consecutive hashes contributes its minimum (rightmost on ties),
    deduplicated per document. Guarantees at least one shared
    fingerprint for any match of ``window + k - 1`` tokens or longer
    while storing ~2/(window+1) of all grams — the standard
    sub-linear dedup/plagiarism index. Docs with fewer than k tokens
    yield no rows; docs with fewer than ``window`` grams degenerate
    to one whole-doc window.

    Scale shape: a positional gram explode (×window fan-out, a small
    constant) followed by ONE groupBy on (doc, window-id) — uniform
    keys, map-side combined — and a distinct. The rightmost-min
    tie-break is the lexicographic min of struct(hash, −pos), which
    Spark and SQL engines order identically.
    """
    if k <= 0 or window <= 0:
        raise ValueError("k and window must be positive")
    toks = tokens_col(F.col(text_col))
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            # CaseWhen BEFORE sequence: sequence(1, n-k+1) DESCENDS for
            # n < k and the slice then throws (same guard as shingles)
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                    lambda i: md5int_col(F.concat_ws(" ", F.slice(toks, i, k))),
                ),
            )
            .otherwise(F.array().cast("array<bigint>"))
            .alias("_hs"),
        )
        .filter(F.size("_hs") >= 1)
        .select("id", F.size("_hs").alias("m"), F.posexplode("_hs").alias("pos", "h"))
    )
    w = window
    sel = (
        grams.withColumn(
            "wid",
            F.explode(
                F.sequence(
                    F.greatest(F.col("pos") - (w - 1), F.lit(0)),
                    F.least(F.col("pos"), F.greatest(F.col("m") - w, F.lit(0))),
                )
            ),
        )
        .groupBy("id", "wid")
        .agg(F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).alias("s"))
    )
    return sel.select(
        "id", F.col("s.h").alias("fp"), (-F.col("s.np")).alias("pos")
    ).distinct()


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL (the action behind
    ``duplicated_ngram_stats``'s signal — suffix-array-style training
    dedup at k-gram granularity, Lee et al.): excise every token
    covered by a token k-gram that also occurs in ANOTHER document,
    and re-join the survivors. Output: (id, n_tokens, n_removed,
    clean_text).

    Plan: one map-side gram explode, one gram-keyed count (uniform
    key; map-side combined), one semi-join back to per-doc start
    lists, then a pure Catalyst lambda rebuild (exists over the
    per-doc start array) — no Python, no pairwise expansion; a doc's
    cost is linear in its token count regardless of how many corpus
    documents share its spans."""
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    grams = base.select(
        "id",
        F.posexplode(
            F.when(
                F.size("t") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, k)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("s", "gram"),
    )
    dup = (
        grams.select("id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    starts = (
        grams.join(dup, "gram", "left_semi")
        .select("id", "s")
        .distinct()
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
    )
    joined = base.join(starts, "id", "left").withColumn(
        "ss", F.coalesce("ss", F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.transform(F.col("t"), lambda w, i: F.struct(w.alias("w"), i.alias("i"))),
        lambda x: ~F.exists(
            F.col("ss"), lambda s: (s <= x["i"]) & (x["i"] < s + k)
        ),
    )
    return joined.select(
        "id",
        F.size("t").cast("long").alias("n_tokens"),
        (F.size("t") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(F.transform(kept, lambda x: x["w"]), " ").alias("clean_text"),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_count: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide SEGMENT-level exact dedup — the line/paragraph
    filter of RefinedWeb/FineWeb-class pipelines (Penedo et al. 2023/
    2024): split every document on ``sep``, drop each segment whose
    exact text occurs in at least ``min_count`` DISTINCT documents
    (nav lines, cookie banners, boilerplate sentences), re-join the
    survivors in order. Output: (id, n_segments, n_removed,
    clean_text).

    Complements the engine's other removers: `remove_host_boilerplate`
    is host-scoped (templates), `remove_duplicated_spans` is token
    k-gram-scoped (long copied spans); this one is the exact-segment
    corpus-wide rule. Segments shorter than ``min_chars`` after
    trimming (e.g. empty splits from doubled separators) are never
    counted or removed, so document structure survives.

    Scale shape: one split+posexplode (map-side), one groupBy keyed
    on the segment string — uniform values; hot segments (the ones
    being removed) are hot VALUES whose approx_count_distinct-free
    distinct-doc count still combines map-side after the (seg, id)
    dedup — one semi-join back, one per-doc ordered rebuild
    aggregation. No pairwise expansion; a document's cost is linear
    in its segment count however many documents share its lines.

    Determinism / portability: pure string ops (literal separator,
    both-side whitespace trim), so the driver contract replays it
    value-exactly in DuckDB SQL.
    """
    import re as _re

    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    segs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias(
            "pos", "seg"
        ),
    )
    eligible = F.length(F.trim(F.col("seg"))) >= int(min_chars)
    shared = (
        segs.filter(eligible)
        .select("seg", "id")
        .distinct()
        .groupBy("seg")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= int(min_count))
        .select("seg", F.lit(True).alias("_dup"))
    )
    marked = segs.join(shared, "seg", "left").select(
        "id",
        "pos",
        "seg",
        (F.col("_dup").isNotNull() & eligible).alias("_rm"),
    )
    out = marked.groupBy("id").agg(
        F.count("*").alias("n_segments"),
        F.count(F.when(F.col("_rm"), 1)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_rm"), F.struct("pos", "seg"))
                    )
                ),
                lambda x: x["seg"],
            ),
            sep,
        ).alias("clean_text"),
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(out, "id", "left").select(
        "id",
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
