"""Distributed BPE merge-rule training (Sennrich et al., ACL 2016).

A training-data pipeline needs its tokenizer trained ON the corpus;
the reference has no tokenizer surface, but the engine's text stack
(quality filters, packing, perplexity) presumes one exists. BPE
training is corpus-scale work exactly once: the corpus collapses to
a (word, count) vocabulary table (one explode + one map-side-combined
groupBy over every document — the only pass that touches all N docs),
after which every merge round runs over the VOCABULARY table (≪
corpus; bounded by distinct words) regardless of corpus size.

Per merge round the plan is: adjacent-pair explode over the words
still containing ≥2 symbols → one map-side-combined sum keyed on the
pair → a 1-row TakeOrdered argmax (count DESC, pair ASC — the
deterministic tie-break) → one pure-column rewrite (a left-to-right
conditional fold; only words containing the winning pair change).
The rounds are inherently sequential — that is the algorithm, not a
Spark limitation — so the right scale measure is per-round cost,
which is one shuffle of vocabulary-sized data.

Determinism: integer counts, lexicographic tie-break, no RNG — the
merge-rule sequence replays exactly in pure Python
(tests/test_tokenizer.py pins sequence equality against a
reference-faithful replay of Sennrich's learn_bpe loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import tokens_col
from linkgraph.plans.iterate import LineageChain, PeelCheckpoint

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus via the engine's portable
    tokenizer — the single corpus-wide pass; everything after runs on
    this table."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols with the end-of-word marker fused onto the
    last character (Sennrich's representation: 'low' → l o w</w>)."""
    chars = F.split(word, "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END_OF_WORD))),
    )


def _adjacent_pairs(sym: Column) -> Column:
    """All adjacent symbol pairs, overlapping included — BPE's
    get_stats counts 'aaa' as (a,a) twice."""
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, 1, n - 1),
        F.slice(sym, 2, n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )


def _merge_pair(sym: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the fused symbol, as a pure-column fold: merge
    when the accumulator's tail is `left` and the element is `right`.
    Non-overlap falls out of the fold — a just-fused tail equals
    left+right, never `left` again (right is non-empty)."""
    fused = F.lit(left + right)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(fused)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_stats(vocab: DataFrame) -> DataFrame:
    """Round-1 BPE pair statistics over a (word, count) vocabulary:
    DataFrame(left_sym, right_sym, n) — the adjacent character-pair
    counts (end-of-word marker fused) whose argmax is the first merge
    rule. One explode + one map-side-combined sum; the SQL-replayable
    slice of the training loop (contract ``bpe_top_pairs_docs``)."""
    words = vocab.select(
        F.col(vocab.columns[0]).alias("word"),
        F.col(vocab.columns[1]).cast("long").alias("count"),
    ).filter(F.length("word") > 0)
    sym = words.select(_initial_symbols(F.col("word")).alias("sym"), "count")
    return (
        sym.filter(F.size("sym") >= 2)
        .select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "count")
        .groupBy(
            F.col("p.left").alias("left_sym"), F.col("p.right").alias("right_sym")
        )
        .agg(F.sum("count").alias("n"))
    )


def bpe_merges(
    vocab: DataFrame,
    n_merges: int,
    min_count: int = 1,
    cut_every: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from a (word, count) table;
    returns [(left, right, pair_count), ...] in merge order — the
    tokenizer's merges.txt. Stops early (shorter list) when no pair
    occurs anymore.

    ``min_count`` drops rare words from the vocabulary table before
    training (the standard frequency floor). The driver holds only
    the winning pair per round; per-word symbol state stays
    distributed, lineage cut every ``cut_every`` rounds (each round
    nests one fold lambda into the plan and each round's argmax
    recomputes since the last cut, so small values win — O(cut²)
    recompute vs one parquet roundtrip).

    ``checkpoint_dir``/``checkpoint_every``: durable per-round
    commits (PeelCheckpoint — symbol state as a frame, learned rules
    riding the meta), so a 30k-merge training resumes at the last
    committed round instead of restarting; a real tokenizer training
    is a multi-hour driver loop, exactly what the north rule's
    resumability machinery is for."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words = vocab.select(
        F.col(vocab.columns[0]).alias("word"),
        F.col(vocab.columns[1]).cast("long").alias("count"),
    ).filter((F.col("count") >= min_count) & (F.length("word") > 0))
    state = words.select(
        _initial_symbols(F.col("word")).alias("sym"), "count"
    )
    chain = LineageChain()
    state = chain.cut(state)
    rules: list[tuple[str, str, int]] = []
    ckpt = (
        PeelCheckpoint(checkpoint_dir, vocab.sparkSession)
        if checkpoint_dir
        else None
    )
    start = 0
    if ckpt and resume:
        meta = ckpt.latest()
        if meta is not None:
            state = ckpt.load(meta)["state"]
            rules = [tuple(x) for x in meta["extra"]["rules"]]
            start = meta["round"]
    for r in range(start, n_merges):
        pairs = (
            state.filter(F.size("sym") >= 2)
            .select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "count")
            .groupBy("p.left", "p.right")
            .agg(F.sum("count").alias("n"))
        )
        top = pairs.orderBy(
            F.col("n").desc(), F.col("left").asc(), F.col("right").asc()
        ).limit(1).collect()
        if not top:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        rules.append((left, right, n))
        has_pair = F.exists(
            _adjacent_pairs(F.col("sym")),
            lambda p: (p["left"] == F.lit(left)) & (p["right"] == F.lit(right)),
        )
        state = state.select(
            F.when(has_pair, _merge_pair(F.col("sym"), left, right))
            .otherwise(F.col("sym"))
            .alias("sym"),
            "count",
        )
        if (r + 1) % cut_every == 0:
            state = chain.cut(state)
        if ckpt and checkpoint_every and (r + 1) % checkpoint_every == 0:
            ckpt.commit(r + 1, {"state": state}, extra={"rules": rules})
    return rules


def bpe_encode(
    docs: DataFrame,
    rules: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    expr_rules_max: int = 64,
) -> DataFrame:
    """Apply a learned merge-rule list to every document: adds
    ``out_col`` array<string> of BPE symbols (per word, in word
    order, end-of-word marker kept).

    Two physical plans, switched on ``len(rules)``:

    - ``<= expr_rules_max``: pure column expressions — the rules bake
      into the plan as one nested fold per rule, zero Python, no
      shuffle. Right for small rule sets only: the expression tree is
      |rules| deep, and at a real tokenizer's 30k-60k merges Catalyst
      analysis goes super-linear and codegen hits the JVM's 64 KB
      method limit long before data size matters.
    - above it: ONE Arrow-batched ``mapInPandas`` pass (the same
      sanctioned vectorized-UDF shape as the extraction UDFs,
      functions/extract.py). Tokenization still happens JVM-side
      (``tokens_col`` as a temp column — the Python side never
      re-implements the tokenizer, so both plans split words
      identically); the merge table ships once as a broadcast dict
      and each batch encodes with Sennrich's own apply_bpe algorithm
      (repeatedly merge the lowest-rank pair present) plus a
      per-partition word cache — per-word cost is O(|word|·merges
      applied), independent of |rules|, and Zipf makes the cache hit
      rate ≈ 1. Still no shuffle.

    The two plans agree exactly (pinned by pytest): rank order is a
    topological order of symbol creation — rule k's pair can only be
    assembled from initial characters and rules < k — so merging the
    lowest-rank pair first replays the sequential rule application
    the fold expresses."""
    if len(rules) <= expr_rules_max:

        def _encode_word(w: Column) -> Column:
            e = _initial_symbols(w)
            for rule in rules:
                e = _merge_pair(e, rule[0], rule[1])
            return e

        return docs.withColumn(
            out_col,
            F.flatten(F.transform(tokens_col(F.col(text_col)), _encode_word)),
        )

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {(l, r): i for i, (l, r, *_) in enumerate(rules)}
    bc = docs.sparkSession.sparkContext.broadcast(ranks)
    tmp = f"__{out_col}_words"
    with_words = docs.withColumn(tmp, tokens_col(F.col(text_col)))
    out_schema = StructType(
        [f for f in with_words.schema.fields if f.name != tmp]
        + [StructField(out_col, ArrayType(StringType()))]
    )
    keep = [f.name for f in out_schema.fields if f.name != out_col]

    def _encode_batches(batches):
        rk = bc.value
        cache: dict[str, list[str]] = {}

        def merge(sym, left, right):
            out, i, fused = [], 0, left + right
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            return out

        def enc_word(w):
            got = cache.get(w)
            if got is None:
                sym = list(w[:-1]) + [w[-1] + END_OF_WORD]
                while len(sym) >= 2:
                    best, best_rank = None, None
                    for p in zip(sym, sym[1:]):
                        r = rk.get(p)
                        if r is not None and (best_rank is None or r < best_rank):
                            best, best_rank = p, r
                    if best is None:
                        break
                    sym = merge(sym, *best)
                got = cache[w] = sym
            return got

        for pdf in batches:
            enc = [
                None
                if words is None
                else [s for w in words if w for s in enc_word(w)]
                for words in pdf[tmp]
            ]
            out = pdf[keep].copy()
            out[out_col] = enc
            yield out

    return with_words.mapInPandas(_encode_batches, schema=out_schema)
