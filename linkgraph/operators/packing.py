"""Training-corpus assembly operators: token-window chunking,
GPT-style sequence packing, and temperature mixture weights.

These are the steps between a filtered/deduplicated document table
and a tokenized training run: split long documents into fixed-token
windows, lay the whole corpus out as fixed-capacity training
sequences (documents concatenated in a deterministic order and cut
at capacity boundaries — the standard causal-LM packing), and derive
per-source sampling weights with a temperature exponent (the
multi-corpus mixing rule used by large-scale pretraining recipes).

Everything is pure Catalyst column algebra over the portable
tokenizer in functions/text.py — no Python in the hot path, no
global single-partition window: the corpus-wide running token count
in ``pack_sequences`` reuses the high-bits bucketing trick from
layout._indexed (per-bucket windows + a ≤2048-entry driver offset
map), so the plan holds at 10^9 documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.functions.text import token_count_col, tokens_col


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """DataFrame(doc_id, chunk_no, chunk_tokens, chunk_text): each
    document split into token windows of ``chunk_tokens`` starting
    every ``stride`` tokens (default: non-overlapping). A window
    starts at every offset i·stride < n_tokens, so the final chunk
    may be short; empty documents emit no rows.

    Scale shape: tokenize → sequence/explode → slice, all map-side
    column expressions — zero shuffles, zero Python.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    step = chunk_tokens if stride is None else stride
    if step <= 0:
        raise ValueError("stride must be positive")
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_t")
    ).withColumn("_n", F.size("_t"))
    return (
        toks.filter(F.col("_n") > 0)
        .withColumn(
            "chunk_no",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr(f"CAST((_n - 1) DIV {step} AS BIGINT)"),
                )
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("chunk_no") * step
            ).cast("long").alias("chunk_tokens"),
            F.array_join(
                F.slice(
                    "_t",
                    (F.col("chunk_no") * step + 1).cast("int"),
                    chunk_tokens,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def _running_end(counted: DataFrame) -> DataFrame:
    """Adds ``cend``: the corpus-wide running token total through each
    row in ascending doc_id order, without a global window — high-bit
    buckets preserve id order, per-bucket token sums fold into a tiny
    driver-side offset map (≤ ~2048 entries), and each bucket ranks
    independently.
    """
    row = counted.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
    if row["lo"] is None:
        return counted.withColumn("cend", F.lit(0).cast("long"))
    span = int(row["hi"]) - int(row["lo"])
    shift = max(0, span.bit_length() - 10)
    b = F.shiftright(F.col("doc_id"), shift).alias("_b")
    sums = {
        r["_b"]: r["s"]
        for r in counted.select(b, "tc").groupBy("_b").agg(F.sum("tc").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for bk in sorted(sums):
        offsets[bk] = acc
        acc += int(sums[bk])
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[F.col("_b")]
    w = Window.partitionBy("_b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        counted.select("doc_id", "tc", b)
        .withColumn("cend", (F.sum("tc").over(w) + off).cast("long"))
        .drop("_b")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    token_count_col_name: str | None = None,
    capacity: int = 2048,
) -> DataFrame:
    """DataFrame(doc_id, seq_id, doc_tok_start, doc_tok_end, seq_off):
    the corpus laid out as fixed-``capacity`` training sequences —
    documents concatenated in ascending doc_id order and cut every
    ``capacity`` tokens, so a document spans one or more sequences
    (the standard causal-LM packing; no padding, no document-boundary
    waste). Each row maps the document's token half-open range
    [doc_tok_start, doc_tok_end) into sequence ``seq_id`` at offset
    ``seq_off``. Zero-token documents emit no rows.

    ``token_count_col_name`` names a precomputed length column;
    otherwise lengths come from the portable tokenizer over
    ``text_col``. All arithmetic is exact integer math — the layout
    is reproducible bit-for-bit across engines and run sizes.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if token_count_col_name is not None:
        counted = df.select(
            F.col(id_col).alias("doc_id"),
            F.col(token_count_col_name).cast("long").alias("tc"),
        )
    else:
        counted = df.select(
            F.col(id_col).alias("doc_id"),
            token_count_col(F.col(text_col)).cast("long").alias("tc"),
        )
    spans = (
        _running_end(counted)
        .filter(F.col("tc") > 0)
        .withColumn("cstart", F.col("cend") - F.col("tc"))
    )
    cap = F.lit(int(capacity))
    return (
        spans.withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"cstart DIV {int(capacity)}"),
                    F.expr(f"(cend - 1) DIV {int(capacity)}"),
                )
            ),
        )
        .select(
            "doc_id",
            "seq_id",
            F.greatest(F.lit(0).cast("long"), F.col("seq_id") * cap - F.col("cstart")).alias(
                "doc_tok_start"
            ),
            F.least(F.col("tc"), (F.col("seq_id") + 1) * cap - F.col("cstart")).alias(
                "doc_tok_end"
            ),
            F.greatest(F.lit(0).cast("long"), F.col("cstart") - F.col("seq_id") * cap).alias(
                "seq_off"
            ),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    text_col: str | None = "text",
    token_count_col_name: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """DataFrame(group, n_docs, n_tokens, weight): per-group corpus
    sizes and temperature-scaled sampling weights
    w_g ∝ n_tokens_g^alpha, normalized to sum 1 (alpha = 1 is
    proportional sampling, alpha → 0 uniform — the multilingual /
    multi-corpus mixing rule). One map-side-combined aggregation plus
    a 1-row broadcast for the normalizer.
    """
    if token_count_col_name is not None:
        tc: Column = F.col(token_count_col_name).cast("long")
    else:
        tc = token_count_col(F.col(text_col)).cast("long")
    g = (
        df.select(F.col(group_col).alias("group"), tc.alias("tc"))
        .groupBy("group")
        .agg(F.count("*").alias("n_docs"), F.sum("tc").alias("n_tokens"))
        .withColumn("_raw", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))))
    )
    total = g.agg(F.sum("_raw").alias("_tot"))
    return (
        g.crossJoin(F.broadcast(total))
        .select(
            "group",
            "n_docs",
            "n_tokens",
            (F.col("_raw") / F.col("_tot")).alias("weight"),
        )
    )
