"""Text analysis for training-data pipelines — pure Catalyst columns.

Language-ID (stopword-hit heuristic), quality scoring (length /
stopword / punctuation ratios), token counting, and document
fingerprinting (md5-derived 60-bit ints). Zero Python UDFs: every
expression here is JVM-side and whole-stage-codegen'd, and each has
an exactly-equivalent ANSI-SQL form (the DuckDB oracles in
__spark_entry__.py) — the cross-engine hash parity is tested.

The md5→int trick: ``conv(substr(md5(x),1,15),16,10)`` is a portable
deterministic 60-bit hash (both Spark and DuckDB agree bit-for-bit),
used wherever hashes must be oracle-checkable; the faster xxhash64
stays the default for engine-internal ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "([a-z0-9]+)"

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"],
}


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 1)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def md5int_col(s: Column) -> Column:
    """Portable 60-bit hash (see module docstring)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def stop_hits_col(text: Column, lang: str) -> Column:
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_col(text), lambda t: F.array_contains(stops, t)))


def lang_id_col(text: Column) -> Column:
    """Predicted language by max stopword hits, ties en > de > fr."""
    en, de, fr = (stop_hits_col(text, lg) for lg in ("en", "de", "fr"))
    return (
        F.when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def quality_score_col(text: Column) -> Column:
    """Pinned formula: 0.5·min(1, n_tokens/100) + 0.5·min(1, 3·stop_ratio)
    − 0.2·punct_ratio, rounded to 6 decimals."""
    n_tok = token_count_col(text).cast("double")
    stop_ratio = F.when(n_tok > 0, stop_hits_col(text, "en") / n_tok).otherwise(F.lit(0.0))
    punct = F.size(F.regexp_extract_all(text, F.lit("([^A-Za-z0-9 ])"), 1)).cast("double")
    punct_ratio = F.when(F.length(text) > 0, punct / F.length(text)).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n_tok / 100.0)
    return F.round(
        0.5 * len_score + 0.5 * F.least(F.lit(1.0), 3.0 * stop_ratio) - 0.2 * punct_ratio, 6
    )


def doc_fingerprint_col(text: Column) -> Column:
    """Whole-document fingerprint: md5int of whitespace-normalized
    lowercase text — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(text), r"\s+", " ")
    return md5int_col(F.trim(normalized))


def shingle_fingerprint_col(text: Column, k: int = 5) -> Column:
    """Content-shift-tolerant fingerprint: min md5int over token
    k-gram shingles (winnowing-style); falls back to the doc
    fingerprint for docs shorter than k tokens."""
    toks = tokens_col(text)
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    min_hash = F.array_min(F.transform(shingles, lambda s: md5int_col(s)))
    return F.when(n >= k, min_hash).otherwise(doc_fingerprint_col(text))


def type_token_ratio_col(text: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens, 0.0 for empty
    docs. Low values flag boilerplate/spam (Gopher-style repetition
    rule). Pure per-row array math — no shuffle at any scale."""
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(
        n > 0, F.round(F.size(F.array_distinct(toks)) / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))


def dup_trigram_frac_col(text: Column) -> Column:
    """Fraction of token 3-grams that are repeats of an earlier one:
    1 − distinct/total, 0.0 for docs under 3 tokens. The in-document
    repetition signal (Gopher's duplicate-n-gram rule); pure per-row
    array math — no shuffle at any scale."""
    toks = tokens_col(text)
    # sequence/slice are only valid for >=3 tokens; CaseWhen evaluates
    # the branch lazily, so short docs never touch them
    tri = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
    )
    n = F.size(tri)
    return F.when(
        F.size(toks) >= 3,
        F.round(F.lit(1.0) - F.size(F.array_distinct(tri)) / n.cast("double"), 6),
    ).otherwise(F.lit(0.0))


# PII patterns — one regex dialect that Java (Spark) and RE2 (DuckDB)
# read identically: literal classes, \d, \b, bounded repetition only
# (no lookaround, no backrefs — RE2 has neither).
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_email_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0))


def pii_ipv4_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0))


def pii_phone_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0))


def redact_pii_col(text: Column) -> Column:
    """Text with emails/IPv4s/phones replaced by typed placeholders —
    the scrubbing pass of a training-data pipeline. Order matters:
    emails first (their domains contain dots that the later patterns
    must not see), then IPs (dotted digits), then phones. Pure
    per-row regexp_replace — fused into the scan, no shuffle."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
