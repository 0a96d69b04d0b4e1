"""HTML → text / links extraction.

These are the ONLY Python UDFs in the engine's hot path, and they are
vectorized pandas UDFs (Arrow batch transfer) per the design rule in
SURVEY.md §2.8: everything else is JVM-side Catalyst expressions.

The *pinned* pure-Python extractors below are the per-row contract:
the pandas UDFs must produce byte-identical text (and identical link
lists) per url — tested in tests/test_extract.py. This mirrors the
reference's duck-typed ``WeightExtractor`` idea
(/root/reference/src/layout.rs:12-71) of "semantics live in a small,
swappable scalar layer", re-expressed as Arrow-vectorized columns.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# --- pinned extractors (the contract) --------------------------------------

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(rb"""<a\s[^>]*href=["']([^"']+)["']""", re.IGNORECASE)
_SCRIPT_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)


def pinned_extract_text(html: bytes | None) -> str | None:
    """Reference text extraction: drop script/style, strip tags,
    collapse whitespace. Byte-identical output per url is the
    invariant every other implementation must match."""
    if html is None:
        return None
    no_script = _SCRIPT_RE.sub(b" ", html)
    no_tags = _TAG_RE.sub(b" ", no_script)
    text = no_tags.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", text).strip()


def pinned_extract_links(html: bytes | None) -> list[str]:
    """Reference link extraction: href attributes of <a> tags, in
    document order, duplicates preserved (the edge builder decides
    dedup policy, not the extractor)."""
    if html is None:
        return []
    return [m.decode("utf-8", errors="replace") for m in _HREF_RE.findall(html)]


_ANCHOR_RE = re.compile(
    rb"""<a\s[^>]*href=["']([^"']+)["'][^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL,
)


def pinned_extract_anchors(html: bytes | None) -> list[tuple[str, str]]:
    """(href, anchor text) pairs in document order, duplicates
    preserved. The anchor text is the <a> inner HTML through the SAME
    tag-strip + whitespace-collapse contract as pinned_extract_text —
    the per-row invariant the vectorized UDF must match byte-for-byte.
    Only well-formed ``<a href=...>…</a>`` spans qualify (nested or
    unclosed tags yield no pair; the href still appears in
    pinned_extract_links, whose contract is attribute-only)."""
    if html is None:
        return []
    out = []
    for href, inner in _ANCHOR_RE.findall(html):
        text = _TAG_RE.sub(b" ", inner).decode("utf-8", errors="replace")
        out.append(
            (href.decode("utf-8", errors="replace"), _WS_RE.sub(" ", text).strip())
        )
    return out


# --- vectorized UDFs (the engine path) --------------------------------------


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(pinned_extract_text)


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(pinned_extract_links)


_ANCHOR_SPARK_TYPE = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("anchor", StringType()),
        ]
    )
)


@pandas_udf(_ANCHOR_SPARK_TYPE)
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: [
            {"href": href, "anchor": anchor}
            for href, anchor in pinned_extract_anchors(h)
        ]
    )


# --- pure-Catalyst scalar helpers (no Python) --------------------------------


def normalize_url_col(url: Column) -> Column:
    """URL normalization entirely in JVM expressions: lowercase
    scheme+host, strip fragments, strip trailing slash."""
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"/$", "")
    scheme_host = F.lower(F.regexp_extract(u, r"^((?i)https?://[^/]+)", 1))
    rest = F.regexp_replace(u, r"^(?i)https?://[^/]+", "")
    return F.when(scheme_host == "", u).otherwise(F.concat(scheme_host, rest))


def host_col(url: Column) -> Column:
    """The host of a (normalized) url, JVM-side: lowercased authority
    between the scheme and the first path slash. Empty string for
    scheme-less/relative urls — kept as a single catch-all vertex
    rather than dropped, so host-graph mass is conserved."""
    return F.lower(F.regexp_extract(url, r"^(?i)https?://([^/]+)", 1))


def url_id_col(url: Column) -> Column:
    """Stable distributed 64-bit vertex id: xxhash64 of the normalized
    url. Collision probability at 10^12 urls ~ 2.7e-2 per birthday
    bound on 64 bits — the edge builder collision-checks (count
    distinct urls vs distinct ids) and callers can fall back to dense
    ranks. No monotone counter (reference graph.rs:277-283) — counters
    don't distribute."""
    return F.xxhash64(url)
