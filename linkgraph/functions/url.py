"""URL canonicalization column functions for web-crawl tables.

The link-extraction pipeline (sources/edges.py) keys the web graph on
URL strings; these canonicalizers make that key stable across the
cosmetic variants crawls actually contain. (Distinct from the PINNED
``functions.extract.normalize_url_col`` whose byte-identical output
the webgraph oracles replay — that one must never change; this module
is the richer, opt-in canonicalizer) — scheme/host case, default
ports, userinfo, fragments, bare trailing slashes. All pure Catalyst
column expressions (regexp in the Java∩RE2 common subset so the
DuckDB oracles evaluate the identical semantics), zero Python, zero
shuffles — safe to apply inline in the 10^12-row extraction scan.

Reference parity: networkx-rust's edge extraction treats urls as
opaque strings; canonicalization is the standard upgrade a real
Common-Crawl pipeline needs before hashing urls to vertex ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

# common multi-label public suffixes (a deterministic, documented
# subset — a full public-suffix list is a data file, not a formula)
MULTI_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.sg", "com.tr", "co.za",
)


def _auth_no_user(url: Column) -> Column:
    return F.regexp_replace(F.lower(F.regexp_extract(url, _AUTH, 1)), "^[^@]*@", "")


def canonical_host_col(url: Column) -> Column:
    """Lowercased hostname: userinfo and port stripped. Empty string
    when the value has no ``scheme://`` part."""
    return F.regexp_replace(_auth_no_user(url), ":[0-9]+$", "")


def canonicalize_url_col(url: Column) -> Column:
    """Canonical form: scheme and host lowercased, userinfo dropped,
    default port (http:80 / https:443) dropped, fragment dropped, a
    bare "/" path collapsed; query strings and non-default ports are
    preserved. Values without a ``scheme://`` part pass through
    unchanged (relative links are the extractor's job to resolve).
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    auth = _auth_no_user(url)
    host = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    rest = F.regexp_extract(url, _REST, 1)
    path = F.when(rest == "/", F.lit("")).otherwise(rest)
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), host, path)
    )


def registrable_domain_col(url: Column) -> Column:
    """The registrable domain of the host: the last two labels, or the
    last three when the two-label tail is a known multi-label public
    suffix (co.uk, com.au, … — the documented MULTI_SUFFIXES subset).
    Hosts with fewer labels pass through; empty when no host."""
    h = canonical_host_col(url)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    suffix_hit = last2.isin(*MULTI_SUFFIXES)
    return (
        F.when(n <= 2, h)
        .when(suffix_hit & (n >= 3), last3)
        .otherwise(last2)
    )


def path_depth_col(url: Column) -> Column:
    """Number of non-empty path segments (query excluded): depth of
    ``https://h/a/b/c?q`` is 3, of a root or schemeless value 0."""
    rest = F.regexp_extract(url, _REST, 1)
    path = F.regexp_replace(rest, r"\?.*$", "")
    return F.size(F.filter(F.split(path, "/"), lambda x: x != "")).cast("long")
