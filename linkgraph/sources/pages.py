"""Deterministic synthetic Common-Crawl-style pages table.

Produces the ``input_hint`` schema
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with a Zipf-weighted domain pool so a few hub domains dominate
in-links — the skew realism the north rule demands. Generation is
hash-derived per row id (splitmix64), NOT sequence-dependent RNG, so
any partition of ``spark.range(n)`` generates its rows independently
and identically on every run — the property that lets the same table
be built at 1000-executor scale without a coordination point.

In production the pages table is an Iceberg/Parquet scan; this module
is the sandbox stand-in (no external data allowed).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from linkgraph.functions.extract import pinned_extract_text

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "web graph link page rank crawl index node edge domain score text "
    "data spark table shuffle join label component triangle cluster"
).split()


def _mix64(x: int) -> int:
    """splitmix64 finalizer — the per-row deterministic entropy source."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _zipf_cdf(n_domains: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_domains + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def page_url(i: int, n_domains: int) -> str:
    return f"https://d{i % n_domains}.example.com/p{i}"


def _page_links(i: int, n_pages: int, n_domains: int, cdf: np.ndarray, seed: int) -> list[str]:
    """Out-links of page i: 1..8 targets, target domain Zipf-weighted
    (hub domains collect in-links), target page uniform in-domain."""
    h = _mix64(i * 1_000_003 + seed)
    k = 1 + (h % 8)
    links = []
    per_dom = max(1, n_pages // n_domains)
    for j in range(k):
        hj = _mix64(h + j + 1)
        u = (hj & 0xFFFFFFFF) / 2**32
        dom = int(np.searchsorted(cdf, u))
        slot = (_mix64(hj) % per_dom)
        target = dom + n_domains * slot
        if target >= n_pages or target == i:
            target = (dom + n_domains) % n_pages
        links.append(page_url(target, n_domains))
    return links


def _page_text_words(i: int, seed: int) -> str:
    h = _mix64(i * 7_919 + seed)
    n_words = 20 + (h % 60)
    return " ".join(_WORDS[_mix64(h + w) % len(_WORDS)] for w in range(n_words))


def page_row(i: int, n_pages: int, n_domains: int, cdf: np.ndarray, seed: int) -> dict:
    url = page_url(i, n_domains)
    body = _page_text_words(i, seed)
    anchors = "".join(
        f'<a href="{t}">link {j}</a>' for j, t in enumerate(_page_links(i, n_pages, n_domains, cdf, seed))
    )
    html = (
        f"<html><head><title>Page {i}</title><style>p{{margin:0}}</style></head>"
        f"<body><p>{body}</p>{anchors}</body></html>"
    ).encode("utf-8")
    return {
        "url": url,
        "warc_ts": _BASE_TS + dt.timedelta(seconds=i),
        "html": html,
        # The stored text IS the pinned extraction — makes the
        # byte-identical-per-url invariant directly testable.
        "text": pinned_extract_text(html),
        "lang": ("en" if i % 10 < 8 else ("de" if i % 10 == 8 else "fr")),
    }


def generate_pages_local(n_pages: int, n_domains: int = 50, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation for tests (small n only)."""
    cdf = _zipf_cdf(n_domains)
    return pd.DataFrame([page_row(i, n_pages, n_domains, cdf, seed) for i in range(n_pages)])


def pages_dataframe(
    spark: SparkSession,
    n_pages: int,
    n_domains: int = 50,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: spark.range(n) → mapInPandas. Each
    partition derives its rows purely from their ids, so this scales
    to any executor count with zero coordination."""
    cdf = _zipf_cdf(n_domains)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                [page_row(int(i), n_pages, n_domains, cdf, seed) for i in b["id"]]
            )

    rng = spark.range(n_pages, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=PAGE_SCHEMA)
