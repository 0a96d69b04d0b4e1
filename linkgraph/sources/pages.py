"""Deterministic synthetic Common-Crawl-style pages table.

Produces the ``input_hint`` schema
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with a Zipf-weighted domain pool so a few hub domains dominate
in-links — the skew realism the north rule demands. Generation is
hash-derived per row id (splitmix64), NOT sequence-dependent RNG, so
any partition of ``spark.range(n)`` generates its rows independently
and identically on every run — the property that lets the same table
be built at 1000-executor scale with zero coordination. The per-batch
arithmetic is vectorized numpy (uint64 wrap-around), so generation
keeps up with the Arrow pipeline instead of bottlenecking it.

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

_WORDS = np.array(
    (
        "web graph link page rank crawl index node edge domain score text "
        "data spark table shuffle join label component triangle cluster"
    ).split()
)

_U64 = np.uint64
_MAXK = 8  # max out-links per page
_MAXW = 80  # max words per page body


def _mix64_np(x: np.ndarray) -> np.ndarray:
    x = x + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _zipf_cdf(n_domains: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_domains + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def page_url(i: int, n_domains: int) -> str:
    return f"https://d{i % n_domains}.example.com/p{i}"


def batch_page_rows(
    ids: np.ndarray, n_pages: int, n_domains: int, cdf: np.ndarray, seed: int
) -> pd.DataFrame:
    """Vectorized generation of the page rows for an id batch."""
    ids = ids.astype(np.int64)
    uids = ids.astype(_U64)
    per_dom = max(1, n_pages // n_domains)

    # --- out-links: Zipf-weighted target domain, uniform in-domain slot
    h = _mix64_np(uids * _U64(1_000_003) + _U64(seed))
    k = 1 + (h % _U64(_MAXK)).astype(np.int64)  # 1..8 links
    js = np.arange(1, _MAXK + 1, dtype=np.uint64)
    hj = _mix64_np(h[:, None] + js[None, :])  # (B, MAXK)
    u = (hj & _U64(0xFFFFFFFF)).astype(np.float64) / 2**32
    dom = np.searchsorted(cdf, u)
    slot = (_mix64_np(hj) % _U64(per_dom)).astype(np.int64)
    target = dom + n_domains * slot
    bad = (target >= n_pages) | (target == ids[:, None])
    target = np.where(bad, (dom + n_domains) % n_pages, target)

    # --- body words
    hw = _mix64_np(uids * _U64(7_919) + _U64(seed))
    n_words = 20 + (hw % _U64(60)).astype(np.int64)
    ws = np.arange(_MAXW, dtype=np.uint64)
    widx = (_mix64_np(hw[:, None] + ws[None, :]) % _U64(len(_WORDS))).astype(np.int64)
    words = _WORDS[widx]  # (B, MAXW) strings

    rows = []
    for r in range(len(ids)):
        i = int(ids[r])
        body = " ".join(words[r, : n_words[r]])
        anchors = "".join(
            f'<a href="{page_url(int(t), n_domains)}">link {j}</a>'
            for j, t in enumerate(target[r, : k[r]])
        )
        html = (
            f"<html><head><title>Page {i}</title><style>p{{margin:0}}</style></head>"
            f"<body><p>{body}</p>{anchors}</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": page_url(i, n_domains),
                "warc_ts": _BASE_TS + dt.timedelta(seconds=i),
                "html": html,
                # The stored text IS the pinned extraction — makes the
                # byte-identical-per-url invariant directly testable.
                "text": pinned_extract_text(html),
                "lang": ("en" if i % 10 < 8 else ("de" if i % 10 == 8 else "fr")),
            }
        )
    return pd.DataFrame(rows)


def page_row(i: int, n_pages: int, n_domains: int, cdf: np.ndarray, seed: int) -> dict:
    """Single-row reference path (tests); same math as the batch."""
    return batch_page_rows(np.array([i]), n_pages, n_domains, cdf, seed).iloc[0].to_dict()


def generate_pages_local(n_pages: int, n_domains: int = 50, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation for tests (small n only)."""
    cdf = _zipf_cdf(n_domains)
    return batch_page_rows(np.arange(n_pages), n_pages, n_domains, cdf, seed)


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
            yield batch_page_rows(b["id"].to_numpy(), n_pages, n_domains, cdf, seed)

    rng = spark.range(n_pages, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=PAGE_SCHEMA)
