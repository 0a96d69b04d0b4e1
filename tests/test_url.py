"""URL canonicalization column functions vs hand-computed expectations
covering every documented branch."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.functions.url import (
    canonical_host_col,
    canonicalize_url_col,
    path_depth_col,
    registrable_domain_col,
)

CASES = [
    # (url, url_norm, host, domain, path_depth)
    ("HTTPS://User@WWW.Example.CO.UK:443/a/b/?x=1#f",
     "https://www.example.co.uk/a/b/?x=1", "www.example.co.uk",
     "example.co.uk", 2),
    ("http://Host.COM:80/", "http://host.com", "host.com", "host.com", 0),
    ("http://h.com:8080/p", "http://h.com:8080/p", "h.com", "h.com", 1),
    ("ftp://X.Y.Z:21/f", "ftp://x.y.z:21/f", "x.y.z", "y.z", 1),
    ("no-scheme/path", "no-scheme/path", "", "", 0),
    ("https://single/", "https://single", "single", "single", 0),
    ("https://a.b.com.au/x//y/", "https://a.b.com.au/x//y/",
     "a.b.com.au", "b.com.au", 2),
    ("http://www.site.org#frag", "http://www.site.org",
     "www.site.org", "site.org", 0),
]


def test_url_functions(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    rows = {
        r["url"]: r
        for r in df.select(
            "url",
            canonicalize_url_col(F.col("url")).alias("n"),
            canonical_host_col(F.col("url")).alias("h"),
            registrable_domain_col(F.col("url")).alias("d"),
            path_depth_col(F.col("url")).alias("p"),
        ).collect()
    }
    for url, norm, host, domain, depth in CASES:
        r = rows[url]
        assert r["n"] == norm, (url, r["n"])
        assert r["h"] == host, (url, r["h"])
        assert r["d"] == domain, (url, r["d"])
        assert r["p"] == depth, (url, r["p"])


def test_normalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    once = df.select(canonicalize_url_col(F.col("url")).alias("url"))
    twice = once.select(canonicalize_url_col(F.col("url")).alias("url"))
    assert sorted(r["url"] for r in once.collect()) == sorted(
        r["url"] for r in twice.collect()
    )
