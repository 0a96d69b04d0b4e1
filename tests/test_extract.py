"""The per-row invariant (BASELINE.json input_hint): byte-identical
extracted text per url between the vectorized UDF path and the pinned
pure-Python extractor."""

import pyspark.sql.functions as F

from linkgraph.functions.extract import (
    extract_links_udf,
    extract_text_udf,
    normalize_url_col,
    pinned_extract_links,
    pinned_extract_text,
)
from linkgraph.sources.pages import generate_pages_local, pages_dataframe


def test_text_byte_identical(spark):
    pages = pages_dataframe(spark, 120, n_domains=12)
    out = pages.select(
        "url", "text", extract_text_udf(F.col("html")).alias("udf_text")
    ).collect()
    assert len(out) == 120
    for r in out:
        assert r["udf_text"] == r["text"], r["url"]  # byte-identical per url


def test_links_match_pinned(spark):
    pdf = generate_pages_local(60, n_domains=6)
    pages = spark.createDataFrame(pdf)
    got = {
        r["url"]: r["links"]
        for r in pages.select("url", extract_links_udf("html").alias("links")).collect()
    }
    for _, row in pdf.iterrows():
        assert got[row["url"]] == pinned_extract_links(row["html"])


def test_pinned_extractor_behavior():
    html = b'<html><style>x{}</style><body>Hello  <b>world</b> <a href="https://a/b">x</a></body></html>'
    assert pinned_extract_text(html) == "Hello world x"
    assert pinned_extract_links(html) == ["https://a/b"]
    assert pinned_extract_text(None) is None
    assert pinned_extract_links(None) == []


def test_url_normalization(spark):
    df = spark.createDataFrame(
        [("HTTPS://Example.COM/Path/#frag",), ("https://a.com/x/",), ("no-scheme/keep",)],
        "url string",
    )
    got = [r[0] for r in df.select(normalize_url_col(F.col("url"))).collect()]
    assert got == ["https://example.com/Path", "https://a.com/x", "no-scheme/keep"]


def test_generation_deterministic(spark):
    a = pages_dataframe(spark, 50, n_domains=5, partitions=2).collect()
    b = pages_dataframe(spark, 50, n_domains=5, partitions=7).collect()
    ka = sorted((r["url"], bytes(r["html"])) for r in a)
    kb = sorted((r["url"], bytes(r["html"])) for r in b)
    assert ka == kb  # partition-count independent


def test_host_graph_matches_pinned_collapse(spark):
    """build_host_edges == the pinned extractor's page edges collapsed
    to hosts in pure Python (the host-rank pipeline's first stage)."""
    import collections
    import re

    from linkgraph.sources.edges import build_host_edges

    def norm(u):
        u = re.sub(r"#.*$", "", u)
        u = re.sub(r"/$", "", u)
        m = re.match(r"(?i)^(https?://[^/]+)", u)
        if m:
            u = m.group(1).lower() + u[m.end():]
        return u

    def host(u):
        m = re.match(r"(?i)^https?://([^/]+)", u)
        return m.group(1).lower() if m else ""

    pdf = generate_pages_local(120, 12)
    want = collections.Counter()
    for _, row in pdf.iterrows():
        h = host(norm(row["url"]))
        for href in pinned_extract_links(row["html"]):
            want[(h, host(norm(href)))] += 1

    pages = pages_dataframe(spark, 120, n_domains=12)
    got = {
        (r["src_host"], r["dst_host"]): int(r["weight"])
        for r in build_host_edges(pages).collect()
    }
    assert got == dict(want)
    # drop_internal removes exactly the same-host rows
    got_x = {
        (r["src_host"], r["dst_host"]): int(r["weight"])
        for r in build_host_edges(pages, drop_internal=True).collect()
    }
    assert got_x == {k: v for k, v in want.items() if k[0] != k[1]}
