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


def test_anchors_match_pinned(spark):
    from linkgraph.functions.extract import extract_anchors_udf, pinned_extract_anchors

    pdf = generate_pages_local(60, n_domains=6)
    pages = spark.createDataFrame(pdf)
    got = {
        r["url"]: [(a["href"], a["anchor"]) for a in r["anchors"]]
        for r in pages.select(
            "url", extract_anchors_udf("html").alias("anchors")
        ).collect()
    }
    n_pairs = 0
    for _, row in pdf.iterrows():
        want = pinned_extract_anchors(row["html"])
        assert got[row["url"]] == want
        n_pairs += len(want)
    assert n_pairs > 60  # ~1-8 anchors/page; the fixture isn't vacuous


def test_pinned_anchor_behavior():
    from linkgraph.functions.extract import pinned_extract_anchors

    html = (
        b'<body><a href="https://a/b">Hello  <b>world</b></a>'
        b"<a name=x>no href</a>"
        b'<a href="https://c/d" class="z"> spaced \n text </a></body>'
    )
    assert pinned_extract_anchors(html) == [
        ("https://a/b", "Hello world"),
        ("https://c/d", "spaced text"),
    ]
    assert pinned_extract_anchors(None) == []


def test_anchor_text_stats(spark):
    """Engine aggregation == a driver-side replay through the pinned
    extractor: counts, uniques, and the deterministic top anchor
    (max count, ties to lexicographically smallest)."""
    import collections
    import re as _re

    from linkgraph.functions.extract import pinned_extract_anchors
    from linkgraph.sources.edges import anchor_text_stats

    def norm(u: str) -> str:
        u = _re.sub(r"#.*$", "", u)
        u = _re.sub(r"/$", "", u)
        m = _re.match(r"(?i)^(https?://[^/]+)", u)
        if m:
            u = m.group(1).lower() + u[m.end():]
        return u

    pdf = generate_pages_local(80, n_domains=8)
    per: dict[str, collections.Counter] = {}
    for _, row in pdf.iterrows():
        for href, anchor in pinned_extract_anchors(row["html"]):
            per.setdefault(norm(href), collections.Counter())[anchor] += 1
    got = {
        r["dst"]: (r["n_anchors"], r["n_unique_anchors"], r["top_anchor"])
        for r in anchor_text_stats(spark.createDataFrame(pdf)).collect()
    }
    assert set(got) == set(per)
    for dst, c in per.items():
        top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[dst] == (sum(c.values()), len(c), top), dst
