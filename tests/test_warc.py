"""WARC source: spec-framing roundtrips (plain + gzip-member-per-
record), adversarial payloads, the Spark segment-parallel parse, and
corpus stats."""

import pytest

from linkgraph.sources.warc import (
    _response_html,
    encode_warc,
    iter_warc_records,
    synth_warc_segments,
    warc_corpus_stats,
    warc_pages,
)


def _pages(k):
    return [
        (
            f"http://s{i % 3}.test/p/{i}",
            "2026-01-01T00:00:%02dZ" % (i % 60),
            f"<html><body>{'z' * (i * 7 % 31)}</body></html>",
        )
        for i in range(k)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_encode_decode_roundtrip(gz):
    pages = _pages(7)
    recs = list(iter_warc_records(encode_warc(pages, gzip_per_record=gz)))
    assert recs[0][0]["WARC-Type"] == "warcinfo"
    resp = [(h, b) for h, b in recs if h["WARC-Type"] == "response"]
    assert len(resp) == 7
    for (h, b), (url, ts, html) in zip(resp, pages):
        assert h["WARC-Target-URI"] == url
        assert h["WARC-Date"] == ts
        assert _response_html(b) == html


def test_payload_containing_warc_magic_does_not_resync():
    """Content-Length framing, not pattern scanning: a body that
    embeds 'WARC/1.0' + separators parses as ONE record."""
    html = "WARC/1.0\r\n\r\n\r\n\r\nfake<html>x</html>"
    recs = list(iter_warc_records(encode_warc(
        [("http://t.test/a", "2026-01-01T00:00:00Z", html)], gzip_per_record=False
    )))
    assert len(recs) == 2
    assert _response_html(recs[1][1]) == html


def test_truncated_and_malformed_raise():
    data = encode_warc(_pages(2), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated|separator"):
        list(iter_warc_records(data[:-6]))
    with pytest.raises(ValueError, match="bad WARC version"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated gzip"):
        list(iter_warc_records(encode_warc(_pages(2))[:-4]))


def test_spark_parse_matches_python(spark):
    """warc_pages over synthesized gzip segments == the pure-Python
    walk of the same bytes; stats row is closed-form."""
    seg = synth_warc_segments(spark, n_segments=5, pages_per_segment=6).persist()
    raw = {int(r["segment_id"]): bytes(r["payload"]) for r in seg.collect()}
    rows = warc_pages(seg).collect()
    got = {
        (r["segment_id"], r["url"]): (r["rec_type"], r["html"])
        for r in rows
        if r["rec_type"] == "response"
    }
    n_info = sum(1 for r in rows if r["rec_type"] == "warcinfo")
    assert n_info == 5
    want = {}
    for sid, payload in raw.items():
        for h, b in iter_warc_records(payload):
            if h["WARC-Type"] == "response":
                want[(sid, h["WARC-Target-URI"])] = ("response", _response_html(b))
    assert got == want
    assert len(got) == 30
    stats = {r["segment_id"]: r for r in warc_corpus_stats(warc_pages(seg)).collect()}
    for sid in raw:
        assert stats[sid]["responses"] == 6
        assert stats[sid]["warcinfos"] == 1
        assert stats[sid]["html_bytes"] == sum(
            len(h.encode()) for (s, _), (_, h) in want.items() if s == sid
        )
    seg.unpersist()
