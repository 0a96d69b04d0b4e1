"""WARC (Web ARChive, ISO 28500) source — the format Common Crawl
actually ships.

The north rule's pages table is extracted from Common-Crawl web
pages; CC distributes them as ``*.warc.gz`` files whose records are
INDIVIDUALLY gzipped and concatenated (one gzip member per record,
so a byte-range fetch of one record decompresses alone). This module
implements that layout for real, in pure stdlib:

- ``encode_warc`` writes a spec-shaped WARC/1.0 file: ``warcinfo``
  head record + one ``response`` record per page (WARC headers,
  ``Content-Length``-framed HTTP response block, ``\\r\\n\\r\\n``
  record separators), optionally gzip-member-per-record;
- ``iter_warc_records`` walks the reverse: multi-member gzip
  decompression (zlib, member by member) then a length-prefixed
  record walk — Content-Length framing, never a regex scan over
  payloads (a payload may legally contain ``WARC/1.0``);
- ``warc_pages`` is the Spark surface: a DataFrame with one BINARY
  column of WARC segment bytes → Arrow-batched ``mapInPandas`` →
  one row per record (url, warc_ts, rec_type, html, n_bytes). This
  is the same segment-parallel shape a real CC job uses: one task
  per WARC file, no shuffle — parsing scales with segment count.

Record framing references: ISO 28500 / the published WARC 1.1 spec
and Common Crawl's "Get Started" file layout (public docs). The
record separator after the Content-Length block is exactly
``\\r\\n\\r\\n``; gzip members carry one record each.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = b"\r\n"

WARC_RECORD_SCHEMA = (
    "segment_id long, url string, warc_ts timestamp, rec_type string, "
    "html string, n_bytes int"
)


def _http_response_block(html: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        + b"Content-Length: " + str(len(html)).encode() + CRLF + CRLF + html
    )


def encode_warc(
    pages: list[tuple[str, str, str]],
    gzip_per_record: bool = True,
    warcinfo: str = "software: linkgraph-synth",
) -> bytes:
    """[(url, iso_ts, html), ...] → WARC/1.0 file bytes (leading
    ``warcinfo`` record, then one ``response`` record per page).
    ``gzip_per_record=True`` produces the Common-Crawl ``.warc.gz``
    member-per-record layout."""

    def record(rec_type: str, headers: list[tuple[str, str]], body: bytes) -> bytes:
        head = b"WARC/1.0" + CRLF
        for k, v in [("WARC-Type", rec_type)] + headers + [
            ("Content-Length", str(len(body)))
        ]:
            head += f"{k}: {v}".encode() + CRLF
        return head + CRLF + body + CRLF + CRLF

    out = []
    info_body = (warcinfo + "\r\n").encode()
    out.append(
        record(
            "warcinfo",
            [("Content-Type", "application/warc-fields")],
            info_body,
        )
    )
    for url, ts, html in pages:
        body = _http_response_block(html.encode("utf-8"))
        out.append(
            record(
                "response",
                [
                    ("WARC-Target-URI", url),
                    ("WARC-Date", ts),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                body,
            )
        )
    if gzip_per_record:
        return b"".join(gzip.compress(r, compresslevel=1) for r in out)
    return b"".join(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz
    layout). zlib is asked for one member at a time; unused tail
    bytes feed the next member."""
    out, rest = [], payload
    while rest:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(rest))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member in WARC payload")
        rest = d.unused_data
    return b"".join(out)


def iter_warc_records(payload: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, body) per WARC record. Accepts plain WARC or
    gzip-member-per-record bytes (sniffed by magic). Framing is
    Content-Length driven: after the body exactly one ``\\r\\n\\r\\n``
    separator is consumed — a malformed separator raises rather than
    resyncing silently."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    i, n = 0, len(payload)
    while i < n:
        if payload[i : i + 5] != b"WARC/":
            raise ValueError(f"bad WARC version line at offset {i}")
        end = payload.index(CRLF, i)
        headers: dict[str, str] = {"__version__": payload[i:end].decode("ascii")}
        i = end + 2
        while payload[i : i + 2] != CRLF:
            end = payload.index(CRLF, i)
            line = payload[i:end].decode("utf-8", "replace")
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
            i = end + 2
        i += 2  # blank line → body
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"WARC record without valid Content-Length: {exc}")
        body = payload[i : i + length]
        if len(body) != length:
            raise ValueError("truncated WARC record body")
        i += length
        if payload[i : i + 4] != CRLF + CRLF:
            raise ValueError(f"missing WARC record separator at offset {i}")
        i += 4
        yield headers, body


def _response_html(body: bytes) -> str:
    """Strip the HTTP response head from an application/http body."""
    sep = body.find(CRLF + CRLF)
    return (body if sep < 0 else body[sep + 4 :]).decode("utf-8", "replace")


def warc_pages(
    segments: DataFrame,
    payload_col: str = "payload",
    id_col: str = "segment_id",
) -> DataFrame:
    """WARC segment bytes → one row per record, Arrow-batched
    mapInPandas (one Python pass per segment, no shuffle — the task
    granularity IS the WARC file, exactly how CC jobs partition).
    ``rec_type='response'`` rows carry the payload html (HTTP head
    stripped) and its byte count; other record types (warcinfo,
    request, metadata) pass through with NULL html so corpus
    accounting sees them."""
    import pandas as pd

    def run(batches):
        for b in batches:
            rows = []
            for sid, p in zip(b[id_col], b[payload_col]):
                for headers, body in iter_warc_records(bytes(p)):
                    rec_type = headers.get("WARC-Type", "unknown")
                    html = _response_html(body) if rec_type == "response" else None
                    ts = headers.get("WARC-Date")
                    rows.append(
                        {
                            "segment_id": int(sid),
                            "url": headers.get("WARC-Target-URI"),
                            "warc_ts": pd.Timestamp(ts) if ts else pd.NaT,
                            "rec_type": rec_type,
                            "html": html,
                            "n_bytes": len(html.encode("utf-8"))
                            if html is not None
                            else len(body),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "segment_id", "url", "warc_ts", "rec_type", "html", "n_bytes",
                ],
            )

    return segments.mapInPandas(run, WARC_RECORD_SCHEMA)


def synth_warc_segments(
    spark,
    n_segments: int = 8,
    pages_per_segment: int = 25,
    gzip_per_record: bool = True,
    partitions: int = 4,
) -> DataFrame:
    """Deterministic REAL-format WARC table: segment i holds a
    warcinfo record plus ``pages_per_segment`` response records whose
    url / timestamp / html are closed-form in (i, j) — the DuckDB
    oracle rebuilds the exact strings without a WARC parser, so any
    framing, gzip-member or HTTP-head-stripping mistake breaks the
    value hash:

        url  = http://site{(i*31+j) % 7}.test/p{i}/{j}
        ts   = 2026-01-01T00:00:00Z + (i*100 + j) minutes
        html = <html><head><title>T{i}-{j}</title></head>
               <body>{'x' * ((i*7 + j*13) % 50)}</body></html>
    """
    import datetime
    import pandas as pd

    def gen(batches):
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                pages = []
                for j in range(pages_per_segment):
                    ts = datetime.datetime(2026, 1, 1) + datetime.timedelta(
                        minutes=i * 100 + j
                    )
                    pages.append(
                        (
                            f"http://site{(i * 31 + j) % 7}.test/p{i}/{j}",
                            ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                            f"<html><head><title>T{i}-{j}</title></head>"
                            f"<body>{'x' * ((i * 7 + j * 13) % 50)}</body></html>",
                        )
                    )
                rows.append(
                    {
                        "segment_id": i,
                        "payload": encode_warc(pages, gzip_per_record=gzip_per_record),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_segments, numPartitions=partitions).mapInPandas(
        gen, "segment_id long, payload binary"
    )


def warc_corpus_stats(records: DataFrame) -> DataFrame:
    """Per-segment corpus accounting over parsed records: response
    count, total html bytes, min/max capture time — the bookkeeping
    row a crawl-ingest job emits per WARC file. Pure Catalyst over
    ``warc_pages`` output."""
    return (
        records.groupBy("segment_id")
        .agg(
            F.count(F.when(F.col("rec_type") == "response", 1)).alias("responses"),
            F.count(F.when(F.col("rec_type") == "warcinfo", 1)).alias("warcinfos"),
            F.sum(
                F.when(F.col("rec_type") == "response", F.col("n_bytes"))
            ).cast("long").alias("html_bytes"),
            F.min(F.when(F.col("rec_type") == "response", F.col("warc_ts"))).alias(
                "first_capture"
            ),
            F.max(F.when(F.col("rec_type") == "response", F.col("warc_ts"))).alias(
                "last_capture"
            ),
        )
    )
