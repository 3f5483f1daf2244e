"""WARC ingestion: Common-Crawl-style archives -> the input_hint pages
schema (url, warc_ts, html, text, lang).

The reference pipeline's stated input (BASELINE.json input_hint) is an
Iceberg table of Common-Crawl-style web pages; Common Crawl itself ships
WARC files (ISO 28500, public).  This module closes the gap between "a
directory of .warc files" and the engine's pages table:

- :func:`parse_warc` — pure-Python record walker for the WARC/1.0 layout
  (header block, Content-Length-delimited payload, CRLF CRLF record gap);
  response records carry an HTTP message whose body is the HTML.
- :func:`read_warc` — the distributed reader: ``binaryFile`` scan (one
  task per archive — Common Crawl's natural granularity, ~1 GB gzip
  members per file) -> mapInPandas parse -> typed pages rows with text
  extracted via the engine's byte-identical column expression and lang
  from the stopword language id.
- :func:`write_warc` — a minimal writer so tests exercise real bytes
  without fixture files (and so synthetic corpora can round-trip).

Scale shape: parsing is stream-local per file (no shuffle); the returned
DataFrame feeds ``SnapshotTable.write`` / the ER pipeline directly.
Gzip'd archives (.warc.gz) are transparently handled when each file is a
plain single-member gzip; Common Crawl's per-record gzip members also
concatenate correctly under zlib's multi-member decompression loop below.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw bytes pass
    through untouched."""
    if len(buf) < 2 or buf[:2] != b"\x1f\x8b":
        return buf
    out = []
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(buf[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(buf) - len(tail)
    return b"".join(out)


def parse_warc(buf: bytes) -> Iterator[dict]:
    """Yield {'url', 'warc_ts', 'html'} for every response record.

    Tolerates request/metadata/warcinfo records (skipped), LF-only header
    endings, and HTTP payloads with or without status/header blocks."""
    buf = _gunzip_members(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines (CRLF CRLF record gap, any mix)
        while pos < n and buf[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        if not buf[pos:].startswith(b"WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr_end = buf.find(b"\r\n\r\n", pos)
        sep = 4
        if hdr_end == -1:
            hdr_end = buf.find(b"\n\n", pos)
            sep = 2
        if hdr_end == -1:
            raise ValueError("truncated WARC header block")
        headers = {}
        for line in buf[pos:hdr_end].splitlines()[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        body_start = hdr_end + sep
        payload = buf[body_start: body_start + length]
        if len(payload) < length:
            raise ValueError("truncated WARC payload")
        pos = body_start + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        # response payload is an HTTP message: body follows the first blank
        # line; payloads without an HTTP header block are taken whole
        http_end = payload.find(b"\r\n\r\n")
        html = payload[http_end + 4:] if (
            http_end != -1 and payload[:5] == b"HTTP/"
        ) else payload
        yield {"url": url, "warc_ts": ts, "html": html}


def write_warc(records: List[Tuple[str, str, bytes]], gzip_out: bool = False) -> bytes:
    """Minimal WARC/1.0 writer: records are (url, iso_ts, html_bytes);
    each becomes a response record wrapping an HTTP 200 message."""
    out = io.BytesIO()
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        out.write(hdr + http + b"\r\n\r\n")
    raw = out.getvalue()
    if gzip_out:
        import gzip as _gz

        return _gz.compress(raw)
    return raw


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan -> pages DataFrame (input_hint schema:
    url, warc_ts, html, text, lang).

    One parse task per archive file (``binaryFile`` source, the Common-
    Crawl granularity); text via the engine's byte-identical extraction
    expression, lang via the stopword language id — both pure column
    expressions applied AFTER the Python parse, so the only Python work is
    the record walk itself."""
    import pandas as pd

    from ..tables import extract_text_from_html
    from .textstats import lang_id

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": []}
            for blob in pdf["content"]:
                for rec in parse_warc(bytes(blob)):
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(rec["warc_ts"])
                    rows["html"].append(rec["html"])
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], errors="coerce",
                                            utc=True).dt.tz_localize(None)
            yield out

    raw = files.mapInPandas(parse, "url string, warc_ts timestamp, html binary")
    return raw.select(
        "url",
        "warc_ts",
        "html",
        extract_text_from_html(F.col("html")).alias("text"),
    ).withColumn("lang", lang_id(F.col("text")))
