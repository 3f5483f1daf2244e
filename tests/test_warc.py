"""WARC source (levsim/extras/warc.py): writer/parser roundtrip, gzip
handling, non-response skipping, malformed-input errors, and the
distributed read_warc -> pages-schema path."""

import gzip

import pytest

from levsim.extras import warc


RECS = [
    ("https://www.example.com/a", "2020-05-01T12:00:00Z",
     b"<html><body>the quick brown fox and the lazy dog</body></html>"),
    ("https://example.org/b", "2020-05-02T08:30:00Z",
     b"<html><body>el perro y el gato en la casa</body></html>"),
]


def test_write_parse_roundtrip():
    raw = warc.write_warc(RECS)
    got = list(warc.parse_warc(raw))
    assert [(g["url"], g["warc_ts"], g["html"]) for g in got] == RECS


def test_parse_gzip_single_and_multi_member():
    raw = warc.write_warc(RECS, gzip_out=True)
    assert [g["url"] for g in warc.parse_warc(raw)] == [r[0] for r in RECS]
    # Common-Crawl layout: one gzip member PER record, concatenated
    members = b"".join(
        gzip.compress(warc.write_warc([r])) for r in RECS
    )
    assert [g["url"] for g in warc.parse_warc(members)] == [r[0] for r in RECS]


def test_parse_skips_non_response_records():
    body = b"GET / HTTP/1.1\r\n\r\n"
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://example.com/a\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body + b"\r\n\r\n"
    )
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    combined = info + req + warc.write_warc(RECS[:1])
    got = list(warc.parse_warc(combined))
    assert len(got) == 1 and got[0]["url"] == RECS[0][0]


def test_parse_payload_without_http_block():
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: x://raw\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"Content-Length: 11\r\n\r\nhello bytes\r\n\r\n"
    )
    got = list(warc.parse_warc(rec))
    assert got[0]["html"] == b"hello bytes"


def test_parse_malformed_raises():
    with pytest.raises(ValueError):
        list(warc.parse_warc(b"GIF89a not a warc"))
    with pytest.raises(ValueError):
        list(warc.parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx"))  # no length
    truncated = warc.write_warc(RECS)[:-40]
    with pytest.raises(ValueError):
        list(warc.parse_warc(truncated))


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(warc.write_warc(RECS[:1]))
    (tmp_path / "b.warc.gz").write_bytes(warc.write_warc(RECS[1:], gzip_out=True))
    df = warc.read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {RECS[0][0], RECS[1][0]}
    a = rows[RECS[0][0]]
    # input_hint invariant: byte-identical extracted text per url
    assert a["html"] == bytearray(RECS[0][2])
    assert a["text"] == "the quick brown fox and the lazy dog"
    assert a["lang"] == "en"
    assert rows[RECS[1][0]]["lang"] == "es"
    assert a["warc_ts"].year == 2020 and a["warc_ts"].hour == 12
    assert df.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )


def test_parse_warc_adversarial_bodies():
    """HTML bodies containing WARC-looking content, bare CRLFs, gzip magic
    and NUL bytes must roundtrip byte-identically — Content-Length framing,
    not sentinel scanning, delimits records."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    nasty = st.binary(min_size=0, max_size=400) | st.sampled_from([
        b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n",
        b"HTTP/1.1 200 OK\r\n\r\nfake",
        b"\x1f\x8b\x08fake-gzip",
        b"\xff\xd8\xff\xd9",
        b"\r\n" * 50,
        b"\x00" * 64,
    ])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(nasty, min_size=1, max_size=5), st.booleans())
    def check(bodies, gz):
        recs = [
            (f"https://x.example/{i}", "2021-01-01T00:00:00Z", b)
            for i, b in enumerate(bodies)
        ]
        got = list(warc.parse_warc(warc.write_warc(recs, gzip_out=gz)))
        assert [(g["url"], g["html"]) for g in got] == [
            (u, b) for (u, _, b) in recs
        ]

    check()
