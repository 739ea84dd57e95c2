"""WARC source (io/warc.py): synthesized plain + member-gzip archives,
HTTP response parsing, strict/permissive corruption handling, and the
full crawl chain WARC → HTML extraction → quality rules."""

from __future__ import annotations

import gzip

import pytest

from ir_analyses_spark.io.warc import (
    WarcFormatError,
    iter_warc_records,
    read_warc,
    split_http_response,
)
from ir_analyses_spark.llm.html_extract import extract_text_df
from ir_analyses_spark.llm.quality_rules import quality_signals_df

HTML_A = (
    "<html><head><title>A</title></head><body><p>the cat sat on the mat "
    "and that was that</p></body></html>"
).encode()
HTML_B = "<html><body><h1>B page</h1><p>totally different text</p></body></html>".encode()


def _record(rtype: str, payload: bytes, uri: str | None = None, seq: int = 0) -> bytes:
    lines = [
        b"WARC/1.0",
        f"WARC-Type: {rtype}".encode(),
        f"WARC-Record-ID: <urn:uuid:0000-{seq}>".encode(),
        b"WARC-Date: 2023-05-06T07:08:09Z",
    ]
    if uri:
        lines.append(f"WARC-Target-URI: {uri}".encode())
    if rtype == "response":
        lines.append(b"Content-Type: application/http; msgtype=response")
    lines.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(status: str, ctype: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\nX-Robot: nope\r\n\r\n"
    ).encode() + body


RECORDS = [
    _record("warcinfo", b"software: synthetic-test\r\n", seq=0),
    _record("request", b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n", "http://a.example/", 1),
    _record("response", _http("200 OK", "text/html; charset=utf-8", HTML_A), "http://a.example/", 2),
    _record("response", _http("404 Not Found", "text/plain", b"gone"), "http://a.example/x", 3),
    _record("response", _http("200 OK", "text/html", HTML_B), "http://b.example/", 4),
]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "plain.warc").write_bytes(b"".join(RECORDS))
    # Common Crawl layout: one gzip member per record, concatenated
    (d / "member.warc.gz").write_bytes(b"".join(gzip.compress(r) for r in RECORDS))
    return d


def test_iter_warc_records_pure_python():
    recs = list(iter_warc_records(b"".join(RECORDS)))
    assert len(recs) == 5
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "response", "response",
    ]
    assert all(h["warc-version"] == "WARC/1.0" for h, _ in recs)
    status, ctype, body = split_http_response(recs[2][1])
    assert (status, ctype, body) == (200, "text/html; charset=utf-8", HTML_A)


def test_read_plain_and_membergzip_agree(spark, warc_dir):
    plain = read_warc(spark, str(warc_dir / "plain.warc")).collect()
    gz = read_warc(spark, str(warc_dir / "member.warc.gz")).collect()
    assert len(plain) == len(gz) == 5

    def key(rows):
        return [
            (r["record_seq"], r["warc_type"], r["target_uri"],
             r["content_length"], bytes(r["payload"]))
            for r in sorted(rows, key=lambda r: r["record_seq"])
        ]

    assert key(plain) == key(gz)
    r2 = key(plain)[2]
    assert r2[1] == "response" and r2[2] == "http://a.example/"
    assert plain[0]["warc_date"] is not None
    assert plain[0]["warc_date"].year == 2023


def test_read_directory_glob_and_http_parse(spark, warc_dir):
    df = read_warc(spark, str(warc_dir), parse_http=True)
    rows = df.collect()
    assert len(rows) == 10  # both files
    responses = [r for r in rows if r["warc_type"] == "response"]
    assert all(r["http_status"] in (200, 404) for r in responses)
    ok_html = [
        r for r in responses
        if r["http_status"] == 200 and "text/html" in (r["http_content_type"] or "")
    ]
    assert {bytes(r["body"]) for r in ok_html} == {HTML_A, HTML_B}
    non_resp = [r for r in rows if r["warc_type"] != "response"]
    assert all(r["http_status"] is None and r["body"] is None for r in non_resp)


def test_corrupt_strict_raises(spark, tmp_path):
    bad = b"".join(RECORDS[:2]) + RECORDS[2][: len(RECORDS[2]) - 40]
    p = tmp_path / "trunc.warc"
    p.write_bytes(bad)
    with pytest.raises(Exception, match="payload runs past end of stream"):
        read_warc(spark, str(p)).collect()


def test_corrupt_permissive_keeps_parsed_prefix(spark, tmp_path):
    bad = b"".join(RECORDS[:2]) + RECORDS[2][: len(RECORDS[2]) - 40]
    p = tmp_path / "trunc2.warc"
    p.write_bytes(bad)
    rows = sorted(
        read_warc(spark, str(p), permissive=True).collect(),
        key=lambda r: r["record_seq"],
    )
    assert [r["warc_type"] for r in rows] == ["warcinfo", "request", "_error"]
    assert b"payload runs past" in bytes(rows[2]["payload"])


def test_garbage_not_warc_strict_and_permissive(spark, tmp_path):
    p = tmp_path / "junk.warc"
    p.write_bytes(b"this is not a warc stream at all")
    with pytest.raises(Exception, match="expected 'WARC/' record marker"):
        read_warc(spark, str(p)).collect()
    rows = read_warc(spark, str(p), permissive=True).collect()
    assert [r["warc_type"] for r in rows] == ["_error"]


def test_e2e_crawl_to_quality(spark, warc_dir):
    """The full curation front half: WARC → HTTP bodies → HTML text →
    quality signals, all DataFrame stages."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, str(warc_dir / "member.warc.gz"), parse_http=True)
    pages = (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        )
        .select(
            F.col("record_seq").cast("long").alias("doc_id"),
            F.col("body").cast("string").alias("html"),
        )
    )
    text = extract_text_df(pages)
    sig = {r["doc_id"]: r for r in quality_signals_df(text).collect()}
    assert set(sig) == {2, 4}
    assert sig[2]["stopwords_present"] >= 2  # "the", "and", "that"
    assert sig[2]["n_words"] == 10
    titles = {r["doc_id"]: r["title"] for r in text.collect()}
    assert titles[2] == "A" and titles[4] is None


def test_corrupt_deflate_inside_valid_gzip(spark, tmp_path):
    """zlib.error (bad deflate bits under a valid gzip header) must hit
    the same strict/permissive contract as a bad gzip envelope."""
    member = gzip.compress(RECORDS[0])
    corrupt = member[:20] + bytes(b ^ 0xFF for b in member[20:28]) + member[28:]
    p = tmp_path / "deflate.warc.gz"
    p.write_bytes(corrupt)
    with pytest.raises(Exception, match="gzip decompress failed"):
        read_warc(spark, str(p)).collect()
    rows = read_warc(spark, str(p), permissive=True).collect()
    assert [r["warc_type"] for r in rows] == ["_error"]
    assert b"gzip decompress failed" in bytes(rows[0]["payload"])


def test_folded_header_continuation():
    """ISO 28500 LWS folding: a continuation line extends the previous
    header's value instead of raising."""
    payload = b"x"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.com/very/long\r\n"
        b"\t/folded/tail\r\n"
        b"Content-Length: 1\r\n\r\n" + payload + b"\r\n\r\n"
    )
    (headers, body), = list(iter_warc_records(rec))
    assert headers["warc-target-uri"] == "http://example.com/very/long /folded/tail"
    assert body == payload
    bad = b"WARC/1.0\r\n \tcontinuation first\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    with pytest.raises(WarcFormatError, match="continuation line before"):
        list(iter_warc_records(bad))


def test_read_wet_documents(spark, tmp_path):
    """WET layout: conversion records whose payload is the page text."""
    from ir_analyses_spark.io.warc import read_wet_documents

    wet = [
        _record("warcinfo", b"software: wet-test\r\n", seq=0),
        _record("conversion", "first page text\nwith lines".encode(), "http://a.example/", 1),
        _record("conversion", "second page text".encode(), "http://b.example/x", 2),
    ]
    p = tmp_path / "x.warc.wet.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in wet))
    rows = read_wet_documents(spark, str(p)).collect()
    assert len(rows) == 2
    by_url = {r["url"]: r for r in rows}
    assert by_url["http://a.example/"]["text"] == "first page text\nwith lines"
    assert by_url["http://b.example/x"]["text"] == "second page text"
    assert len({r["doc_id"] for r in rows}) == 2
    assert all(r["warc_date"] is not None for r in rows)


def _http_hdrs(extra: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n{extra}\r\n\r\n"
    ).encode() + body


def _chunk(body: bytes, sizes: list[int]) -> bytes:
    out, pos = [], 0
    for s in sizes:
        out.append(f"{s:x}".encode() + b"\r\n" + body[pos:pos + s] + b"\r\n")
        pos += s
    assert pos == len(body)
    return b"".join(out) + b"0\r\n\r\n"


def test_http_body_chunked_and_content_encodings():
    """r7 ADVICE: chunked / gzip / deflate response bodies must reach
    the corpus as readable text, not encoded garbage."""
    doc = b"<html><body>hello encoded world</body></html>"
    # chunked framing, with a chunk extension on the first chunk
    chunked = _chunk(doc, [10, len(doc) - 10])
    chunked = chunked.replace(b"a\r\n", b"a;ext=1\r\n", 1)
    s, c, body = split_http_response(
        _http_hdrs("Transfer-Encoding: chunked", chunked)
    )
    assert (s, c, body) == (200, "text/html", doc)
    # gzip content coding
    s, _, body = split_http_response(
        _http_hdrs("Content-Encoding: gzip", gzip.compress(doc))
    )
    assert (s, body) == (200, doc)
    # zlib-wrapped and raw deflate
    import zlib

    s, _, body = split_http_response(
        _http_hdrs("Content-Encoding: deflate", zlib.compress(doc))
    )
    assert body == doc
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    s, _, body = split_http_response(
        _http_hdrs("Content-Encoding: deflate", raw.compress(doc) + raw.flush())
    )
    assert body == doc
    # chunked THEN gzip (TE applies outermost)
    s, _, body = split_http_response(
        _http_hdrs(
            "Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
            _chunk(gzip.compress(doc), [len(gzip.compress(doc))]),
        )
    )
    assert body == doc


def test_http_body_malformed_encodings_fall_back_to_raw():
    """Malformed framing / unknown codings keep the raw bytes — a
    best-effort recovery must never drop a record that parses today."""
    blob = b"not really chunked at all"
    s, _, body = split_http_response(
        _http_hdrs("Transfer-Encoding: chunked", blob)
    )
    assert (s, body) == (200, blob)
    s, _, body = split_http_response(
        _http_hdrs("Content-Encoding: gzip", blob)
    )
    assert body == blob
    s, _, body = split_http_response(
        _http_hdrs("Content-Encoding: br", blob)
    )
    assert body == blob  # unmodeled coding → raw
    # truncated chunk data
    s, _, body = split_http_response(
        _http_hdrs("Transfer-Encoding: chunked", b"ff\r\nshort\r\n")
    )
    assert body == b"ff\r\nshort\r\n"


def test_chunked_rejects_non_rfc_size_tokens():
    """Review-caught: int(x, 16) accepts '-2'/'+2'/'1_0', which RFC 9112
    framing does not — a negative size 'succeeded' with a truncated
    body instead of falling back to the raw bytes."""
    for blob in (b"-2\r\n0\r\n\r\n", b"+2\r\nab\r\n0\r\n\r\n",
                 b"1_0\r\n" + b"x" * 16 + b"\r\n0\r\n\r\n"):
        s, _, body = split_http_response(
            _http_hdrs("Transfer-Encoding: chunked", blob)
        )
        assert (s, body) == (200, blob), blob  # raw fallback, not b""


def test_transfer_encoding_list_gzip_chunked():
    """Review-caught: 'Transfer-Encoding: gzip, chunked' must undo BOTH
    codings (gzip applied first, chunked outermost)."""
    doc = b"<html><body>listed transfer codings</body></html>"
    gz = gzip.compress(doc)
    s, _, body = split_http_response(
        _http_hdrs("Transfer-Encoding: gzip, chunked", _chunk(gz, [len(gz)]))
    )
    assert (s, body) == (200, doc)
    # deflate as a transfer coding, no chunked at all
    import zlib

    s, _, body = split_http_response(
        _http_hdrs("Transfer-Encoding: deflate", zlib.compress(doc))
    )
    assert body == doc


def test_repeated_header_lines_merge_as_list_fields():
    """r8 ADVICE: RFC 9110 list fields may repeat as separate lines
    ('Transfer-Encoding: gzip' + 'Transfer-Encoding: chunked') and are
    equivalent to one comma-joined field — first-wins header collection
    lost the chunked flag and shipped a chunk-framed body downstream."""
    doc = b"<html><body>repeated header lines</body></html>"
    gz = gzip.compress(doc)
    s, _, body = split_http_response(
        _http_hdrs(
            "Transfer-Encoding: gzip\r\nTransfer-Encoding: chunked",
            _chunk(gz, [len(gz)]),
        )
    )
    assert (s, body) == (200, doc)
    # chunked alone on a second line (the most common shape)
    s, _, body = split_http_response(
        _http_hdrs(
            "X-Filler: 1\r\nTransfer-Encoding: chunked",
            _chunk(doc, [len(doc)]),
        )
    )
    assert (s, body) == (200, doc)


def test_repeated_and_listed_content_encoding():
    """Review-caught: Content-Encoding is an RFC 9110 list field too —
    the repeated-header merge can produce 'gzip, gzip', and a single
    header may list multiple codings applied in order; the decoder
    must undo them in reverse, and a duplicate-listed coding must not
    leak compressed bytes through as garbage text."""
    doc = b"<html><body>listed content codings</body></html>"
    # duplicate-listed gzip (merged repeated lines): decode once, then
    # the second pass sees plain bytes and leaves them alone
    s, _, body = split_http_response(
        _http_hdrs(
            "Content-Encoding: gzip\r\nContent-Encoding: gzip",
            gzip.compress(doc),
        )
    )
    assert (s, body) == (200, doc)
    # deflate then gzip listed in one header: undo outermost-last
    import zlib

    s, _, body = split_http_response(
        _http_hdrs(
            "Content-Encoding: deflate, gzip",
            gzip.compress(zlib.compress(doc)),
        )
    )
    assert (s, body) == (200, doc)


def test_repeated_singleton_headers_stay_first_wins():
    """Review-caught: the comma-merge applies ONLY to RFC 9110 list
    fields — a duplicated Content-Type must keep the first value, not
    become 'text/html, text/plain'."""
    doc = b"<html><body>singleton header dupes</body></html>"
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Type: text/plain\r\n"
        b"Set-Cookie: a=1; Expires=Wed, 21 Oct 2026 07:28:00 GMT\r\n"
        b"Set-Cookie: b=2\r\n"
        b"\r\n" + doc
    )
    s, ctype, body = split_http_response(payload)
    assert (s, ctype, body) == (200, "text/html", doc)


def test_member_per_record_decompress_is_linear():
    """Scale regression (caught by the 5M-page composed-ladder run):
    stdlib gzip.decompress loops concatenated members by re-slicing
    unused_data — O(members x bytes) — and Common Crawl's layout is one
    member PER RECORD, tens of thousands per shard. The threshold is
    calibrated to actually bite (review-caught: a 20k-member / 10 s
    canary passed on the quadratic path at 4.97 s): at 60k members the
    quadratic form measures ~45 s on this class of box while the
    streamed path stays ~0.3 s, so 8 s separates them by an order of
    magnitude in both directions."""
    import time

    from ir_analyses_spark.io.warc import _decompress

    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://x.example/p\r\n"
        b"Content-Length: 40\r\n\r\n" + b"y" * 40 + b"\r\n\r\n"
    )
    member = gzip.compress(rec, 1)
    blob = member * 60_000
    t = time.monotonic()
    out = _decompress(blob)
    assert time.monotonic() - t < 8.0
    assert out == rec * 60_000
