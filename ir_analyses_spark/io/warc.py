"""WARC (ISO 28500) web-archive source — the input format of
Common-Crawl-scale training-data pipelines (SURVEY §2B LLM ext, source
side; feeds `llm/html_extract` → `llm/quality_rules` → `llm/dedup`).

Reads `.warc` and `.warc.gz` files (including the member-per-record
gzip layout Common Crawl uses — stdlib ``gzip`` decompresses
concatenated members transparently) into one row per WARC record, with
optional HTTP-response parsing (status line + header/body split) for
``response`` records.

Spark plumbing: ``spark.read.format("binaryFile")`` delivers one row
per file (whole-file bytes), and an Arrow-batched ``mapInPandas``
walks the records — the same source pattern as the repo's media
decoders (`llm/multimodal.py`). Scale posture: WARC is a
non-splittable record stream (gzip members carry no sync markers the
JVM reader can use), so the parallel unit is the FILE — exactly how
Common Crawl shards its corpus (~1 GB per warc.gz, ~64k files per
crawl). A 100 TB crawl is ~100k files → ~100k tasks; per-task memory
is one decompressed file (bounded by the crawl's shard size), and no
shuffle happens at all. ``binaryFile`` keeps `path`/`length` pushdown
(PushedFilters on file metadata) so `limit_files`-style pruning stays
scan-side.

HTTP bodies are transfer-decoded: ``Transfer-Encoding: chunked`` is
reassembled and ``Content-Encoding: gzip``/``deflate`` undone, so
real-crawl responses reach the HTML/quality gates as readable text
instead of being silently attrited as garbage; unknown codings fall
back to raw bytes.

Strictness: a malformed record RAISES by default with file + offset
context (a silently-truncated crawl read is corpus loss); pass
``permissive=True`` to instead emit a single ``_error`` pseudo-record
for the file's unparsed remainder and keep every record that did parse
— the trade Common Crawl consumers usually want.

New module per the evidence-ledger rule; verified by
`tests/test_warc.py` (synthesized plain + member-gzip archives, strict
and permissive corruption handling, and the full WARC → HTML → quality
chain).
"""

from __future__ import annotations

import gzip
import io as _io
import re
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"

#: HTTP fields with RFC 9110 #(...) list syntax — repeated lines are
#: equivalent to one comma-joined field and are merged as such; every
#: other repeated field stays first-wins (comma-joining a singleton
#: like Content-Type, or Set-Cookie whose values contain commas, would
#: corrupt it). Only fields this reader or its consumers touch, plus
#: the common hop-by-hop list fields, are enumerated.
_LIST_HEADER_FIELDS = frozenset(
    {
        "transfer-encoding", "content-encoding", "accept-encoding",
        "connection", "upgrade", "via", "vary", "te", "trailer",
        "cache-control", "pragma", "allow", "accept", "accept-language",
        "warning", "content-language",
    }
)

WARC_SCHEMA = (
    "path string, record_seq int, warc_type string, record_id string, "
    "warc_date timestamp, target_uri string, content_type string, "
    "content_length long, payload binary"
)
WARC_HTTP_SCHEMA = WARC_SCHEMA + (
    ", http_status int, http_content_type string, body binary"
)


class WarcFormatError(ValueError):
    """Raised (strict mode) when a WARC stream violates the format."""


def _parse_warc_date(v: str | None):
    if not v:
        return None
    try:
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def iter_warc_records(
    data: bytes, *, source: str = "<bytes>"
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk a decompressed WARC stream → (headers, payload) per record.

    ``headers`` is lower-cased header-name → value and additionally
    carries the version line under ``"warc-version"``. Raises
    :class:`WarcFormatError` with byte-offset context on malformation.
    """
    pos, n = 0, len(data)
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            raise WarcFormatError(
                f"{source}: offset {pos}: expected 'WARC/' record marker, "
                f"got {data[pos : pos + 16]!r}"
            )
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            raise WarcFormatError(
                f"{source}: offset {pos}: unterminated record header"
            )
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers = {"warc-version": lines[0].strip()}
        last_name: str | None = None
        for ln in lines[1:]:
            if ln[:1] in (" ", "\t"):
                # ISO 28500 permits LWS-folded continuation lines: they
                # extend the PREVIOUS header's value
                if last_name is None:
                    raise WarcFormatError(
                        f"{source}: offset {pos}: continuation line "
                        f"before any header: {ln!r}"
                    )
                headers[last_name] = f"{headers[last_name]} {ln.strip()}"
                continue
            name, sep, value = ln.partition(":")
            if not sep:
                raise WarcFormatError(
                    f"{source}: offset {pos}: malformed header line {ln!r}"
                )
            last_name = name.strip().lower()
            headers[last_name] = value.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcFormatError(
                f"{source}: offset {pos}: missing/invalid Content-Length"
            ) from None
        body_start = hdr_end + len(_CRLF2)
        if body_start + clen > n:
            raise WarcFormatError(
                f"{source}: offset {pos}: payload runs past end of stream "
                f"(Content-Length {clen}, {n - body_start} bytes left)"
            )
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


_CHUNK_SIZE_RE = re.compile(rb"^[0-9a-fA-F]{1,16}$")


def _dechunk(body: bytes) -> bytes:
    """Reassemble a Transfer-Encoding: chunked body (RFC 9112 §7.1).
    Raises ValueError on malformed framing — the caller falls back to
    the raw bytes rather than dropping the record."""
    out = []
    pos = 0
    while True:
        line_end = body.find(b"\r\n", pos)
        if line_end < 0:
            raise ValueError("chunk size line not terminated")
        size_token = body[pos:line_end].split(b";", 1)[0].strip()
        # int(x, 16) alone would accept '-2', '+2', '1_0' — framing
        # Python's int grammar allows but RFC 9112 does not; a negative
        # size would silently 'succeed' with a truncated body instead
        # of triggering the raw-bytes fallback (review-caught)
        if not _CHUNK_SIZE_RE.match(size_token):
            raise ValueError(f"invalid chunk size token {size_token!r}")
        size = int(size_token, 16)
        if size == 0:
            return b"".join(out)  # trailers (if any) are discarded
        start = line_end + 2
        end = start + size
        if end + 2 > len(body):
            raise ValueError("chunk data truncated")
        if body[end : end + 2] != b"\r\n":
            raise ValueError("chunk data not CRLF-terminated")
        out.append(body[start:end])
        pos = end + 2


def _decompress_coding(body: bytes, coding: str) -> bytes:
    """Undo one gzip/deflate coding; unknown codings and decompression
    failures return the input unchanged (best-effort recovery)."""
    try:
        if coding in ("gzip", "x-gzip"):
            return gzip.decompress(body)
        if coding == "deflate":
            try:
                return zlib.decompress(body)
            except zlib.error:
                # some servers send raw deflate without the zlib wrapper
                return zlib.decompress(body, -zlib.MAX_WBITS)
    except (OSError, EOFError, zlib.error):
        pass
    return body


def _decode_http_body(body: bytes, headers: dict[str, str]) -> bytes:
    """Undo Transfer-Encoding (chunked, and any gzip/deflate transfer
    codings listed alongside it, e.g. 'gzip, chunked') and then
    Content-Encoding: gzip/deflate — all common in real crawl WARC
    response records (r7 ADVICE: leaving them encoded made such pages
    decode to garbage strings that the HTML/quality gates silently
    dropped — corpus loss). Unknown codings or malformed framing fall
    back to the raw bytes: a best-effort recovery must never turn a
    today-readable record into an exception."""
    te = [
        c.strip()
        for c in headers.get("transfer-encoding", "").lower().split(",")
        if c.strip()
    ]
    if "chunked" in te:
        try:
            body = _dechunk(body)
        except ValueError:
            return body
        te.remove("chunked")
    # remaining transfer codings were applied before chunking, so undo
    # them innermost-last (reverse list order)
    for coding in reversed(te):
        body = _decompress_coding(body, coding)
    # Content-Encoding is a LIST field too (RFC 9110 §8.4): codings are
    # applied in the order listed, so undo them in reverse. Also covers
    # the repeated-header merge above producing e.g. 'gzip, gzip' —
    # passing the joined string whole would match no coding and leak
    # compressed bytes to the quality gates as garbage (review-caught)
    ce_list = [
        c.strip()
        for c in headers.get("content-encoding", "").lower().split(",")
        if c.strip()
    ]
    for coding in reversed(ce_list):
        body = _decompress_coding(body, coding)
    return body


def split_http_response(payload: bytes):
    """(status, content_type, body) from an HTTP response payload, or
    (None, None, None) when the payload isn't an HTTP response.

    The body is returned TRANSFER-DECODED: chunked framing is
    reassembled and gzip/deflate content codings are undone (see
    `_decode_http_body`); anything unrecognized or malformed yields
    the raw bytes unchanged."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None
    split = payload.find(_CRLF2)
    if split < 0:
        return None, None, None
    head = payload[:split].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        name, sep, value = ln.partition(":")
        if sep:
            key = name.strip().lower()
            # RFC 9110 LIST fields may legally repeat ('Transfer-Encoding:
            # gzip' + 'Transfer-Encoding: chunked' on separate lines) and
            # are equivalent to one comma-joined field; a first-wins
            # setdefault would lose the chunked flag and hand the funnel a
            # still-chunk-framed body (r8 ADVICE). The merge applies ONLY
            # to list fields: comma-joining a repeated SINGLETON header
            # (duplicate Content-Type, or Set-Cookie — whose Expires
            # values legally contain commas, RFC 9110 §5.3) would corrupt
            # the exported column, so those stay first-wins
            # (review-caught).
            if key in _LIST_HEADER_FIELDS and key in headers:
                headers[key] = f"{headers[key]}, {value.strip()}"
            else:
                headers.setdefault(key, value.strip())
    body = _decode_http_body(payload[split + len(_CRLF2) :], headers)
    return status, headers.get("content-type"), body


def _decompress(content: bytes) -> bytes:
    if content[:2] == _GZIP_MAGIC:
        # stream, do NOT gzip.decompress(): stdlib decompress() loops
        # members by re-slicing `unused_data` per member — O(members ×
        # bytes), and the per-RECORD-member layout Common Crawl uses
        # (this module's documented target) puts `members` in the tens
        # of thousands per shard: a 37 MB / 78k-member WET shard took
        # >5 min quadratic vs ~1 s streamed (caught by the 5M-page
        # composed-ladder scale run). GzipFile reads concatenated
        # members sequentially without the copy.
        return gzip.GzipFile(fileobj=_io.BytesIO(content)).read()
    return content


def _file_records(
    path: str, content: bytes, parse_http: bool, permissive: bool
) -> Iterator[dict]:
    try:
        data = _decompress(content)
    except (OSError, EOFError, zlib.error) as e:
        # zlib.error is NOT an OSError: corrupted deflate data inside a
        # valid gzip header raises it, and it must hit the same
        # fail-loud / _error-row contract as a bad gzip envelope
        if not permissive:
            raise WarcFormatError(f"{path}: gzip decompress failed: {e}") from e
        yield _error_row(path, 0, f"gzip decompress failed: {e}", parse_http)
        return
    seq = 0
    it = iter_warc_records(data, source=path)
    while True:
        try:
            headers, payload = next(it)
        except StopIteration:
            return
        except WarcFormatError as e:
            if not permissive:
                raise
            yield _error_row(path, seq, str(e), parse_http)
            return
        row = {
            "path": path,
            "record_seq": seq,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "warc_date": _parse_warc_date(headers.get("warc-date")),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": len(payload),
            "payload": payload,
        }
        if parse_http:
            if headers.get("warc-type") == "response":
                status, ctype, body = split_http_response(payload)
            else:
                status, ctype, body = None, None, None
            row.update(
                http_status=status, http_content_type=ctype, body=body
            )
        seq += 1
        yield row


def _error_row(path: str, seq: int, msg: str, parse_http: bool) -> dict:
    row = {
        "path": path,
        "record_seq": seq,
        "warc_type": "_error",
        "record_id": None,
        "warc_date": None,
        "target_uri": None,
        "content_type": None,
        "content_length": 0,
        "payload": msg.encode("utf-8"),
    }
    if parse_http:
        row.update(http_status=None, http_content_type=None, body=None)
    return row


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    parse_http: bool = False,
    permissive: bool = False,
    path_glob: str = "*.warc*",
) -> DataFrame:
    """One row per WARC record under ``path`` (dir, file, or glob).

    With ``parse_http=True``, ``response`` records additionally carry
    (http_status, http_content_type, body).
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in _schema(parse_http).split(", ")]
        for b in batches:
            # one output frame PER FILE: peak task memory stays one
            # decompressed shard (the documented bound), not every file
            # Arrow happened to pack into this batch at once
            for p, c in zip(b["path"], b["content"]):
                rows = list(
                    _file_records(p, bytes(c), parse_http, permissive)
                )
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=_schema(parse_http))


def _schema(parse_http: bool) -> str:
    return WARC_HTTP_SCHEMA if parse_http else WARC_SCHEMA


def read_wet_documents(
    spark: SparkSession,
    path: str,
    *,
    permissive: bool = False,
    path_glob: str = "*.warc.wet*",
) -> DataFrame:
    """Documents straight from WET extracts (Common Crawl's
    pre-extracted text distribution: ``conversion`` records whose
    payload IS the page text, UTF-8).

    One row per conversion record: (doc_id, url, warc_date, text) with
    ``doc_id = xxhash64(path#record_seq)`` — the same document identity
    rule `llm/curate.py` uses, so WET corpora drop into the curation
    funnel downstream of the extraction stage (their text is already
    extracted; the quality/dedup stages apply unchanged).
    """
    from pyspark.sql import functions as F

    recs = read_warc(
        spark, path, parse_http=False, permissive=permissive,
        path_glob=path_glob,
    )
    # a conversion record without a target URI has no document identity
    # the funnel's URL stages could use — drop it rather than emit a
    # NULL-url row no WARC-path run could produce
    return recs.filter(
        (F.col("warc_type") == "conversion")
        & F.col("target_uri").isNotNull()
    ).select(
        F.xxhash64(F.concat_ws("#", "path", "record_seq")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        "warc_date",
        F.col("payload").cast("string").alias("text"),
    )
