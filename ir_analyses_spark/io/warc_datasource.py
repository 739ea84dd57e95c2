"""WARC as a Spark 4 Python DataSource: ``spark.read.format("warc")``.

`io/warc.read_warc` rides ``binaryFile`` + ``mapInPandas`` — correct and
parallel, but its per-task memory is ONE WHOLE DECOMPRESSED FILE,
because binaryFile can only hand over complete file bytes. Common Crawl
shards are ~1 GB compressed / several GB decompressed, so at 100 TB
that bound is the difference between comfortable 4 GB executors and
OOM-tuning. This DataSource keeps the same parallel unit (one input
partition per file — WARC stays non-splittable) but STREAMS each file:
records are framed incrementally off a buffered (optionally
gzip-member) byte stream, so peak memory is ONE RECORD + a 64 KiB read
chunk, whatever the file size. Same schema, same strict/permissive
contract, same parsed fields — `tests/test_warc_datasource.py` pins
row-for-row equality with `read_warc` on plain and member-gzip
archives, and pins the memory bound on the framing buffer.

All record SEMANTICS stay in `io/warc.py`: the stream layer only does
framing (find the header block, pre-scan Content-Length, buffer exactly
one record), then hands the record's bytes to the canonical
`iter_warc_records` — so header folding, strictness errors, HTTP
transfer/content decoding, and every future fix there apply here
automatically and cannot diverge.

Filesystem routing: listing and opening go through ``pyarrow.fs``
(r11 ADVICE — the first draft was os.listdir/open, local-only, while
the module is positioned as the Common Crawl scale path and crawl
shards at that scale live on object stores). A plain path stays on
the local FS; a URI (``s3://…``, ``hdfs://…``, ``file://…``) resolves
via ``pyarrow.fs.FileSystem.from_uri`` on the DRIVER (partition
planning) and again on each EXECUTOR (record streaming) — partitions
carry the full URI, so every task opens its shard directly against
the object store with a sequential ``open_input_stream`` (no seek
required: the gzip magic sniff replays its two bytes through
``_HeadStream``).

Path canonicalization (r12): the emitted ``path`` column uses
Hadoop/binaryFile's local rendering (``file:/abs/path``) so document
identity — ``doc_id = xxhash64(path#record_seq)`` in the curation
funnel — is IDENTICAL whichever scan route read the shard; before
this, the routes' min-doc_id tie-breaks diverged and a 1M-page funnel
shipped measurably different corpora per route. r13 extends the rule
to remote URIs: S3 schemes normalize to Hadoop's ``s3a://`` spelling
(pyarrow's ``s3://`` and legacy ``s3n://`` rewrite; see
``canonical_scan_path`` — resolution translates back to pyarrow's
spelling when opening). The LOCAL rendering is DECODED (spaces and
``%`` literal), matching binaryFile's ``Path.toString`` — pinned by
test against a real binaryFile read over a space-and-percent shard
directory. REMOTE identity renders from the caller's ORIGINAL
spelling (scheme rewrite only) plus the store's raw listed key
suffix — never from pyarrow's percent-DECODED parse (r14, r13 ADVICE
2) — so the rendering is route-independent for any spelling both
routes resolve to the same objects; a percent-ENCODED remote root is
resolved through pyarrow's decoded interpretation, which Hadoop (``%XX``
literal in keys) would address differently — prefer un-encoded remote
spellings, whose identity holds by construction.

Usage::

    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("warc")
          .option("path", "/crawl/shards")        # dir/file or URI
          .option("parse_http", "true")           # default true
          .option("permissive", "true")           # default false
          .load())
"""

from __future__ import annotations

import gzip
import os
import re
import zlib
from collections.abc import Iterator
from typing import BinaryIO

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .warc import (
    WARC_HTTP_SCHEMA,
    WARC_SCHEMA,
    WarcFormatError,
    _error_row,
    _parse_warc_date,
    iter_warc_records,
    split_http_response,
)

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"
_CHUNK = 1 << 16
#: Content-Length pre-scan over the raw header block (framing only —
#: the canonical parser re-validates it on the assembled record)
_CLEN_RE = re.compile(rb"\r\ncontent-length:[ \t]*(\d+)", re.IGNORECASE)


def iter_warc_records_stream(
    fp: BinaryIO, *, source: str = "<stream>", chunk: int = _CHUNK
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk an open (already-decompressed) WARC byte stream one record
    at a time. Buffers at most one record + ``chunk`` bytes. Each framed
    record is parsed by the canonical `iter_warc_records`, so errors and
    header semantics are identical to the whole-file path."""
    buf = bytearray()
    eof = False
    offset = 0  # absolute offset of buf[0] in the stream, for context

    def _fill(target: int | None) -> None:
        """Grow buf to ``target`` bytes (or by one chunk if None)."""
        nonlocal eof
        while not eof and (target is None or len(buf) < target):
            piece = fp.read(chunk)
            if not piece:
                eof = True
                return
            buf.extend(piece)
            if target is None:
                return

    _fill(4)
    while True:
        # skip inter-record CRLFs
        while True:
            while len(buf) >= 2 and buf[:2] == b"\r\n":
                del buf[:2]
                offset += 2
            if len(buf) >= 2 or eof:
                break
            _fill(2)
        if eof and not buf:
            return
        # frame the header block
        hdr_end = buf.find(_CRLF2)
        while hdr_end < 0 and not eof:
            _fill(None)
            hdr_end = buf.find(_CRLF2)
        if hdr_end < 0:
            # unterminated header: let the canonical parser raise its
            # canonical error on what we have
            yield from iter_warc_records(
                bytes(buf), source=f"{source}[offset {offset}]"
            )
            return
        m = _CLEN_RE.search(buf, 0, hdr_end)
        if m is None:
            # missing Content-Length: canonical error path
            yield from iter_warc_records(
                bytes(buf[: hdr_end + len(_CRLF2)]),
                source=f"{source}[offset {offset}]",
            )
            return
        need = hdr_end + len(_CRLF2) + int(m.group(1))
        _fill(need)
        record = bytes(buf[:need])  # short at EOF → canonical overrun error
        del buf[:need]
        yield from iter_warc_records(
            record, source=f"{source}[offset {offset}]"
        )
        offset += need


#: Hadoop's S3 connector spells the scheme ``s3a://`` (S3AFileSystem is
#: the only maintained one), pyarrow spells the same store ``s3://``,
#: and the legacy Hadoop spelling was ``s3n://``. The emitted ``path``
#: column feeds document identity (doc_id = xxhash64(path#record_seq)),
#: so a scheme that renders differently per scan route flips every
#: min-doc_id tie-break — the exact mechanism of the r12 local-path bug
#: at the actual 100 TB deployment target (r12 VERDICT item 3). All S3
#: spellings normalize to Hadoop's ``s3a://``.
_SCHEME_CANON = {"s3": "s3a", "s3n": "s3a"}

#: Version tag of the doc-identity path-rendering rule — the thing
#: ``doc_id = xxhash64(path#record_seq)`` is a function of. Stamped
#: into every artifact whose stored keys embed doc identity (the
#: substring-dedup fingerprint store, llm/substring_dedup.py) so the
#: NEXT rendering change is detected at load time instead of by
#: operator memory (r13 VERDICT item 2 — two changes had already
#: shipped before the stamp existed, and this round makes a third).
#:
#: History:
#:   csp-1 (r12) — local paths canonicalized to Hadoop's decoded
#:          ``file:/abs/path`` rendering (both scan routes agree);
#:   csp-2 (r13) — remote scheme spellings normalized (s3/s3n→s3a),
#:          remote path portion still pyarrow's percent-DECODED parse;
#:   csp-3 (r14) — remote identity renders from the caller's ORIGINAL
#:          spelling + raw listed key suffix (never the decoded parse),
#:          and a non-empty ``file://`` authority raises instead of
#:          folding into the local identity space.
IDENTITY_RENDERING = "csp-3"


def canonical_scan_path(path: str) -> str:
    """The canonical ``path``-column rendering for one shard — the rule
    that makes document identity scan-route-independent:

    - local paths (plain, ``file:/x``, or ``file:///x``) render as
      Hadoop/binaryFile's local form ``file:/abs/path``, DECODED —
      spaces and ``%`` stay literal, because binaryFile emits
      ``Path.toString`` (decoded), not the percent-encoded URI form
      (pinned against a real binaryFile read over a
      space-and-percent shard directory in
      tests/test_warc_datasource.py);
    - S3 URIs render with Hadoop's scheme spelling: ``s3://`` and
      ``s3n://`` rewrite to ``s3a://`` (path part untouched);
    - every other scheme passes through as given.

    Supported path charset: anything the local filesystem accepts —
    the decoded rendering cannot collide because it is the identity on
    the byte content; only scheme spelling is rewritten.

    REMOTE paths are canonicalized on the CALLER's spelling (scheme
    rewrite only, path bytes untouched): percent-encoded characters
    stay encoded, because this function never percent-decodes — the
    identity rule is "same spelling in → same rendering out", not a
    decoded re-rendering that could diverge from Hadoop's
    ``Path.toString`` (which keeps ``%XX`` literal) per scan route
    (r13 ADVICE 2).

    A ``file://`` URI with a non-empty authority raises: folding the
    host into the path (``file://host/p`` → ``file:/host/p``) would
    collide with the identity of the genuinely-local ``/host/p``, and
    no scan route can resolve a remote ``file`` host anyway (pyarrow
    rejects non-empty file hosts — r13 VERDICT item 4)."""
    if path.startswith("file:") and "://" not in path:
        return "file:" + os.path.abspath(path[len("file:"):])
    if "://" in path:
        scheme, rest = path.split("://", 1)
        if scheme == "file":
            if rest and not rest.startswith("/"):
                raise ValueError(
                    "file:// URI with a non-empty authority is not "
                    f"supported (would collide with the local path "
                    f"identity of /{rest}): {path!r}"
                )
            return "file:" + os.path.abspath("/" + rest.lstrip("/"))
        return _SCHEME_CANON.get(scheme, scheme) + "://" + rest
    return "file:" + os.path.abspath(path)


def _fs_and_path(path: str):
    """Resolve a path-or-URI to ``(pyarrow FileSystem, fs-local path)``.
    Plain paths stay on the local FS; anything with a scheme routes
    through ``FileSystem.from_uri`` — so ``option("path")`` accepts the
    object-store URIs 100 TB crawl shards actually live on. The
    single-slash ``file:/x`` form (Hadoop's local rendering — what the
    canonical partition paths carry, see ``partitions``) is local."""
    from pyarrow import fs as pafs

    if path.startswith("file:") and "://" not in path:
        return pafs.LocalFileSystem(), path[len("file:"):]
    if "://" in path:
        return pafs.FileSystem.from_uri(_resolution_uri(path))
    return pafs.LocalFileSystem(), path


def _resolution_uri(path: str) -> str:
    """Canonical partition paths carry Hadoop's ``s3a://`` spelling
    (see ``canonical_scan_path``); pyarrow only resolves ``s3://`` —
    translate for RESOLUTION only, identity keeps the canonical form."""
    scheme, _, rest = path.partition("://")
    if scheme in ("s3a", "s3n"):
        return "s3://" + rest
    return path


class _HeadStream:
    """Replays sniffed magic bytes ahead of the remaining stream:
    ``open_input_stream`` is sequential-only on object stores (no
    seek-back), and both gzip and the framing loop only ever call
    ``read``."""

    def __init__(self, head: bytes, fp):
        self._head, self._fp = head, fp

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0:
                out, self._head = self._head + self._fp.read(), b""
                return out
            out, self._head = self._head[:n], self._head[n:]
            if len(out) < n:
                out += self._fp.read(n - len(out))
            return out
        return self._fp.read(n)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("option 'path' is required")
        self.parse_http = options.get("parse_http", "true").lower() == "true"
        self.permissive = options.get("permissive", "false").lower() == "true"

    def partitions(self) -> list[_WarcFilePartition]:
        # one partition per file — WARC's unit of parallelism (the file
        # is non-splittable; Common Crawl shards at ~1 GB per file).
        # Partition paths are CANONICAL, matching Hadoop/binaryFile's
        # rendering for local files ("file:/abs/path", single slash):
        # the emitted `path` column feeds document identity downstream
        # (doc_id = xxhash64(path#record_seq), llm/curate.py), and a
        # route-dependent rendering silently flips every min-doc_id
        # tie-break — at 1M pages the two routes' curated corpora
        # diverged by live rows, not just dedup-twin picks (r12 fix).
        # Non-file schemes render via canonical_scan_path's scheme rule:
        # s3://(pyarrow)/s3n://(legacy) normalize to Hadoop's s3a:// so
        # a remote corpus hashes identical doc_ids whichever route scans
        # it (r12 VERDICT item 3 — the remote twin of the local bug).
        # The remote root renders from the CALLER's ORIGINAL spelling
        # (scheme rewrite only) + the raw listed key suffix — never from
        # pyarrow's percent-DECODED parse of the URI, which would
        # diverge from Hadoop Path.toString (keeps %XX literal) on any
        # percent-encoded spelling (r13 ADVICE 2). Listed key suffixes
        # are the stores' raw bytes (listings are not URI-parsed), so
        # only the root portion ever had an encoding to preserve.
        from pyarrow import fs as pafs

        fs, root = _fs_and_path(self.root)
        local = isinstance(fs, pafs.LocalFileSystem)
        if local:
            root = os.path.abspath(root)
            canon_root = "file:" + root
        else:
            canon_root = canonical_scan_path(self.root).rstrip("/")
        info = fs.get_file_info(root)
        if info.type == pafs.FileType.File:
            return [_WarcFilePartition(canon_root)]
        if info.type != pafs.FileType.Directory:
            raise FileNotFoundError(
                f"warc source path does not exist: {self.root}"
            )
        sel = pafs.FileSelector(root, recursive=False)
        if local:
            # pinned byte-for-byte against a real binaryFile read over a
            # space-and-percent directory: local identity is the DECODED
            # listing path, Hadoop's local Path.toString form
            render = lambda p: "file:" + p  # noqa: E731
        else:
            prefix = len(root.rstrip("/"))
            render = lambda p: canon_root + p[prefix:]  # noqa: E731
        return [
            _WarcFilePartition(render(i.path))
            for i in sorted(fs.get_file_info(sel), key=lambda i: i.path)
            if i.type == pafs.FileType.File
            and ".warc" in os.path.basename(i.path)
        ]

    def _rows(self, path: str) -> Iterator[dict]:
        fs, fs_path = _fs_and_path(path)
        with fs.open_input_stream(fs_path) as raw:
            head = raw.read(2)
            fp: BinaryIO = (
                gzip.GzipFile(fileobj=_HeadStream(head, raw))
                if head == _GZIP_MAGIC
                else _HeadStream(head, raw)
            )
            it = iter_warc_records_stream(fp, source=path)
            seq = 0
            while True:
                try:
                    headers, payload = next(it)
                except StopIteration:
                    return
                except (WarcFormatError, OSError, EOFError, zlib.error) as e:
                    # same contract as io/warc._file_records: strict
                    # raises (corpus loss must be loud), permissive
                    # emits one _error pseudo-record for the remainder
                    if not self.permissive:
                        if isinstance(e, WarcFormatError):
                            raise
                        raise WarcFormatError(
                            f"{path}: gzip decompress failed: {e}"
                        ) from e
                    yield _error_row(path, seq, str(e), self.parse_http)
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
                if self.parse_http:
                    if headers.get("warc-type") == "response":
                        status, ctype, body = split_http_response(payload)
                    else:
                        status, ctype, body = None, None, None
                    row.update(
                        http_status=status, http_content_type=ctype, body=body
                    )
                seq += 1
                yield row

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        cols = [
            f.split(" ")[0]
            for f in (
                WARC_HTTP_SCHEMA if self.parse_http else WARC_SCHEMA
            ).split(", ")
        ]
        for row in self._rows(partition.path):
            yield tuple(row[c] for c in cols)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        parse_http = self.options.get("parse_http", "true").lower() == "true"
        return WARC_HTTP_SCHEMA if parse_http else WARC_SCHEMA

    def reader(self, schema) -> WarcSourceReader:
        return WarcSourceReader(self.options)


# ---------------------------------------------------------------------------
# Registry certificate: synthesize a deterministic WARC corpus from the
# documents table (one response record per doc; files 0-3 in Common
# Crawl's member-per-record gzip layout, files 4-7 plain), read it back
# through spark.read.format("warc"), and emit the decoded fields. The
# oracle is the identity on the documents table — the same contract as
# `warc_roundtrip_parse`, but exercising the DataSource path end to end
# (partition planning, per-file streaming frame, option plumbing).
# The synthesis collects (doc_id, text) to the driver to write real
# files — bounded and certificate-only, the curation_funnel_counts
# precedent; production reads existing crawl shards and never collects.
# ---------------------------------------------------------------------------


def _record_bytes(doc_id: int, text: str) -> bytes:
    body = text.encode("utf-8")
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n\r\n" + body
    )
    return (
        b"\r\n".join(
            [
                b"WARC/1.0",
                b"WARC-Type: response",
                f"WARC-Record-ID: <urn:uuid:{doc_id}>".encode(),
                b"WARC-Date: 2024-01-02T03:04:05Z",
                f"WARC-Target-URI: http://t/{doc_id}".encode(),
                b"Content-Type: application/http; msgtype=response",
                f"Content-Length: {len(payload)}".encode(),
            ]
        )
        + _CRLF2 + payload + b"\r\n\r\n"
    )


def write_fixture_warcs(rows, out_dir: str, n_files: int = 8) -> None:
    """Deterministic WARC fixture: doc → file ``doc_id % n_files``;
    files below n_files/2 use the member-per-record gzip layout, the
    rest are plain concatenations."""
    buckets: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in rows:
        buckets.setdefault(int(doc_id) % n_files, []).append(
            (int(doc_id), text)
        )
    for k, docs in buckets.items():
        docs.sort()
        if k < n_files // 2:
            blob = b"".join(
                gzip.compress(_record_bytes(d, t), mtime=0) for d, t in docs
            )
            name = f"part-{k}.warc.gz"
        else:
            blob = b"".join(_record_bytes(d, t) for d, t in docs)
            name = f"part-{k}.warc"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)


def warc_source_scan(spark, sf_dir: str):
    """Registry entry: documents → WARC files → format("warc") → decoded
    fields (identity oracle). The fixture directory is DETERMINISTIC
    per sf_dir and rewritten in place on every invocation (r11 ADVICE:
    mkdtemp leaked a full corpus copy per certificate run) — fine for
    the single-process certificate; production reads existing shards
    and never synthesizes."""
    import hashlib
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .sources import load_table

    rows = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    ]
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tmp = os.path.join(tempfile.gettempdir(), f"warc_ds_fixture_{tag}")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    write_fixture_warcs(rows, tmp)
    spark.dataSource.register(WarcDataSource)
    df = (
        spark.read.format("warc")
        .option("path", tmp)
        .option("parse_http", "true")
        .load()
    )
    return df.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "warc_type",
        "http_status",
        F.col("http_content_type").alias("content_type"),
        F.decode("body", "UTF-8").alias("body_text"),
    )


WARC_SOURCE_SCAN_SQL = """
SELECT doc_id, 'response' AS warc_type, 200 AS http_status,
       'text/plain; charset=utf-8' AS content_type, text AS body_text
FROM documents
"""

QUERIES = {"warc_source_scan": warc_source_scan}
ORACLES = {"warc_source_scan": WARC_SOURCE_SCAN_SQL}
