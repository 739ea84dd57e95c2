"""WARC Python DataSource invariants (io/warc_datasource.py).

The defining claims: row-for-row equality with the binaryFile path
(`io/warc.read_warc`) on both archive layouts, one partition per file,
the strict/permissive contract, and the STREAMING property — the frame
buffer holds one record, not the file.
"""

from __future__ import annotations

import io
import os

import pytest

from ir_analyses_spark.io.warc import read_warc
from ir_analyses_spark.io.warc_datasource import (
    WarcDataSource,
    _record_bytes,
    iter_warc_records_stream,
    write_fixture_warcs,
)

_DOCS = [(i, f"doc number {i} body text with words " * (1 + i % 4)) for i in range(24)]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc_ds")
    write_fixture_warcs(_DOCS, str(d))
    return str(d)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(WarcDataSource)
    return spark


def _read_ds(spark, path, **opts):
    r = spark.read.format("warc").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rows_equal_binaryfile_path(registered, warc_dir):
    """The DataSource must produce exactly what read_warc produces on
    the same files (both layouts present in the fixture), parse_http
    both ways — INCLUDING the path column: doc_id downstream is
    xxhash64(path#record_seq), so a route-dependent path rendering
    silently changes document identity (the r12 fix — the first
    version of this test dropped path and the 1M-page funnel shipped
    different corpora per scan route)."""
    for parse_http in (True, False):
        ds = _read_ds(
            registered, warc_dir, parse_http=str(parse_http).lower()
        )
        bf = read_warc(registered, warc_dir, parse_http=parse_http)
        a = sorted(ds.collect(), key=lambda r: r["record_id"])
        b = sorted(bf.collect(), key=lambda r: r["record_id"])
        assert a == b and len(a) == len(_DOCS)
        assert all(r["path"].startswith("file:/") for r in a)


def test_one_partition_per_file(registered, warc_dir):
    n_files = len(os.listdir(warc_dir))
    df = _read_ds(registered, warc_dir)
    assert df.rdd.getNumPartitions() == n_files == 8


def test_single_file_path(registered, warc_dir):
    f = os.path.join(warc_dir, sorted(os.listdir(warc_dir))[0])
    df = _read_ds(registered, f)
    assert df.rdd.getNumPartitions() == 1
    assert df.count() > 0


def test_strict_raises_permissive_error_row(registered, tmp_path):
    bad = tmp_path / "bad.warc"
    bad.write_bytes(_record_bytes(1, "ok") + b"GARBAGE NOT A RECORD")
    with pytest.raises(Exception) as ei:
        _read_ds(registered, str(bad)).collect()
    assert "WARC" in str(ei.value)
    rows = _read_ds(registered, str(bad), permissive="true").collect()
    types = [r["warc_type"] for r in rows]
    assert types == ["response", "_error"]  # parsed prefix kept


def test_truncated_payload_is_canonical_overrun_error(registered, tmp_path):
    rec = _record_bytes(2, "some body")
    cut = tmp_path / "cut.warc"
    cut.write_bytes(rec[: len(rec) - 12])  # payload runs past EOF
    rows = _read_ds(registered, str(cut), permissive="true").collect()
    assert [r["warc_type"] for r in rows] == ["_error"]
    assert b"runs past end" in rows[0]["payload"]


class _CountingStream(io.RawIOBase):
    """File object that serves a big archive in small pieces and counts
    how many bytes the consumer has pulled."""

    def __init__(self, blob: bytes, piece: int):
        self.blob = blob
        self.piece = piece
        self.pos = 0
        self.max_pulled = 0

    def read(self, n: int = -1) -> bytes:
        n = min(self.piece, n if n >= 0 else self.piece)
        out = self.blob[self.pos : self.pos + n]
        self.pos += len(out)
        self.max_pulled = self.pos
        return out


def test_streaming_is_lazy_and_bounded():
    """Pulling the FIRST record of a 1000-record archive must consume
    only ~that record's bytes from the underlying stream — the memory
    property that distinguishes this source from binaryFile."""
    records = [_record_bytes(i, f"body {i} " * 20) for i in range(1000)]
    blob = b"".join(records)
    fp = _CountingStream(blob, piece=4096)
    it = iter_warc_records_stream(fp, chunk=4096)
    headers, payload = next(it)
    assert headers["warc-target-uri"].endswith("/0")
    # one record (~900 B) + at most a few 4 KiB chunks, never the file
    assert fp.max_pulled <= len(records[0]) + 3 * 4096
    assert fp.max_pulled < len(blob) // 50
    # and the remainder still parses to completion
    rest = list(it)
    assert len(rest) == 999


def test_stream_matches_whole_bytes_parse():
    """Framing + canonical-parser delegation must reproduce exactly what
    iter_warc_records yields on the whole byte string."""
    from ir_analyses_spark.io.warc import iter_warc_records

    blob = b"".join(_record_bytes(i, f"text {i}") for i in range(50))
    whole = list(iter_warc_records(blob))
    streamed = list(iter_warc_records_stream(io.BytesIO(blob), chunk=37))
    assert streamed == whole


def test_file_uri_path_routes_through_pyarrow_fs(registered, warc_dir):
    """option('path') accepts filesystem URIs (r11 ADVICE: crawl shards
    at corpus scale live on object stores): a file:// URI must list and
    stream the exact same rows as the plain path."""
    spark = registered
    plain = (
        spark.read.format("warc").option("path", warc_dir).load()
        .select("path", "record_seq", "record_id")
        .collect()
    )
    via_uri = (
        spark.read.format("warc")
        .option("path", "file://" + warc_dir)
        .load()
        .select("path", "record_seq", "record_id")
        .collect()
    )
    # both spellings canonicalize to the same file:/ partition paths,
    # so the rows — path INCLUDED (doc_id feeds off it) — are identical
    key = lambda r: (r["path"], r["record_seq"])
    assert sorted((key(r), r["record_id"]) for r in via_uri) == sorted(
        (key(r), r["record_id"]) for r in plain
    )


def test_missing_path_fails_loudly(registered):
    """A nonexistent path must raise, not plan zero partitions."""
    spark = registered
    with pytest.raises(Exception, match="does not exist"):
        spark.read.format("warc").option(
            "path", "/nonexistent/warc/dir"
        ).load().collect()


def test_headstream_replays_sniffed_bytes():
    """The gzip magic sniff must not lose the two sniffed bytes on a
    sequential (no-seek) stream."""
    from ir_analyses_spark.io.warc_datasource import _HeadStream

    raw = io.BytesIO(b"abcdefgh")
    head = raw.read(2)
    hs = _HeadStream(head, raw)
    assert hs.read(1) == b"a"
    assert hs.read(3) == b"bcd"
    assert hs.read() == b"efgh"
    assert hs.read(5) == b""


def test_fixture_dir_deterministic_not_leaked(spark, sf_dir):
    """warc_source_scan rewrites ONE deterministic fixture dir per
    sf_dir instead of leaking a corpus copy per invocation (r11
    ADVICE)."""
    import glob
    import tempfile

    from ir_analyses_spark.io.warc_datasource import warc_source_scan

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "warc_ds_fixture_*")))
    n1 = warc_source_scan(spark, sf_dir).count()
    mid = set(glob.glob(os.path.join(tempfile.gettempdir(), "warc_ds_fixture_*")))
    n2 = warc_source_scan(spark, sf_dir).count()
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "warc_ds_fixture_*")))
    assert n1 == n2 > 0
    assert mid == after          # second run reused, not leaked
    assert len(mid - before) <= 1  # at most the one deterministic dir


def test_path_parity_space_and_percent_dir(registered, tmp_path):
    """r12 ADVICE: the canonical local rendering must match binaryFile
    byte-for-byte for paths Hadoop COULD render differently — a shard
    directory with spaces and a literal '%'. binaryFile emits the
    DECODED Path.toString form (verified here against a real binaryFile
    read, not an assumption), so 'file:' + abspath is exactly right and
    doc_id identity holds on these paths too."""
    d = tmp_path / "sh ard %1 dir"
    d.mkdir()
    write_fixture_warcs(_DOCS[:6], str(d))
    ds = sorted(
        r["path"] for r in _read_ds(registered, str(d)).select("path").collect()
    )
    bf = sorted(
        r["path"]
        for r in read_warc(registered, str(d)).select("path").collect()
    )
    assert ds == bf
    assert all(" " in p and "%" in p and p.startswith("file:/") for p in ds)


def test_canonical_scan_path_scheme_rule():
    """Remote-URI identity (r12 VERDICT item 3): every S3 spelling
    renders as Hadoop's s3a://, other schemes and the path part pass
    through untouched, local forms collapse to file:/abs."""
    from ir_analyses_spark.io.warc_datasource import canonical_scan_path

    assert canonical_scan_path("s3://bucket/k ey.warc.gz") == (
        "s3a://bucket/k ey.warc.gz"
    )
    assert canonical_scan_path("s3n://b/k") == "s3a://b/k"
    assert canonical_scan_path("s3a://b/k") == "s3a://b/k"
    assert canonical_scan_path("hdfs://nn:8020/x") == "hdfs://nn:8020/x"
    assert canonical_scan_path("gs://b/k") == "gs://b/k"
    assert canonical_scan_path("/a b/c%1.warc") == "file:/a b/c%1.warc"
    assert canonical_scan_path("file:/a b/c") == "file:/a b/c"
    assert canonical_scan_path("file:///a/c") == "file:/a/c"


def test_s3a_partition_path_resolves_via_pyarrow_spelling():
    """The canonical s3a:// partition path must translate back to the
    spelling pyarrow can resolve when a task opens its shard —
    otherwise normalization would break the very route it canonicalizes.
    No network: pin the resolution URI (what _fs_and_path hands to
    FileSystem.from_uri)."""
    from ir_analyses_spark.io.warc_datasource import _resolution_uri

    assert _resolution_uri("s3a://bucket/sh ard.warc.gz") == (
        "s3://bucket/sh ard.warc.gz"
    )
    assert _resolution_uri("s3n://b/k") == "s3://b/k"
    assert _resolution_uri("s3://b/k") == "s3://b/k"
    assert _resolution_uri("hdfs://nn:8020/x") == "hdfs://nn:8020/x"
    # round trip: canonical → resolution → canonical is a fixpoint
    from ir_analyses_spark.io.warc_datasource import canonical_scan_path

    for uri in ("s3://b/k", "s3n://b/k", "s3a://b/k"):
        c = canonical_scan_path(uri)
        assert canonical_scan_path(_resolution_uri(c)) == c == "s3a://b/k"


def test_canonical_scan_path_idempotent():
    """Canonicalization must be a projection: canonical(canonical(x)) ==
    canonical(x), and the resolution spelling must round-trip back to
    the same canonical form — otherwise identity could drift across
    re-scans of already-canonical partition paths."""
    from hypothesis import given, settings, strategies as st

    from ir_analyses_spark.io.warc_datasource import (
        _resolution_uri,
        canonical_scan_path,
    )

    schemes = st.sampled_from(
        ["", "file://", "s3://", "s3a://", "s3n://", "hdfs://nn:8020", "gs://"]
    )
    # path chars incl. the route-divergence suspects: space, %, unicode
    path_part = st.text(
        alphabet="abz09 %._-/\u65e5", min_size=1, max_size=30
    ).map(lambda s: "/" + s.lstrip("/"))

    @settings(max_examples=300, deadline=None)
    @given(schemes, path_part)
    def prop(scheme, p):
        x = scheme + p
        c = canonical_scan_path(x)
        assert canonical_scan_path(c) == c, (x, c)
        assert canonical_scan_path(_resolution_uri(c)) == c, (x, c)

    prop()


def test_canonical_scan_path_rejects_file_authority():
    """r13 VERDICT item 4: file://host/p must RAISE, not silently fold
    the host into the path — 'file:/host/p' is the identity of the
    genuinely-local /host/p, so the fold is a doc_id collision for any
    metadata path that never resolves (resolution itself always failed
    loudly; this makes the identity layer agree)."""
    from ir_analyses_spark.io.warc_datasource import canonical_scan_path

    for bad in ("file://host/p", "file://h", "file://host/a b/c%1.warc"):
        with pytest.raises(ValueError, match="non-empty authority"):
            canonical_scan_path(bad)
    # the empty-authority spellings stay supported and unchanged
    assert canonical_scan_path("file:///a/c") == "file:/a/c"
    assert canonical_scan_path("file:/a/c") == "file:/a/c"


def test_canonical_scan_path_file_authority_property():
    """Property battery extension (r13 VERDICT item 4): EVERY non-empty
    file authority raises; every empty-authority file URI canonicalizes
    to the single-slash local form."""
    from hypothesis import given, settings, strategies as st

    from ir_analyses_spark.io.warc_datasource import canonical_scan_path

    host = st.text(alphabet="abz09.-", min_size=1, max_size=12)
    tail = st.text(alphabet="abz09 %._-/", min_size=0, max_size=20)

    @settings(max_examples=200, deadline=None)
    @given(host, tail)
    def prop(h, t):
        with pytest.raises(ValueError):
            canonical_scan_path(f"file://{h}/{t}")
        c = canonical_scan_path(f"file:///{t.lstrip('/')}")
        assert c.startswith("file:/") and not c.startswith("file://")
        assert canonical_scan_path(c) == c

    prop()


def test_remote_partition_paths_render_from_caller_spelling(monkeypatch):
    """r13 ADVICE 2: remote identity must come from the caller's
    ORIGINAL spelling (scheme rewrite only) + the store's raw listed
    key suffix — NOT from pyarrow's percent-DECODED parse, which
    Hadoop's Path.toString (keeps %XX literal) would never render.
    Simulated remote store: pyarrow's _MockFileSystem (non-local), with
    _fs_and_path patched to hand back the decoded root the way
    FileSystem.from_uri does for an encoded URI."""
    from pyarrow.fs import _MockFileSystem

    from ir_analyses_spark.io import warc_datasource as wd

    mock = _MockFileSystem()
    mock.create_dir("bucket/dir x")
    for key in ("bucket/dir x/b sh%1.warc.gz", "bucket/dir x/a.warc"):
        with mock.open_output_stream(key) as f:
            f.write(b"stub")

    def fake_fs_and_path(path):
        # what FileSystem.from_uri does to s3://bucket/dir%20x:
        # percent-decode the path portion
        assert path == "s3://bucket/dir%20x"
        return mock, "bucket/dir x"

    monkeypatch.setattr(wd, "_fs_and_path", fake_fs_and_path)
    reader = wd.WarcSourceReader({"path": "s3://bucket/dir%20x"})
    got = sorted(p.path for p in reader.partitions())
    # root keeps the caller's %20 (scheme normalized s3->s3a); the
    # listed key suffixes keep their RAW bytes (space, literal %)
    assert got == [
        "s3a://bucket/dir%20x/a.warc",
        "s3a://bucket/dir%20x/b sh%1.warc.gz",
    ]


def test_remote_single_file_partition_renders_caller_spelling(monkeypatch):
    from pyarrow.fs import _MockFileSystem

    from ir_analyses_spark.io import warc_datasource as wd

    mock = _MockFileSystem()
    mock.create_dir("b")
    with mock.open_output_stream("b/k y.warc") as f:
        f.write(b"stub")
    monkeypatch.setattr(
        wd, "_fs_and_path", lambda path: (mock, "b/k y.warc")
    )
    reader = wd.WarcSourceReader({"path": "s3n://b/k%20y.warc"})
    assert [p.path for p in reader.partitions()] == ["s3a://b/k%20y.warc"]
