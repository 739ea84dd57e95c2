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
    both ways."""
    for parse_http in (True, False):
        ds = _read_ds(
            registered, warc_dir, parse_http=str(parse_http).lower()
        ).drop("path")
        bf = read_warc(registered, warc_dir, parse_http=parse_http).drop("path")
        key = ["record_id"]
        a = sorted(ds.collect(), key=lambda r: r["record_id"])
        b = sorted(bf.collect(), key=lambda r: r["record_id"])
        assert a == b and len(a) == len(_DOCS)


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
