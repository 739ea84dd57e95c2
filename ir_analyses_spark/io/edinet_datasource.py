"""Custom Python DataSource for document-list ingest (SURVEY §2A S4 scale
path; §4 "custom work" item 2).

The reference fetches EDINET's ``documents.json`` one date at a time on the
driver and wraps the result in pandas (reference utils/api.py:45-93). The
scale path is a Spark 4 ``DataSource``: each *date* becomes an input
partition, so a year's worth of document lists fetches in parallel from the
executors, and the result is a DataFrame from the first line.

This implementation reads date-partitioned JSON fixture files (one file per
date, the exact shape EDINET returns) instead of the live HTTPS endpoint —
the container has no network, and the DataSource protocol (partition
planning, per-partition iteration, schema declaration) is the part that
matters; swapping the ``open()`` for an HTTP GET is a one-line change in
``read``.

Usage::

    spark.dataSource.register(EdinetFixtureDataSource)
    df = (spark.read.format("edinet_fixture")
          .option("path", "/data/edinet_lists").load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: the documents.json result fields the reference consumes
#: (reference utils/api.py:75-88)
SCHEMA = (
    "docID string, edinetCode string, filerName string, "
    "docDescription string, submitDateTime string, date string"
)
_FIELDS = ["docID", "edinetCode", "filerName", "docDescription", "submitDateTime"]


class _DatePartition(InputPartition):
    def __init__(self, path: str, date: str):
        self.path = path
        self.date = date


class EdinetFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("option 'path' is required")

    def partitions(self) -> list[_DatePartition]:
        # one partition per date file — the unit of parallel fetch
        return [
            _DatePartition(os.path.join(self.root, f), f[: -len(".json")])
            for f in sorted(os.listdir(self.root))
            if f.endswith(".json")
        ]

    def read(self, partition: _DatePartition) -> Iterator[tuple]:
        # live deployment: HTTP GET documents.json?date=... here instead
        with open(partition.path, encoding="utf-8") as f:
            payload = json.load(f)
        for rec in payload.get("results", []):
            yield tuple(rec.get(k) for k in _FIELDS) + (partition.date,)


class EdinetFixtureStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: EDINET publishes one
    ``documents.json`` per date, so the natural streaming offset is "the
    last date ingested" — each micro-batch picks up exactly the date
    files that appeared since. Offsets are the date STRINGS themselves
    (lexicographic == chronological for ISO dates), which makes
    ``readBetweenOffsets`` — the crash-recovery replay path Structured
    Streaming calls when a batch must be re-read from the WAL — a pure
    deterministic re-listing: same offset pair, same rows, so a restarted
    query cannot double-ingest or skip a date. Live deployment swaps the
    directory listing for the dated documents.json GET (io/edinet_http.py)
    — the offset/replay contract is unchanged."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("option 'path' is required")

    def _dates(self) -> list[str]:
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self.root)
            if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"last_date": ""}

    def _rows_for(self, dates: list[str]) -> Iterator[tuple]:
        for date in dates:
            with open(
                os.path.join(self.root, f"{date}.json"), encoding="utf-8"
            ) as f:
                payload = json.load(f)
            for rec in payload.get("results", []):
                yield tuple(rec.get(k) for k in _FIELDS) + (date,)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        new = [d for d in self._dates() if d > start["last_date"]]
        if not new:
            return iter(()), start
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator for replay, and generators can't be
        # copied (a date's document list is bounded — a few thousand rows)
        return list(self._rows_for(new)), {"last_date": new[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of a WAL-committed range after a restart
        replay = [
            d
            for d in self._dates()
            if start["last_date"] < d <= end["last_date"]
        ]
        return list(self._rows_for(replay))


class EdinetFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "edinet_fixture"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> EdinetFixtureReader:
        return EdinetFixtureReader(self.options)

    def simpleStreamReader(self, schema) -> EdinetFixtureStreamReader:
        return EdinetFixtureStreamReader(self.options)
