"""Streaming SOURCE over the transaction-log table format (``io/txn.py``)
— the read-side twin of the exactly-once streaming sinks: a Structured
Streaming query can now tail a txn table the way Delta readers tail a
Delta table.

Offsets are COMMIT VERSIONS — the natural streaming clock of a
manifest-log table. Each micro-batch is the file-set diff between two
committed versions, planned as ONE input partition per added file, read
EXECUTOR-SIDE with pyarrow (the driver only ever touches the manifest
JSON — no data rows flow through it, unlike SimpleDataSourceStreamReader
whose prefetch materializes on the driver). Version diffing also makes
crash recovery exact: the WAL stores version pairs, and replaying a
committed range re-lists the same immutable files.

Append-only discipline (Delta's default): if any file was REMOVED between
the offsets, the table changed by rewrite (merge/compact/overwrite) and
tailing it as an append stream would double-read rewritten rows — the
reader refuses loudly and points at the batch change-feed API
(``txn.read_changes``) instead of silently corrupting the stream.

Partitioned tables are refused for now: their files drop the partition
column from the data pages (hive dir encoding), and re-injecting a typed
constant per file is not yet wired through the arrow batches.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import txn


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TxnTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.table = options.get("path")
        if not self.table:
            raise ValueError("option 'path' is required")
        snap = txn.snapshot(self.table)
        if snap.schema_json is None:
            raise FileNotFoundError(f"no committed version at {self.table}")
        if snap.partition_by is not None:
            raise ValueError(
                "streaming reads of partitioned txn tables are not "
                "supported yet — stream an unpartitioned table or use "
                "txn.read_changes for batch CDF"
            )
        self._schema = StructType.fromJson(json.loads(snap.schema_json))

    # -- offset protocol -------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": txn.snapshot(self.table).version}

    def partitions(self, start: dict, end: dict) -> list[_FilePartition]:
        if end["version"] <= start["version"]:
            return []
        snap_a = (
            txn.Snapshot(version=0, schema_json=None)
            if start["version"] == 0
            else txn.snapshot(self.table, start["version"])
        )
        snap_b = txn.snapshot(self.table, end["version"])
        paths_a = {f["path"] for f in snap_a.files}
        paths_b = {f["path"] for f in snap_b.files}
        removed = paths_a - paths_b
        if removed:
            raise ValueError(
                f"txn table {self.table} changed by rewrite between "
                f"versions {start['version']} and {end['version']} "
                f"({len(removed)} file(s) removed) — an append stream "
                "would double-read rewritten rows; use txn.read_changes"
            )
        return [
            _FilePartition(os.path.join(self.table, p))
            for p in sorted(paths_b - paths_a)
        ]

    def commit(self, end: dict) -> None:
        pass  # the manifest log IS the source of truth; nothing to ack

    # -- executor-side read ---------------------------------------------
    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        # arrow batches stream straight into Spark's arrow pipe — no
        # per-row Python; column order must match the declared schema
        table = pq.read_table(
            partition.path, columns=[f.name for f in self._schema.fields]
        )
        yield from table.to_batches()


class TxnTableStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txn_table"

    def schema(self) -> StructType:
        snap = txn.snapshot(self.options["path"])
        return StructType.fromJson(json.loads(snap.schema_json))

    def streamReader(self, schema) -> TxnTableStreamReader:
        return TxnTableStreamReader(self.options)
