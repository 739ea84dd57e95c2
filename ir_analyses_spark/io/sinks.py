"""Sinks (SURVEY §2A S6/S7, A5–A7): batch table writes and MERGE emulation
on bare parquet.

The reference upserts row-at-a-time through an ORM session (reference
utils/repositories/base_repository.py:54-58); the engine's write unit is a
whole DataFrame. With Delta/Iceberg available these helpers become
``MERGE INTO`` / ``replaceWhere`` one-liners; on bare parquet the same
semantics are anti-join + union + staged atomic swap. All upserts key on
*natural* keys (SURVEY §7.3.2) so reloads are idempotent.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None):
    """Plain table write. At scale: partition pruning comes from
    ``partition_by`` (e.g. fiscal_year for the fact table)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def merge_upsert(updates: DataFrame, target_dir: str, keys: list[str]) -> None:
    """Keyed upsert into a parquet directory (MERGE emulation, §2A A5/A7).

    current ⟕anti updates-by-key, union updates, stage, swap. The swap is
    the commit point — readers see either the old or the new table, never a
    partial write. On Delta this is exactly ``MERGE INTO t USING u ON keys``.
    """
    spark = updates.sparkSession
    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    staging = target_dir.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.rename(staging, target_dir)


def append_missing(
    new_rows: DataFrame, target_dir: str, key: str | list[str]
) -> None:
    """Existence-check insert (§2A A6): append only rows whose key is not
    yet in the target — the set-oriented version of the reference's per-row
    find-or-create loop (reference utils/service/financial_service.py:209-219)."""
    keys = [key] if isinstance(key, str) else list(key)
    spark = new_rows.sparkSession
    if os.path.exists(target_dir):
        existing = spark.read.parquet(target_dir).select(*keys).distinct()
        to_add = new_rows.join(existing, keys, "left_anti")
        merged = spark.read.parquet(target_dir).unionByName(to_add)
        staging = target_dir.rstrip("/") + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(target_dir)
        os.rename(staging, target_dir)
    else:
        new_rows.write.parquet(target_dir)


def replace_partition(
    updates: DataFrame, target_dir: str, partition_col: str
) -> None:
    """Partition replace (the roadmap's 洗い替え delete-then-insert,
    reference documents/old/IR_Analysis_Roadmap_and_Design.md:61-64):
    overwrite only the partitions present in ``updates`` — Spark's dynamic
    partition overwrite, the idempotent way to reload one report/day."""
    spark = updates.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    updates.write.mode("overwrite").partitionBy(partition_col).parquet(target_dir)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Bucketed managed table (SURVEY §7.3.6: "+ bucketing by report_id at
    100 TB"): co-locates rows by key at WRITE time so every later join or
    aggregation on the bucket key skips its shuffle entirely — the
    pay-once-shuffle-never-again layout for fact⋈fact joins.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def surrogate_key(*cols) -> "pyspark.sql.Column":  # noqa: F821
    """Deterministic 64-bit surrogate key (SURVEY §7.3.1): xxhash64 of the
    natural key — stable across runs/executors, unlike
    monotonically_increasing_id, and needs no sequence/flush dance."""
    return F.xxhash64(*cols)
