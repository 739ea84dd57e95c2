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


def _swap_in(staging: str, target_dir: str) -> None:
    """Staged swap: move the old table aside, promote staging, drop the old
    copy. Guarantee: data is NEVER lost — a crash at any step leaves the
    complete old table (at ``target`` or ``__old``) and/or the complete new
    table (at ``__staging`` or ``target``) on disk, and a re-run converges
    (pinned by ``test_swap_in_crash_window_leaves_valid_copy``). There IS a
    brief no-target window between the two renames (plain filesystems lack
    an atomic exchange); readers that must never observe it need a
    transactional table format (Delta/Iceberg), where this helper becomes
    a ``MERGE``/``REPLACE`` one-liner."""
    old = target_dir.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(staging, target_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


def merge_upsert(
    updates: DataFrame,
    target_dir: str,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """Keyed upsert into a parquet directory (MERGE emulation, §2A A5/A7).

    Contract (same as SQL MERGE): at most ONE row per key in ``updates`` —
    collapse a batch to latest-per-key first (A4) if the feed can repeat
    keys; with duplicates, all duplicate rows land in the target.

    Unpartitioned: current ⟕anti updates-by-key, union updates, stage, swap
    (the swap promotes a fully-written directory, see ``_swap_in``). On
    Delta this is exactly ``MERGE INTO t USING u ON keys``.

    With ``partition_col`` (the 100 TB path): the rewrite is scoped to the
    partitions that actually appear in ``updates`` — current is PRUNED to
    those partitions (partition filter, no full-table scan), merged, and
    written back with dynamic partition overwrite. Untouched partitions'
    files are never read or rewritten, so an upsert costs O(touched
    partitions), not O(table). Precondition: ``partition_col`` must be
    functionally dependent on ``keys`` (a key never moves between
    partition values) — an update that moved a key to a new partition
    would leave the old partition's row in place, because pruning never
    reads it. Same rule every partition-scoped MERGE engine imposes.
    """
    spark = updates.sparkSession
    if partition_col is not None and os.path.exists(target_dir):
        touched = [
            r[0]
            for r in updates.select(partition_col).distinct().collect()
        ]
        current = spark.read.parquet(target_dir).filter(
            F.col(partition_col).isin(touched)
        )
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        # Materialize before the overwrite: the merged plan reads the same
        # path it is about to replace, so cut the lineage to the file scan
        # (and dodge Spark's self-overwrite guard) with an eager checkpoint.
        merged = kept.unionByName(updates).localCheckpoint(eager=True)
        # per-WRITE dynamic mode — never session-level conf.set, which would
        # leak into unrelated overwrites and stop them deleting partitions
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(target_dir)
        )
        return
    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    staging = target_dir.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_in(staging, target_dir)


def batch_ledger(target_dir: str, batch_id) -> tuple[bool, "Callable[[], None]"]:
    """Applied-batch ledger for non-idempotent (additive / versioning)
    foreachBatch sinks: returns (already_applied, mark_applied). The sink
    checks the flag, merges, then calls ``mark_applied()``.

    Honest crash-window note: the merge and the marker are two filesystem
    operations, so a crash BETWEEN them re-applies that one batch on
    replay (the classic two-phase gap; keyed MERGE sinks don't care —
    they're idempotent — but additive sinks double-count that batch).
    Closing the gap needs a table format whose commit carries the txn id
    (Delta/Iceberg); on bare parquet this ledger narrows exactly-once to
    effectively-once-with-a-crash-window, and both streaming sinks share
    THIS implementation so the window is in one place. The marker itself
    is written via tmp+rename so a crash mid-write never leaves a
    half-created marker that silently skips an unapplied batch."""
    import os as _os

    ledger = target_dir.rstrip("/") + "__applied"
    marker = _os.path.join(ledger, str(batch_id))

    def mark_applied() -> None:
        _os.makedirs(ledger, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w"):
            pass
        _os.rename(tmp, marker)

    return _os.path.exists(marker), mark_applied


def append_missing(
    new_rows: DataFrame, target_dir: str, key: str | list[str]
) -> None:
    """Existence-check insert (§2A A6): append only rows whose key is not
    yet in the target — the set-oriented version of the reference's per-row
    find-or-create loop (reference utils/service/financial_service.py:209-219).

    Insert-only means no existing row changes, so this appends NEW parquet
    files into the live directory instead of rewriting the table: existing
    files are untouched (O(new rows), not O(table))."""
    keys = [key] if isinstance(key, str) else list(key)
    spark = new_rows.sparkSession
    if os.path.exists(target_dir):
        existing = spark.read.parquet(target_dir).select(*keys).distinct()
        to_add = new_rows.join(existing, keys, "left_anti")
        to_add.write.mode("append").parquet(target_dir)
    else:
        new_rows.write.parquet(target_dir)


def replace_partition(
    updates: DataFrame, target_dir: str, partition_col: str
) -> None:
    """Partition replace (the roadmap's 洗い替え delete-then-insert,
    reference documents/old/IR_Analysis_Roadmap_and_Design.md:61-64):
    overwrite only the partitions present in ``updates`` — Spark's dynamic
    partition overwrite, the idempotent way to reload one report/day.
    Dynamic mode is set per-write (never on the session, where it would
    leak into unrelated overwrites)."""
    (
        updates.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_dir)
    )


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


def scd2_merge(
    updates: DataFrame,
    target_dir: str,
    key: str,
    change_cols: list[str],
    effective_col: str = "effective_from",
) -> None:
    """Slowly-changing-dimension type-2 merge: history-preserving upsert.

    The target keeps one row per (key, version) with ``effective_from`` /
    ``effective_to`` / ``is_current``; an update whose ``change_cols``
    differ from the key's current row CLOSES that row (effective_to :=
    update's effective_from) and appends the new version. Unchanged keys
    and non-current history rows pass through untouched — at scale,
    combine with a partition column the way ``merge_upsert`` does.

    The reference keeps only latest state (ORM upsert); SCD2 is what the
    same write needs once history must be queryable "as of" any date.
    Like SQL MERGE, one update row per key per batch — collapse a batch
    to latest-per-key first (A4) if the feed can repeat keys.
    """
    spark = updates.sparkSession
    upd = updates.select(
        F.col(key),
        *[F.col(c) for c in change_cols],
        F.col(effective_col).alias("_new_from"),
    )
    if not os.path.exists(target_dir):
        first = upd.select(
            key,
            *change_cols,
            F.col("_new_from").alias("effective_from"),
            F.lit(None).cast("date").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
        first.write.parquet(target_dir)
        return
    current = spark.read.parquet(target_dir)
    # null-safe change test: plain struct != returns NULL when a member is
    # NULL, which would silently skip NULL→value (and value→NULL) changes
    changed = ~(
        F.struct(*[f"cur.{c}" for c in change_cols]).eqNullSafe(
            F.struct(*[f"u.{c}" for c in change_cols])
        )
    )
    cur = current.alias("cur")
    u = upd.alias("u")
    joined = cur.join(u, F.col(f"cur.{key}") == F.col(f"u.{key}"), "left")
    # current rows: close if a differing update arrived, else keep as-is
    kept_or_closed = joined.select(
        F.col(f"cur.{key}").alias(key),
        *[F.col(f"cur.{c}").alias(c) for c in change_cols],
        F.col("cur.effective_from").alias("effective_from"),
        F.when(
            F.col("cur.is_current") & F.col("u._new_from").isNotNull() & changed,
            F.col("u._new_from"),
        )
        .otherwise(F.col("cur.effective_to"))
        .alias("effective_to"),
        F.when(
            F.col("cur.is_current") & F.col("u._new_from").isNotNull() & changed,
            F.lit(False),
        )
        .otherwise(F.col("cur.is_current"))
        .alias("is_current"),
    )
    # new versions: updates that differ from the key's current row, plus
    # brand-new keys
    cur_now = current.filter("is_current").alias("cur")
    new_rows = (
        u.join(cur_now, F.col(f"u.{key}") == F.col(f"cur.{key}"), "left")
        .filter(F.col(f"cur.{key}").isNull() | changed)
        .select(
            F.col(f"u.{key}").alias(key),
            *[F.col(f"u.{c}").alias(c) for c in change_cols],
            F.col("u._new_from").alias("effective_from"),
            F.lit(None).cast("date").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
    )
    merged = kept_or_closed.unionByName(new_rows).localCheckpoint(eager=True)
    staging = target_dir.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_in(staging, target_dir)


def scd2_point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    date_col: str,
) -> DataFrame:
    """Point-in-time join against an SCD2 dimension: each fact row picks
    the version whose [effective_from, effective_to) interval contains the
    fact date — the query the versioned history exists for. A half-open
    interval join; the optimizer runs it as an equi-join on the key with
    the interval as residual predicate, so it costs one shuffle per side
    (or none, if both are bucketed by the key)."""
    d = dim.alias("d")
    f = facts.alias("f")
    return f.join(
        d,
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (F.col("d.effective_from") <= F.col(f"f.{date_col}"))
        & (
            F.col("d.effective_to").isNull()
            | (F.col("d.effective_to") > F.col(f"f.{date_col}"))
        ),
        "left",
    ).drop(F.col(f"d.{key}"))


def compact_small_files(
    spark,
    target_dir: str,
    partition_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction (table maintenance, the OPTIMIZE of
    Delta/Iceberg on bare parquet): streaming upserts and per-batch appends
    accrete tiny files until scan planning, footer reads, and task
    scheduling dominate query time — at 100 TB a table with 10⁶ kilobyte
    files is unreadable regardless of its byte size.

    Rewrites the table (or, with ``partition_col``, each partition) into
    ``ceil(bytes / target_file_bytes)`` files via a staged atomic swap.
    Data is unchanged — only the file layout. Returns {files_before,
    files_after}. At scale you run this per-partition on the partitions a
    merge touched (the same pruning discipline as ``merge_upsert``).
    """
    import math

    def _data_files(d: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(d):
            out += [
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        return out

    before = _data_files(target_dir)
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(target_dir)
    staging = target_dir.rstrip("/") + "__staging"
    if partition_col is not None:
        # Repartition by (partition value, row salt): keying by the value
        # alone would bound each directory to ONE task — and therefore one
        # file — so a hot partition could never split to the byte target.
        # The salt spreads each value over ceil(n_files / n_dirs) tasks;
        # the dynamic writer still emits one file per (task, value).
        n_dirs = max(
            1, len({os.path.dirname(f) for f in before})
        )
        spread = max(1, -(-n_files // n_dirs))
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(spread)
        )
        (
            df.repartition(max(n_files, n_dirs), F.col(partition_col), salt)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(staging)
    _swap_in(staging, target_dir)
    return {"files_before": len(before), "files_after": len(_data_files(target_dir))}


def write_sorted_shards(
    df: DataFrame, path: str, sort_col: str, n_shards: int
) -> None:
    """Range-sharded sorted output: ``repartitionByRange`` samples the sort
    key to build balanced, NON-OVERLAPPING shard boundaries, then each
    shard sorts locally — a full distributed sort without any single
    machine seeing all data. This is both the training-shard layout
    (readers stream shard k independently, globally ordered across shards)
    and the precondition for min/max file skipping: disjoint per-file key
    ranges make a point query touch exactly one file."""
    (
        df.repartitionByRange(n_shards, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def surrogate_key(*cols) -> "pyspark.sql.Column":  # noqa: F821
    """Deterministic 64-bit surrogate key (SURVEY §7.3.1): xxhash64 of the
    natural key — stable across runs/executors, unlike
    monotonically_increasing_id, and needs no sequence/flush dance."""
    return F.xxhash64(*cols)
