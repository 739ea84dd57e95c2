"""Delta-style maintenance SQL surface over the txn table format.

The reference stack administers its store through ad-hoc scripts; Delta
Lake exposes table maintenance as SQL statements (``DESCRIBE HISTORY``,
``OPTIMIZE … ZORDER BY``, ``VACUUM``, ``RESTORE``). Spark has no
extension point for NEW SQL statements from Python, so this module is
the thin front door: ``run_maintenance_sql(spark, stmt)`` parses the
Delta-shaped statement and dispatches to the real implementations in
``io/txn.py``, returning each command's result as a DataFrame exactly
like Delta's commands do. ``txnctl.py`` at the repo root wraps the same
dispatch as a CLI (the operator twin of ``backfill.py`` for ETL).

Grammar (case-insensitive keywords; the table is a quoted path —
``'/data/t'`` or Delta's ``delta.`/data/t``` backtick form):

    DESCRIBE HISTORY '<table>'
    OPTIMIZE '<table>' [ZORDER BY (col [, col …])]
                       [TARGET FILE SIZE <bytes>]
    VACUUM '<table>' [RETAIN <n> VERSIONS | RETAIN <n> HOURS]
    RESTORE [TABLE] '<table>' TO VERSION AS OF <n>

ZORDER BY accepts one or two columns: one column degenerates to a plain
sort (self-interleaving bits is order-preserving, which IS single-column
Z-order); two columns interleave as in Delta. Three or more are rejected
with an explicit error — the txn format's space-filling curve is a
two-column bit interleave (``txn.compact(zorder_by=(a, b))``), and
silently clustering on a prefix of the requested columns would misstate
the skipping the operator believes they bought.

``RETAIN <n> HOURS`` is Delta's time-based retention, mapped onto the
format's version-count vacuum contract: the cutoff is ``now − n hours``
against each manifest's filesystem mtime (manifests are written once at
commit and never touched again, so mtime IS the commit wall-clock), and
the surviving set starts at the OLDEST manifest at or inside the cutoff
— vacuum retires only a version prefix, so a clock anomaly that
reorders mtimes can only widen retention, never delete past an
in-retention manifest. The current version always survives, as in
Delta. ``RETAIN <n> VERSIONS`` remains the native, clock-independent
form.

Every command routes through the SAME commit/OCC machinery queries use,
so concurrent readers/writers keep snapshot isolation mid-maintenance
(pinned by tests/test_txn.py); at 100 TB each command is manifest-bound
JSON work plus, for OPTIMIZE, one distributed rewrite of current files.
"""

from __future__ import annotations

import os
import re
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from . import txn
from ..ops.helpers import local_df

_TABLE = r"(?:delta\.`(?P<bt>[^`]+)`|'(?P<sq>[^']+)'|\"(?P<dq>[^\"]+)\")"


def _table_of(m: re.Match) -> str:
    return next(g for g in (m.group("bt"), m.group("sq"), m.group("dq")) if g)


_HISTORY = re.compile(rf"^\s*DESCRIBE\s+HISTORY\s+{_TABLE}\s*;?\s*$", re.I)
_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+{_TABLE}"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<zcols>\w+(?:\s*,\s*\w+)*)\s*\))?"
    r"(?:\s+TARGET\s+FILE\s+SIZE\s+(?P<bytes>\d+))?\s*;?\s*$",
    re.I,
)
_VACUUM = re.compile(
    rf"^\s*VACUUM\s+{_TABLE}"
    r"(?:\s+RETAIN\s+(?P<n>\d+(?:\.\d+)?)\s+(?P<unit>VERSIONS|HOURS))?\s*;?\s*$",
    re.I,
)
_RESTORE = re.compile(
    rf"^\s*RESTORE\s+(?:TABLE\s+)?{_TABLE}"
    r"\s+TO\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)\s*;?\s*$",
    re.I,
)

_HISTORY_SCHEMA = (
    "version bigint, operation string, n_files int, n_rows bigint, "
    "partition_by string, n_applied_batches int"
)


def _require_table(table: str) -> str:
    """A maintenance surface must fail loudly on a typo'd table path —
    DESCRIBE HISTORY / VACUUM against a nonexistent table would otherwise
    'succeed' with an empty/zero result and the operator would believe
    the real table was inspected/vacuumed (review-caught; Delta raises
    here too). OPTIMIZE/RESTORE already raise via snapshot()."""
    if not txn._list_versions(table):
        raise FileNotFoundError(f"no committed txn table at {table}")
    return table


def _hours_retention_plan(table: str, hours: float) -> tuple[int, int, int | None]:
    """(keep_versions, n_live, floor_version): map Delta's time-based
    retention onto the format's version-count vacuum contract
    (``txn.vacuum(keep_versions)``). ``floor_version`` is the oldest
    in-retention VERSION — passed to ``txn.vacuum(keep_from_version=…)``
    so the plan is anchored to history, not to a count that a concurrent
    commit can shift (the TOCTOU this pair closes).

    Manifests are written once at commit and never modified, so each
    manifest's filesystem mtime IS its commit wall-clock. Vacuum retires
    only a version PREFIX, so the surviving set starts at the OLDEST
    manifest whose mtime is at or inside ``now − hours`` and runs to the
    current version: an mtime anomaly that reorders timestamps (clock
    skew, a copied table) can only pull the start earlier — widening
    retention — never widen deletion past an in-retention manifest. The
    current version always survives (Delta's invariant — VACUUM never
    deletes the live snapshot), hence the floor of 1.

    Both numbers come from ONE listing pass — computed separately, the
    race detection in ``run_maintenance_sql`` has a blind spot. ``n_live``
    counts only manifests that still EXISTED at stat time: a manifest
    retired by a concurrent vacuum between the listing and the stat must
    not inflate the expected-removal bound, or it would mask exactly the
    concurrent-commit race the bound exists to surface (review-caught)."""
    if hours < 0:
        raise ValueError("RETAIN … HOURS takes a non-negative duration")
    cutoff = time.time() - hours * 3600.0
    stamped = []
    for v in txn._list_versions(table):
        try:
            stamped.append((v, os.path.getmtime(txn._log_path(table, v))))
        except FileNotFoundError:
            # concurrent vacuum retired this manifest between the listing
            # and the stat — it no longer needs retaining NOR counting
            continue
    keep = 0
    for i, (_v, mtime) in enumerate(stamped):
        if mtime >= cutoff:
            keep = len(stamped) - i
            break
    keep = max(keep, 1)
    floor_version = stamped[-keep][0] if stamped else None
    return keep, len(stamped), floor_version


def run_maintenance_sql(spark: SparkSession, stmt: str) -> DataFrame:
    """Parse one Delta-style maintenance statement and execute it.

    Returns the command result as a DataFrame (Delta's convention):
    DESCRIBE HISTORY → one row per version, newest last; OPTIMIZE /
    VACUUM / RESTORE → a single metrics row. Raises ``ValueError`` with
    the supported grammar on anything unrecognized — a maintenance
    surface must never silently no-op a mistyped destructive command.
    """
    if m := _HISTORY.match(stmt):
        rows = txn.history(_require_table(_table_of(m)))
        return local_df(
            spark,
            [
                (
                    r["version"],
                    r["operation"],
                    r["n_files"],
                    r["n_rows"],
                    r["partition_by"],
                    r["n_applied_batches"],
                )
                for r in rows
            ],
            _HISTORY_SCHEMA,
        )
    if m := _OPTIMIZE.match(stmt):
        table = _table_of(m)
        zcols: tuple[str, ...] = ()
        if m.group("zcols"):
            zcols = tuple(c.strip() for c in m.group("zcols").split(","))
            if len(zcols) > 2:
                # the format's space-filling curve is a two-column bit
                # interleave; clustering on a silent prefix would misstate
                # the skipping the operator believes they bought
                raise ValueError(
                    f"ZORDER BY supports at most two columns (the txn "
                    f"format's curve is a two-column bit interleave); "
                    f"got {len(zcols)}: {', '.join(zcols)}"
                )
        before = txn.snapshot(table)
        kwargs: dict[str, Any] = {}
        if zcols:
            # one column degenerates to a plain sort: interleaving a
            # column's bits with themselves is order-preserving, so
            # (col, col) IS single-column Z-order
            za, zb = zcols if len(zcols) == 2 else (zcols[0], zcols[0])
            kwargs["zorder_by"] = (za, zb)
            # z-order without re-harvested stats would silently drop the
            # very skipping it exists to enable
            kwargs["stats_cols"] = list(dict.fromkeys((za, zb)))
        if m.group("bytes"):
            target = int(m.group("bytes"))
            if target <= 0:
                # \d+ admits 0, which would reach compact's
                # ceil(total / target) as a ZeroDivisionError traceback —
                # reject at the grammar, like every other operator typo
                raise ValueError("TARGET FILE SIZE must be a positive byte count")
            kwargs["target_file_bytes"] = target
        after = txn.compact(spark, table, **kwargs)
        return local_df(
            spark,
            [
                (
                    table,
                    after.version,
                    len(before.files),
                    len(after.files),
                    ",".join(zcols) if zcols else None,
                )
            ],
            "table string, version bigint, files_before int, "
            "files_after int, zorder_by string",
        )
    if m := _VACUUM.match(stmt):
        table = _require_table(_table_of(m))
        kwargs = {}
        max_expected_removed = None
        if m.group("n"):
            if m.group("unit").upper() == "VERSIONS":
                if "." in m.group("n"):
                    raise ValueError("RETAIN … VERSIONS takes an integer count")
                kwargs["keep_versions"] = int(m.group("n"))
            else:
                keep, n_listed, floor = _hours_retention_plan(
                    table, float(m.group("n"))
                )
                kwargs["keep_versions"] = keep
                # the floor anchors retention to HISTORY: a commit landing
                # between this plan and the vacuum widens the kept set
                # (txn.vacuum keeps everything >= floor) instead of
                # shifting a newest-N window over manifests inside the
                # RETAIN window. With the floor in place, the bound below
                # is a pure invariant check — only out-of-band manifest
                # loss or a vacuum bug can exceed it, never a benign
                # concurrent commit.
                # clamp: keep has a floor of 1, so a pathological empty
                # listing (everything retired out-of-band between the
                # existence check and the plan) would yield -1 and turn a
                # zero-removal vacuum into a false race report
                kwargs["keep_from_version"] = floor
                max_expected_removed = max(0, n_listed - keep)
        res = txn.vacuum(table, **kwargs)
        if (
            max_expected_removed is not None
            and res["removed_versions"] > max_expected_removed
        ):
            raise RuntimeError(
                f"RETAIN HOURS invariant violated on {table}: "
                f"{res['removed_versions'] - max_expected_removed} more "
                f"manifest(s) retired than the plan allowed despite the "
                f"keep_from_version floor — out-of-band manifest loss or "
                f"a vacuum defect; treat pinned readers of the retired "
                f"versions as broken"
            )
        return local_df(
            spark,
            [(table, res["removed_files"], res["removed_versions"])],
            "table string, removed_files int, removed_versions int",
        )
    if m := _RESTORE.match(stmt):
        table = _table_of(m)
        snap = txn.restore(table, int(m.group("version")))
        return local_df(
            spark,
            [(table, int(m.group("version")), snap.version)],
            "table string, restored_version bigint, new_version bigint",
        )
    raise ValueError(
        "unrecognized maintenance statement; supported:\n"
        "  DESCRIBE HISTORY '<table>'\n"
        "  OPTIMIZE '<table>' [ZORDER BY (col [, col])] "
        "[TARGET FILE SIZE <bytes>]\n"
        "  VACUUM '<table>' [RETAIN <n> VERSIONS | RETAIN <n> HOURS]\n"
        "  RESTORE [TABLE] '<table>' TO VERSION AS OF <n>\n"
        f"got: {stmt!r}"
    )
