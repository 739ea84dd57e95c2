#!/usr/bin/env python3
"""txnctl: operator CLI for the txn table format's maintenance lifecycle
— the admin twin of ``backfill.py`` (ETL) over ``io/txn_maint.py``'s
Delta-style statement surface. One statement per invocation, result
printed as one JSON line per row (machine-readable, like bench.py).

    python txnctl.py "DESCRIBE HISTORY '/data/t'"
    python txnctl.py "OPTIMIZE '/data/t' ZORDER BY (k, v)"
    python txnctl.py "VACUUM '/data/t' RETAIN 3 VERSIONS"
    python txnctl.py "VACUUM '/data/t' RETAIN 168 HOURS"
    python txnctl.py "RESTORE '/data/t' TO VERSION AS OF 2"

Runs identically under plain python and spark-submit. Exit codes:
0 = command ran, 2 = statement rejected (grammar or table error).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1 or argv[0] in ("-h", "--help"):
        print(__doc__.strip(), file=sys.stderr)
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    from ir_analyses_spark.io.txn_maint import run_maintenance_sql
    from ir_analyses_spark.session import get_spark

    spark = get_spark(app_name="txnctl")
    try:
        result = run_maintenance_sql(spark, argv[0])
    except (ValueError, FileNotFoundError) as exc:
        print(f"txnctl: {exc}", file=sys.stderr)
        return 2
    for row in result.collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
