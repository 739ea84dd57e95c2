#!/usr/bin/env python3
"""Reproduce the 10× scale experiment recorded in SCALE.md: replicate
the sf0.1 testdata tenfold with consistently shifted keys (dims stay
fixed — 25 nations / 5 regions are the global domain), then run the
headline bench against it.

    python scale10x.py --out /tmp/sf1          # build the dataset
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py

Key shifts preserve referential integrity: replica i adds i·|domain| to
every key column AND to the foreign keys that reference it, so joins
land exactly as in the original. Text/embedding payloads are copied
verbatim, which makes the corpus an ADVERSARIAL near-dup stress: every
document gains 9 exact clones, so the TRUE near-dup pair count grows
quadratically in the clone count (~100×), not linearly — the right
worst case for grading the dedup tier's output-sublinearity.
"""

from __future__ import annotations

import argparse
import os

SRC = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10

#: per-table key columns → the key DOMAIN they shift with (a foreign key
#: shifts with its referenced table's domain)
SHIFTS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    # event_id shifts with its own domain (r6 ADVICE: reusing source
    # event_ids across replicas would silently hand any event_id-keyed
    # dedup/join ~1x distinct events at the nominal 10x scale)
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

_DOMAIN_TABLE = {
    "event_id": "events",
    "o_orderkey": "orders",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> int:
    import duckdb

    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
    domain = {
        k: con.execute(
            f"SELECT MAX({k}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for k, t in _DOMAIN_TABLE.items()
    }
    for t, cols in SHIFTS.items():
        schema = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"CAST({c} + i * {domain[cols[c]]} AS BIGINT) AS {c}"
            if c in cols
            else c
            for c in schema
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"UNNEST(range(0, {REPLICAS})) AS r(i)) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
