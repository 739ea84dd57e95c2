"""scale10x.py replication invariants (r7, pins the r6 ADVICE fix).

The 10x dataset builder must preserve referential integrity under key
shifting AND scale every key domain — including event_id, which r6
ADVICE caught as left duplicated across replicas (any event_id-keyed
dedup or join would silently see ~1x distinct events at the nominal
10x scale)."""

from __future__ import annotations

import sys


def test_scale10x_shifts_every_key_domain(tmp_path, monkeypatch):
    import duckdb

    import scale10x

    monkeypatch.setattr(scale10x, "SRC", "/root/testdata/sf0.001")
    monkeypatch.setattr(sys, "argv", ["scale10x.py", "--out", str(tmp_path)])
    assert scale10x.main() == 0

    con = duckdb.connect()

    def q(sql):
        return con.execute(sql).fetchone()[0]

    src, out = "/root/testdata/sf0.001", str(tmp_path)
    for table, key in [
        ("events", "event_id"),  # the ADVICE-flagged domain
        ("events", "user_id"),
        ("orders", "o_orderkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        n_src = q(f"SELECT COUNT(DISTINCT {key}) FROM read_parquet('{src}/{table}.parquet')")
        n_out = q(f"SELECT COUNT(DISTINCT {key}) FROM read_parquet('{out}/{table}.parquet')")
        assert n_out == 10 * n_src, (table, key, n_src, n_out)

    # referential integrity survives the shift: every replicated lineitem
    # still joins to exactly one replicated order
    dangling = q(
        f"SELECT COUNT(*) FROM read_parquet('{out}/lineitem.parquet') l "
        f"LEFT JOIN read_parquet('{out}/orders.parquet') o "
        f"ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
    )
    assert dangling == 0
    # dims stay the global domain (25 nations / 5 regions), not replicated
    assert q(f"SELECT COUNT(*) FROM read_parquet('{out}/nation.parquet')") == q(
        f"SELECT COUNT(*) FROM read_parquet('{src}/nation.parquet')"
    )
