"""Delta-style maintenance SQL surface (io/txn_maint.py) + txnctl CLI.

VERDICT r4 item 8: the txn format's maintenance ops (OPTIMIZE ZORDER,
VACUUM, RESTORE, DESCRIBE HISTORY) driveable end-to-end through one
statement surface, mirroring Delta's SQL commands."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io import txn
from ir_analyses_spark.io.txn_maint import run_maintenance_sql


def _mk(spark, rows, cols=("k", "day", "v")):
    return spark.createDataFrame(rows, list(cols))


def _lifecycle(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.overwrite(_mk(spark, [(1, "a", 10), (2, "b", 20)]), t)
    txn.append(_mk(spark, [(3, "c", 30)]), t)
    txn.merge_upsert(_mk(spark, [(2, "b", 99)]), t, keys=["k"])
    return t


def test_describe_history_statement(spark, tmp_path):
    t = _lifecycle(spark, tmp_path)
    h = run_maintenance_sql(spark, f"DESCRIBE HISTORY '{t}'").collect()
    assert [r["version"] for r in h] == [1, 2, 3]
    assert [r["operation"] for r in h] == ["overwrite", "append", "merge_upsert"]
    assert [r["n_rows"] for r in h] == [2, 3, 3]
    # Delta's backtick table form parses to the same result
    h2 = run_maintenance_sql(spark, f"describe history delta.`{t}`").collect()
    assert h == h2


def test_optimize_zorder_statement_compacts_and_harvests_stats(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(400).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 400).alias("b")
    )
    txn.overwrite(df.repartition(8), t)
    res = run_maintenance_sql(
        spark, f"OPTIMIZE '{t}' ZORDER BY (a, b)"
    ).collect()[0]
    assert res["files_after"] <= res["files_before"]
    assert res["zorder_by"] == "a,b"
    snap = txn.snapshot(t)
    assert snap.version == res["version"]
    # the statement must re-harvest min/max stats for BOTH z-columns —
    # an OPTIMIZE that drops them silently degrades skipping to full scan
    assert all(
        "stats" in f and {"a", "b"} <= set(f["stats"]) for f in snap.files
    )
    # and the data survives byte-exact
    got = sorted(
        (r["a"], r["b"]) for r in txn.read(spark, t).collect()
    )
    assert got == [(i, i * 7 % 400) for i in range(400)]


def test_vacuum_statement_retains_n_versions(spark, tmp_path):
    t = _lifecycle(spark, tmp_path)
    res = run_maintenance_sql(
        spark, f"VACUUM '{t}' RETAIN 1 VERSIONS"
    ).collect()[0]
    assert res["removed_versions"] == 2
    assert [r["version"] for r in txn.history(t)] == [3]
    # current snapshot still reads
    assert {r["v"] for r in txn.read(spark, t).collect()} == {10, 99, 30}


def test_restore_statement_rolls_back_as_new_commit(spark, tmp_path):
    t = _lifecycle(spark, tmp_path)
    res = run_maintenance_sql(
        spark, f"RESTORE TABLE '{t}' TO VERSION AS OF 1"
    ).collect()[0]
    assert (res["restored_version"], res["new_version"]) == (1, 4)
    assert sorted(
        (r["k"], r["v"]) for r in txn.read(spark, t).collect()
    ) == [(1, 10), (2, 20)]
    # history preserved: the rolled-back commits stay inspectable
    ops = [r["operation"] for r in txn.history(t)]
    assert ops == ["overwrite", "append", "merge_upsert", "restore"]


def test_unrecognized_statement_raises_not_noops(spark):
    # a maintenance surface must never silently no-op a destructive typo
    with pytest.raises(ValueError, match="OPTIMIZE"):
        run_maintenance_sql(spark, "VACUUM TABLE oops RETAIN 1 HOURS")
    with pytest.raises(ValueError, match="unrecognized"):
        run_maintenance_sql(spark, "DROP TABLE '/x'")


def test_txnctl_cli_roundtrip(spark, tmp_path, capsys):
    import txnctl

    t = _lifecycle(spark, tmp_path)
    assert txnctl.main([f"DESCRIBE HISTORY '{t}'"]) == 0
    out = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert [r["version"] for r in out] == [1, 2, 3]
    # grammar rejection → exit 2 and the grammar on stderr
    assert txnctl.main(["TRUNCATE '/x'"]) == 2
    assert "DESCRIBE HISTORY" in capsys.readouterr().err


def test_maintenance_rejects_zero_target_and_missing_tables(spark, tmp_path):
    """Review-caught operator hazards: TARGET FILE SIZE 0 must be a
    grammar-level rejection (not a ZeroDivisionError traceback inside
    compact), and DESCRIBE HISTORY / VACUUM against a typo'd path must
    raise rather than 'succeed' with an empty/zero result the operator
    would mistake for a real run."""
    t = _lifecycle(spark, tmp_path)
    with pytest.raises(ValueError, match="positive"):
        run_maintenance_sql(spark, f"OPTIMIZE '{t}' TARGET FILE SIZE 0")
    missing = str(tmp_path / "no_such_table")
    with pytest.raises(FileNotFoundError, match="no committed"):
        run_maintenance_sql(spark, f"DESCRIBE HISTORY '{missing}'")
    with pytest.raises(FileNotFoundError, match="no committed"):
        run_maintenance_sql(spark, f"VACUUM '{missing}' RETAIN 1 VERSIONS")
    import txnctl

    assert txnctl.main([f"DESCRIBE HISTORY '{missing}'"]) == 2


def test_parser_fuzz_never_silently_dispatches(spark, tmp_path):
    """Property: any statement that is not EXACTLY one of the four
    grammar shapes raises ValueError carrying the grammar — the surface
    must never guess at a destructive command. Fuzzed over random token
    mutations of valid statements (dropped/duplicated/misspelled
    keywords, unquoted paths, trailing junk) plus arbitrary text."""
    from hypothesis import given, settings, strategies as st

    t = str(tmp_path / "t")  # never created: even a parse-pass would raise FNF, not mutate

    valid = [
        f"DESCRIBE HISTORY '{t}'",
        f"OPTIMIZE '{t}' ZORDER BY (a, b)",
        f"VACUUM '{t}' RETAIN 2 VERSIONS",
        f"RESTORE TABLE '{t}' TO VERSION AS OF 1",
    ]

    def mutate(stmt, op):
        kind, i = op
        toks = stmt.split(" ")
        i %= len(toks)
        if kind == 0:
            del toks[i]
        elif kind == 1:
            toks.insert(i, toks[i])
        elif kind == 2:
            toks[i] = toks[i][:-1] + "X"
        else:
            toks.append("EXTRA")
        return " ".join(toks)

    @settings(max_examples=200, deadline=None)
    @given(
        base=st.sampled_from(valid),
        op=st.tuples(st.integers(0, 3), st.integers(0, 7)),
    )
    def run(base, op):
        stmt = mutate(base, op)
        if stmt in valid:  # duplicate-then-rejoin can reproduce the original
            return
        import pytest as _p

        from ir_analyses_spark.io.txn_maint import run_maintenance_sql

        # every mutant must be rejected at parse (ValueError with the
        # grammar) or, if it still parses to a shape naming the
        # nonexistent table, fail its existence check (FileNotFoundError)
        # — never return a result frame
        with _p.raises((ValueError, FileNotFoundError)):
            run_maintenance_sql(spark, stmt)

    run()


def test_vacuum_retain_hours_lifecycle(spark, tmp_path):
    """r7 (VERDICT r6 item 6): Delta's time-based retention. Manifest
    mtimes are backdated with os.utime to simulate age — manifests are
    write-once, so mtime is the commit wall-clock."""
    import os
    import time

    from ir_analyses_spark.io.txn_maint import _hours_retention_plan

    t = _lifecycle(spark, tmp_path)  # versions 1, 2, 3
    old = time.time() - 2 * 3600  # two hours ago
    for v in (1, 2):
        os.utime(txn._log_path(t, v), (old, old))
    # cutoff 1h: versions 1-2 are outside retention, current (3) inside
    assert _hours_retention_plan(t, 1.0)[0] == 1
    res = run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 1 HOURS").collect()[0]
    assert res["removed_versions"] == 2
    assert [r["version"] for r in txn.history(t)] == [3]
    # current snapshot still reads after time-based retirement
    assert {r["v"] for r in txn.read(spark, t).collect()} == {10, 99, 30}
    # RETAIN 0 HOURS retains only the live snapshot (floor of 1): idempotent here
    res2 = run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 0 HOURS").collect()[0]
    assert (res2["removed_versions"], res2["removed_files"]) == (0, 0)


def test_vacuum_retain_hours_anomaly_widens_retention_not_deletion(
    spark, tmp_path
):
    """An mtime anomaly (an OLD version stamped recent — clock skew or a
    copied table) must pull the surviving prefix EARLIER, never delete an
    in-retention manifest: the surviving set starts at the OLDEST
    manifest inside the cutoff."""
    import os
    import time

    from ir_analyses_spark.io.txn_maint import _hours_retention_plan

    t = _lifecycle(spark, tmp_path)  # versions 1, 2, 3
    old = time.time() - 2 * 3600
    # v1 recent (anomalous: older version, newer mtime), v2 old, v3 recent
    os.utime(txn._log_path(t, 2), (old, old))
    assert _hours_retention_plan(t, 1.0)[0] == 3  # v1 in-retention → keep all
    res = run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 1 HOURS").collect()[0]
    assert res["removed_versions"] == 0
    assert [r["version"] for r in txn.history(t)] == [1, 2, 3]


def test_vacuum_retain_grammar_rejects_bad_units(spark, tmp_path):
    t = _lifecycle(spark, tmp_path)
    # fractional VERSIONS is a grammar-level rejection, not int() truncation
    with pytest.raises(ValueError, match="integer"):
        run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 1.5 VERSIONS")
    # unknown unit never silently dispatches
    with pytest.raises(ValueError, match="unrecognized"):
        run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 1 DAYS")
    # fractional HOURS is legal Delta-style input
    res = run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 0.5 HOURS").collect()[0]
    assert res["removed_versions"] == 0  # everything is seconds old


def test_optimize_zorder_single_column_is_plain_sort(spark, tmp_path):
    """r7 ADVICE fix: ZORDER BY (a) is legal — one column degenerates to
    a plain sort (self-interleaved bits preserve order), stats harvested
    for the one column; three or more columns are rejected with the
    documented two-column interleave limit."""
    t = str(tmp_path / "t")
    df = spark.range(400).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 400).alias("b")
    )
    txn.overwrite(df.repartition(8), t)
    res = run_maintenance_sql(spark, f"OPTIMIZE '{t}' ZORDER BY (a)").collect()[0]
    assert res["zorder_by"] == "a"
    snap = txn.snapshot(t)
    assert all("stats" in f and "a" in f["stats"] for f in snap.files)
    # single-column z-order IS a sort: the per-file [min,max] ranges of
    # `a` must be pairwise disjoint (perfect clustering)
    spans = sorted(tuple(f["stats"]["a"]) for f in snap.files)
    assert all(hi < lo_next for (_, hi), (lo_next, _) in zip(spans, spans[1:]))
    # data survives byte-exact
    got = sorted((r["a"], r["b"]) for r in txn.read(spark, t).collect())
    assert got == [(i, i * 7 % 400) for i in range(400)]
    with pytest.raises(ValueError, match="two columns"):
        run_maintenance_sql(spark, f"OPTIMIZE '{t}' ZORDER BY (a, b, a)")


def test_retain_hours_concurrent_commit_vacuums_safely(spark, tmp_path, monkeypatch):
    """r8 (VERDICT r7 item 2): the RETAIN HOURS TOCTOU is CLOSED, not
    just detected. The plan resolves its cutoff to the oldest
    in-retention VERSION and passes it as txn.vacuum's keep_from_version
    floor, so a commit landing between the plan and the vacuum widens
    the kept set — every in-retention manifest survives, no raise."""
    import os
    import time

    t = _lifecycle(spark, tmp_path)  # versions 1, 2, 3
    old = time.time() - 2 * 3600
    for v in (1, 2):
        os.utime(txn._log_path(t, v), (old, old))

    real_vacuum = txn.vacuum

    def racing_vacuum(table, **kwargs):
        # the concurrent writer lands v4 after the plan was computed
        txn.append(_mk(spark, [(9, "z", 90)]), table)
        return real_vacuum(table, **kwargs)

    monkeypatch.setattr(txn, "vacuum", racing_vacuum)
    res = run_maintenance_sql(spark, f"VACUUM '{t}' RETAIN 1 HOURS").collect()[0]
    # only the out-of-retention prefix (v1, v2) was retired; the
    # in-retention v3 AND the racing v4 both survive the shifted window
    assert res["removed_versions"] == 2
    assert [r["version"] for r in txn.history(t)] == [3, 4]
    # the table still reads: pre-race rows plus the racing writer's row
    assert {r["v"] for r in txn.read(spark, t).collect()} == {10, 99, 30, 90}


def test_vacuum_keep_from_version_floor(spark, tmp_path):
    """Direct contract: keep_from_version retains every manifest at or
    above the floor even when keep_versions alone would retire it, and a
    floor inside the newest-N window changes nothing."""
    t = _lifecycle(spark, tmp_path)  # versions 1, 2, 3
    # floor wider than the count window: keep_versions=1 would retire
    # v1+v2, the floor keeps v2 too
    res = txn.vacuum(t, keep_versions=1, keep_from_version=2)
    assert res["removed_versions"] == 1
    assert [r["version"] for r in txn.history(t)] == [2, 3]
    # floor inside the window: no-op relative to keep_versions
    res2 = txn.vacuum(t, keep_versions=2, keep_from_version=3)
    assert res2["removed_versions"] == 0
    assert [r["version"] for r in txn.history(t)] == [2, 3]


def test_history_hole_message_reports_gap_boundaries(spark, tmp_path):
    """r8 (r6 ADVICE, deferred): the non-contiguous-manifests error names
    the gap boundaries, not the full version listing (unreadable on a
    thousand-version table)."""
    import os

    t = _lifecycle(spark, tmp_path)  # versions 1, 2, 3
    os.remove(txn._log_path(t, 2))  # out-of-band loss → hole 1..3
    with pytest.raises(FileNotFoundError) as ei:
        txn.history(t)
    msg = str(ei.value)
    assert "1..3" in msg and "1..3" in msg.split("gap(s)")[1]
    assert "surviving range 1..3" in msg
    # the raw listing is NOT inlined
    assert "[1, 3]" not in msg


def test_hours_retention_plan_properties(spark, tmp_path):
    """Model-checks the hours→keep_versions mapping over random mtime
    assignments (a destructive path deserves property coverage):
    (a) keep has a floor of 1 (the live snapshot always survives);
    (b) the kept suffix starts at the OLDEST in-retention manifest —
        no in-retention manifest is ever left outside it, even under
        non-monotone (anomalous) mtimes;
    (c) retention widens monotonically with the hours argument."""
    import os
    import time

    from hypothesis import given, settings, strategies as st

    from ir_analyses_spark.io.txn_maint import _hours_retention_plan

    t = str(tmp_path / "t")
    txn.overwrite(_mk(spark, [(1, "a", 10)]), t)
    for i in range(5):
        txn.append(_mk(spark, [(2 + i, "b", 20 + i)]), t)
    versions = txn._list_versions(t)  # 6 versions
    now = time.time()

    # integer ages vs half-offset hours: the cutoff can never collide
    # with a manifest mtime, so the model's clock and the plan's clock
    # (microseconds apart) agree on which side every manifest falls
    @settings(max_examples=120, deadline=None)
    @given(
        ages_h=st.lists(st.integers(0, 10), min_size=6, max_size=6),
        hours_base=st.integers(0, 10),
    )
    def run(ages_h, hours_base):
        hours = hours_base + 0.5
        for v, age in zip(versions, ages_h):
            ts = now - age * 3600
            os.utime(txn._log_path(t, v), (ts, ts))
        keep, n_live, floor = _hours_retention_plan(t, hours)
        assert n_live == len(versions)
        assert 1 <= keep <= len(versions)  # (a)
        # floor is the oldest kept version — the count window and the
        # version floor describe the SAME suffix at plan time
        assert floor == versions[len(versions) - keep]
        cutoff = now - hours * 3600
        in_retention = [
            v for v, age in zip(versions, ages_h) if now - age * 3600 >= cutoff
        ]
        if in_retention:
            oldest_kept_idx = len(versions) - keep
            # (b): every in-retention manifest sits inside the kept suffix
            assert set(in_retention) <= set(versions[oldest_kept_idx:])
        # (c) monotonicity in hours
        keep_wider, _, _ = _hours_retention_plan(t, hours + 1.0)
        assert keep_wider >= keep

    run()
