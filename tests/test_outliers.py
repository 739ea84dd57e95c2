"""Modified z-score outlier screen invariants (ops/outliers.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
statistic's semantics (robustness to the outliers it flags, NULL
exclusion) and the non-vacuity of both branches at the correctness SFs.
"""

from __future__ import annotations

from ir_analyses_spark.ops.outliers import mad_outliers, robust_outlier_stats


def test_known_outlier_flagged(spark):
    """A controlled group: 99 values in [100, 102] plus one at 10^6 —
    exactly one outlier, and the median/MAD are untouched by it
    (the robustness property that motivates MAD over stddev)."""
    rows = [("g", 100.0 + (i % 3)) for i in range(99)] + [("g", 1e6)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = robust_outlier_stats(df, "grp", "v").collect()[0]
    assert out["n"] == 100
    assert out["n_outliers"] == 1
    assert 100.0 <= out["median_value"] <= 102.0
    assert out["mad"] <= 2.0


def test_uniformish_group_has_none(spark):
    """A tight group must flag nothing — the 3.5 cut is conservative by
    design (Iglewicz & Hoaglin)."""
    rows = [("g", float(v)) for v in range(50, 151)]
    df = spark.createDataFrame(rows, "grp string, v double")
    assert robust_outlier_stats(df, "grp", "v").collect()[0]["n_outliers"] == 0


def test_nulls_excluded(spark):
    rows = [("g", float(v)) for v in range(10)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "grp string, v double")
    assert robust_outlier_stats(df, "grp", "v").collect()[0]["n"] == 10


def test_registry_both_branches_fire(spark):
    """events.value must carry real tail mass in EVERY group at the
    correctness SFs (measured: max modified z 4.9-12.5), and no group
    may be all-outlier — otherwise a broken cut still matches."""
    rows = mad_outliers(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    assert all(0 < r["n_outliers"] < r["n"] for r in rows)


def test_plan_broadcasts_stat_frames(spark):
    """The (group, median) and (group, mad) frames ride broadcast joins
    back onto the fact stream — no SortMergeJoin on the full table."""
    plan = (
        mad_outliers(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
