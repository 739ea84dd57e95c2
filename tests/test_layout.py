"""Z-order layout invariants (ops/layout.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
Morton-curve arithmetic and the EFFECT — the clustering win that is the
operator's reason to exist.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.ops import layout
from ir_analyses_spark.registry import all_oracles


def test_interleave_corners(spark):
    """Closed-form Morton values: all-x bits land on even positions,
    all-y bits on odd positions, full grid → full 16-bit range."""
    df = spark.createDataFrame(
        [(255, 0), (0, 255), (255, 255), (0, 0), (1, 0), (0, 1)],
        "x long, y long",
    )
    rows = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", layout._interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert rows[(255, 0)] == 0x5555  # 0101...01
    assert rows[(0, 255)] == 0xAAAA  # 1010...10
    assert rows[(255, 255)] == 0xFFFF
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1 and rows[(0, 1)] == 2


def test_sql_interleave_is_the_same_function(spark):
    """The oracle's SQL spelling must compute the identical z for every
    cell of the 256×256 grid (exhaustive, Spark evaluating both)."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    diff = (
        grid.withColumn("z_py", layout._interleave(F.col("x"), F.col("y")))
        .withColumn("z_sql", F.expr(layout._sql_interleave("x", "y")))
        .filter(F.col("z_py") != F.col("z_sql"))
        .count()
    )
    assert diff == 0


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def stats(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/lineitem.parquet')"
    )
    return con.execute(all_oracles()["zorder_layout"]).df()


def test_layouts_complete_and_balanced(stats):
    """Both layouts assign all 64 files; NTILE balance: file row counts
    differ by at most 1 within a layout."""
    for layout_name, grp in stats.groupby("layout"):
        assert len(grp) == 64
        assert grp["rows"].max() - grp["rows"].min() <= 1
    # same total row count in both layouts (same underlying rows)
    totals = stats.groupby("layout")["rows"].sum()
    assert totals.nunique() == 1


def test_zorder_actually_clusters(stats):
    """The whole point: z-order must prune strictly more files for the
    probe than arrival order, and tighten BOTH dims' average spans.
    (Arrival order in the synthetic data is uncorrelated with partkey/
    suppkey, so its zone maps are near-useless — ~full-range spans.)"""
    arrival = stats[stats["layout"] == "arrival"]
    zorder = stats[stats["layout"] == "zorder"]
    assert zorder["skips_probe"].sum() > max(4, 2 * arrival["skips_probe"].sum())
    assert zorder["x_span"].mean() < arrival["x_span"].mean() / 2
    assert zorder["y_span"].mean() < arrival["y_span"].mean()


def test_zone_maps_sound(stats):
    """A file marked skips_probe must truly exclude the probe range."""
    skipped = stats[stats["skips_probe"]]
    assert (
        (skipped["max_x"] < layout._PROBE_LO)
        | (skipped["min_x"] > layout._PROBE_HI)
    ).all()
