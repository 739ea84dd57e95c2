"""Z-order (Morton-curve) data layout + zone-map pruning stats.

At 100 TB the cheapest query is the one that never reads the file:
columnar scans prune whole files from min/max zone maps, and how much
they prune is a property of the LAYOUT — which rows landed in which
file. Linear clustering (sort by one column) makes one dimension
prunable; interleaving the bits of two dimensions (the Z-order /
Morton curve, Morton 1966; the technique behind Delta Lake's
``OPTIMIZE ZORDER BY`` and the multi-dimensional clustering literature)
keeps BOTH dimensions' min/max ranges tight in every file.

This module implements the layout operator and its measurement as one
certified query:

1. z-value: bit-interleave of (l_partkey mod 256, l_suppkey mod 256) —
   pure integer shifts/masks, identical in Spark and ANSI SQL;
2. two file assignments of the same rows into ``_N_FILES`` equal
   buckets: ``arrival`` (table order — what a plain ingest writes) and
   ``zorder`` (sorted by z-value);
3. per (layout, file) zone-map stats — min/max of both dims, span
   widths — and the pruning verdict for a fixed probe predicate
   (``x BETWEEN 32 AND 47``): a file is skipped iff its zone map
   excludes the probe range.

Everything is exact integer arithmetic, so the DuckDB oracle recomputes
the full layout bit-for-bit; tests/test_layout.py additionally pins the
EFFECT (the zorder layout must prune strictly more files than arrival —
the reason the operator exists).

Scale shape: the certificate assigns files with NTILE over a global
ORDER BY (oracle-exact, fine at correctness SFs). Production layout is
the same plan minus the window: ``repartitionByRange(z)`` + per-range
file writes — a range shuffle, no global single-partition sort. The
z-value projection itself is codegen'd per-row work at the scan.

Reference anchor: the reference app has no layout surface (1.7 kLoC
pandas/SQLAlchemy, SURVEY §1); this is part of the 100 TB closure the
build brief requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table

#: bits interleaved per dimension (8 → 16-bit z-values, 2^8 cells/dim)
_DIM_BITS = 8
#: files per layout
_N_FILES = 64
#: fixed probe predicate on x for the pruning verdict
_PROBE_LO, _PROBE_HI = 32, 47


def _interleave(x: Column, y: Column, bits: int = _DIM_BITS) -> Column:
    """Morton interleave: bit b of x → bit 2b, bit b of y → bit 2b+1.
    Sum of disjoint powers of two (no overlap, so + ≡ bitwise OR)."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        z = z + F.shiftleft(
            F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1
        )
    return z


def _sql_interleave(x: str, y: str, bits: int = _DIM_BITS) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def zone_map_stats(cells: DataFrame) -> DataFrame:
    """Per (layout, file_id) zone maps + probe pruning verdict for a
    frame of (layout, file_id, x, y) rows."""
    return (
        cells.groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .select(
            "layout",
            "file_id",
            "rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
            (F.col("max_x") - F.col("min_x") + 1).alias("x_span"),
            (F.col("max_y") - F.col("min_y") + 1).alias("y_span"),
            (
                (F.col("max_x") < _PROBE_LO) | (F.col("min_x") > _PROBE_HI)
            ).alias("skips_probe"),
        )
    )


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map stats of the arrival vs z-order layouts of lineitem over
    the (l_partkey mod 256, l_suppkey mod 256) cell grid."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"),
    )
    li = li.withColumn("z", _interleave(F.col("x"), F.col("y")))
    arrival = li.withColumn(
        "file_id",
        F.ntile(_N_FILES).over(W.orderBy("l_orderkey", "l_linenumber")),
    ).withColumn("layout", F.lit("arrival"))
    zorder = li.withColumn(
        "file_id",
        F.ntile(_N_FILES).over(W.orderBy("z", "l_orderkey", "l_linenumber")),
    ).withColumn("layout", F.lit("zorder"))
    cells = arrival.unionByName(zorder).select("layout", "file_id", "x", "y")
    return zone_map_stats(cells)


ZORDER_LAYOUT_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % 256 AS x, l_suppkey % 256 AS y
  FROM lineitem
),
z AS (
  SELECT *, {_sql_interleave('x', 'y')} AS z FROM li
),
assigned AS (
  SELECT 'arrival' AS layout,
         NTILE({_N_FILES}) OVER (ORDER BY l_orderkey, l_linenumber)
           AS file_id,
         x, y
  FROM z
  UNION ALL
  SELECT 'zorder' AS layout,
         NTILE({_N_FILES}) OVER (ORDER BY z, l_orderkey, l_linenumber)
           AS file_id,
         x, y
  FROM z
)
SELECT layout, file_id, COUNT(*) AS rows,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y,
       MAX(x) - MIN(x) + 1 AS x_span,
       MAX(y) - MIN(y) + 1 AS y_span,
       (MAX(x) < {_PROBE_LO} OR MIN(x) > {_PROBE_HI}) AS skips_probe
FROM assigned
GROUP BY 1, 2
"""

QUERIES = {"zorder_layout": zorder_layout}
ORACLES = {"zorder_layout": ZORDER_LAYOUT_SQL}
