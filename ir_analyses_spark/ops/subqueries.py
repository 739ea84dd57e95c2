"""Correlated-subquery query shapes (§2B SQL surface): scalar subqueries,
EXISTS / NOT EXISTS chains, and HAVING-over-global-aggregate — written
through ``spark.sql`` on purpose. The DataFrame API can't express a
correlated subquery directly; these exercise Catalyst's DECORRELATION
(RewriteCorrelatedScalarSubquery / RewritePredicateSubquery), which turns
each correlated reference into the aggregate-then-join / semi-join /
anti-join plans the rest of the engine uses explicitly. Same physics at
100 TB — the subquery form is sugar, and these entries pin that the sugar
lowers to the scale-safe plan, not to a per-row re-execution.

TPC-H shapes adapted to the TESTDATA columns: Q17-style scalar-per-group,
Q21-style EXISTS + NOT EXISTS self-joins, Q11-style HAVING vs a global
scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.sources import load_table


def _register(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    """Register inputs under a module prefix (``_subq_*``): the driver
    contract hands these queries an arbitrary SparkSession, and bare names
    like ``lineitem`` would clobber (and leak into) the caller's own temp
    views — same convention as ``_gs_lineitem`` in aggregates.py."""
    for n in names:
        load_table(spark, n, sf_dir).createOrReplaceTempView(f"_subq_{n}")


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below 40% of their part's
    average quantity — a correlated SCALAR subquery per outer row that
    Catalyst decorrelates into one per-part aggregate joined back (the
    scan of lineitem happens twice, never per-row).

    Numeric note: the /7 happens ONCE, on the exact decimal SUM, as an IEEE
    double op — dividing per row would accumulate engine-specific decimal
    quotient rounding (Spark's result scale vs DuckDB's) across thousands
    of rows and break exact cross-engine parity."""
    _register(spark, sf_dir, ["lineitem", "part"])
    return spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7
                 AS avg_weekly_revenue
        FROM _subq_lineitem JOIN _subq_part ON l_partkey = p_partkey
        WHERE p_size < 10
          AND l_quantity < (
            SELECT 0.4 * AVG(l2.l_quantity)
            FROM _subq_lineitem l2 WHERE l2.l_partkey = l_partkey
          )
    """)


SMALL_QUANTITY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7
         AS avg_weekly_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size < 10
  AND l_quantity < (
    SELECT 0.4 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l_partkey
  )
"""


def suppliers_with_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose lineitem was the late one on a
    multi-supplier order — EXISTS (another supplier on the order) AND NOT
    EXISTS (another LATE supplier on the order). Both correlated
    predicates decorrelate to a semi-join and an anti-join on l_orderkey;
    the triple self-join of the fact table shuffles on the order key once
    per side, never nested-loops."""
    _register(spark, sf_dir, ["lineitem", "supplier"])
    return spark.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM _subq_supplier JOIN _subq_lineitem l1 ON s_suppkey = l1.l_suppkey
        WHERE MONTH(l1.l_shipdate) >= 6
          AND EXISTS (
            SELECT 1 FROM _subq_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM _subq_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND MONTH(l3.l_shipdate) >= 6
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


SUPPLIERS_WITH_WAITING_ORDERS_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
WHERE MONTH(l1.l_shipdate) >= 6
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND MONTH(l3.l_shipdate) >= 6
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def concentrated_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: part types whose retail value exceeds a fraction
    of the GLOBAL total — an uncorrelated scalar subquery in HAVING,
    planned as one extra scalar aggregate broadcast into the filter (two
    aggregations over one scan, not a cartesian)."""
    _register(spark, sf_dir, ["part"])
    return spark.sql("""
        SELECT p_type,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS type_value
        FROM _subq_part
        GROUP BY p_type
        HAVING SUM(CAST(p_retailprice AS DECIMAL(38,6))) > (
          SELECT SUM(CAST(p_retailprice AS DECIMAL(38,6))) * 0.18 FROM _subq_part
        )
        ORDER BY type_value DESC, p_type
    """)


CONCENTRATED_PART_TYPES_SQL = """
SELECT p_type,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS type_value
FROM part
GROUP BY p_type
HAVING SUM(CAST(p_retailprice AS DECIMAL(38,6))) > (
  SELECT SUM(CAST(p_retailprice AS DECIMAL(38,6))) * 0.18 FROM part
)
ORDER BY type_value DESC, p_type
"""


QUERIES = {
    "small_quantity_revenue": small_quantity_revenue,
    "suppliers_with_waiting_orders": suppliers_with_waiting_orders,
    "concentrated_part_types": concentrated_part_types,
}

ORACLES = {
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "suppliers_with_waiting_orders": SUPPLIERS_WITH_WAITING_ORDERS_SQL,
    "concentrated_part_types": CONCENTRATED_PART_TYPES_SQL,
}
