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
scalar, Q2-style correlated MIN over a foreign table joined back as an
equality, Q22-style global-average threshold + NOT-EXISTS anti-join.
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
    aggregations over one scan, not a cartesian).

    Threshold note: the cut is EXACTLY the uniform share — total/6 for the
    6 part types. By a mean argument, unless every share equals 1/6 to the
    last decimal digit (measure-zero for real data), at least one type is
    strictly above the line and at least one below — so the HAVING keeps
    AND drops rows at ANY scale factor. Fixed constants fail this as SF
    grows: 0.18 went vacuous-drop at sf ≥ 0.01, and 0.168 (> 1/6) was
    measured down to a single survivor at sf0.1 (max share 0.1691 → 1/6),
    heading for zero. Measured margin to the cut is ≥ 3.5e-4 relative at
    every test SF — far beyond any decimal-division rounding skew between
    engines."""
    _register(spark, sf_dir, ["part"])
    return spark.sql("""
        SELECT p_type,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS type_value
        FROM _subq_part
        GROUP BY p_type
        HAVING SUM(CAST(p_retailprice AS DECIMAL(38,6))) > (
          SELECT SUM(CAST(p_retailprice AS DECIMAL(38,6))) / 6 FROM _subq_part
        )
        ORDER BY type_value DESC, p_type
    """)


CONCENTRATED_PART_TYPES_SQL = """
SELECT p_type,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS type_value
FROM part
GROUP BY p_type
HAVING SUM(CAST(p_retailprice AS DECIMAL(38,6))) > (
  SELECT SUM(CAST(p_retailprice AS DECIMAL(38,6))) / 6 FROM part
)
ORDER BY type_value DESC, p_type
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the supplier(s) behind its
    MINIMUM observed price — a correlated scalar MIN over a DIFFERENT
    table than the outer query's driving table, joined back by Catalyst
    as a per-part aggregate (never a per-row re-scan). MIN over doubles
    is order-insensitive, so the equality predicate is engine-exact; ties
    yield one row per tying supplier, deterministic as a set."""
    _register(spark, sf_dir, ["part", "lineitem", "supplier"])
    return spark.sql("""
        SELECT p_partkey, s_name, l_extendedprice AS best_price
        FROM _subq_part
        JOIN _subq_lineitem ON p_partkey = l_partkey
        JOIN _subq_supplier ON s_suppkey = l_suppkey
        WHERE p_size < 5
          AND l_extendedprice = (
            SELECT MIN(l2.l_extendedprice)
            FROM _subq_lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """)


CHEAPEST_SUPPLIER_PER_PART_SQL = """
SELECT p_partkey, s_name, l_extendedprice AS best_price
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size < 5
  AND l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def idle_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: TESTDATA customers carry no phone, so
    the country code becomes the nation key; and since EVERY synthetic
    customer has orders, "placed no orders" would be structurally empty —
    the anti-join tests nothing — so the predicate is "placed no
    URGENT-class order", which is ~10% selective and exercises the output
    path at every SF): per-nation totals of customers holding an
    above-global-average positive balance with no urgent orders — an
    uncorrelated scalar AVG threshold (computed once, broadcast into
    the filter) composed with a NOT EXISTS anti-join. The average runs
    through the decimal-accumulator trick (ops/helpers.py) spelled
    identically in both engines, so the threshold double is bit-equal and
    no borderline customer can flip sides."""
    _register(spark, sf_dir, ["customer", "orders"])
    return spark.sql("""
        SELECT c_nationkey AS cc,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 AS totacctbal
        FROM _subq_customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*)
            FROM _subq_customer c2 WHERE c2.c_acctbal > 0.0
          )
          AND NOT EXISTS (
            SELECT 1 FROM _subq_orders
            WHERE o_custkey = c_custkey
              AND SUBSTRING(o_orderpriority, 1, 1) = '1'
          )
        GROUP BY c_nationkey
        ORDER BY cc
    """)


IDLE_CUSTOMER_BALANCES_SQL = """
SELECT c_nationkey AS cc,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND SUBSTRING(o_orderpriority, 1, 1) = '1'
  )
GROUP BY c_nationkey
ORDER BY cc
"""


QUERIES = {
    "small_quantity_revenue": small_quantity_revenue,
    "suppliers_with_waiting_orders": suppliers_with_waiting_orders,
    "concentrated_part_types": concentrated_part_types,
    "cheapest_supplier_per_part": cheapest_supplier_per_part,
    "idle_customer_balances": idle_customer_balances,
}

ORACLES = {
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "suppliers_with_waiting_orders": SUPPLIERS_WITH_WAITING_ORDERS_SQL,
    "concentrated_part_types": CONCENTRATED_PART_TYPES_SQL,
    "cheapest_supplier_per_part": CHEAPEST_SUPPLIER_PER_PART_SQL,
    "idle_customer_balances": IDLE_CUSTOMER_BALANCES_SQL,
}
