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
    of rows and break exact cross-engine parity.

    Correlation note (r6 review fix): the inner predicate MUST reference
    the OUTER part key (``= p_partkey``). The previous ``= l_partkey``
    resolved to the inner ``l2`` scope — a tautology that silently made
    the subquery the GLOBAL average (and the oracle repeated the same
    text, so parity stayed green on the wrong semantics — measured
    15,360,840.29 vs the correlated 14,457,875.45 at sf0.01). The
    vacuity guard now builds from THIS sql text, not a hand-inlined
    copy."""
    _register(spark, sf_dir, ["lineitem", "part"])
    return spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7
                 AS avg_weekly_revenue
        FROM _subq_lineitem JOIN _subq_part ON l_partkey = p_partkey
        WHERE p_size < 10
          AND l_quantity < (
            SELECT 0.4 * AVG(l2.l_quantity)
            FROM _subq_lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """)


SMALL_QUANTITY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7
         AS avg_weekly_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size < 10
  AND l_quantity < (
    SELECT 0.4 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
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


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum quarterly revenue (TPC-H Q15 shape):
    a CTE computes per-supplier revenue once, and an uncorrelated scalar
    MAX over the SAME CTE selects the top row(s) — Catalyst evaluates the
    CTE's aggregate, broadcasts the one-row MAX into the filter, and never
    re-scans lineitem for the threshold. The equality compares two doubles
    produced by the IDENTICAL decimal-accumulator expression in both
    engines (helpers.py discipline), so the cut is bit-exact; ties emit
    one row per tying supplier, deterministic as a set."""
    _register(spark, sf_dir, ["lineitem", "supplier"])
    return spark.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
          FROM _subq_lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM _subq_supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """)


TOP_SUPPLIER_REVENUE_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) excluding a
    supplier denylist (TPC-H Q16 shape, adapted: TESTDATA has no partsupp,
    so observed (part, supplier) pairs come from lineitem; no s_comment,
    so the denylist is low-balance suppliers — s_acctbal < 2000 excludes
    3/10, 30/100, 265/1000 at the three SFs, non-vacuous everywhere).
    The NOT IN lowers to a null-aware anti-join (s_suppkey is non-null, so
    it degenerates to the plain anti-join — the scale-safe plan); the
    COUNT(DISTINCT) runs as the standard two-shuffle expand."""
    _register(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM _subq_lineitem JOIN _subq_part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 9, 13, 17, 21)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM _subq_supplier WHERE s_acctbal < 2000
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """)


SUPPLIER_PART_VARIETY_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers behind the largest orders by total quantity (TPC-H Q18
    shape): an IN over a GROUP BY … HAVING subquery — Catalyst lowers it
    to a semi-join against the pre-aggregated order totals, so lineitem
    aggregates ONCE for the threshold and once for the output sum, never
    per outer row. Threshold 250 sits near the p99 of per-order quantity
    (25/204/2285 qualifying orders at the three SFs — selective but never
    empty). SUM(l_quantity) is a sum of small integral doubles — exact in
    any order, no decimal detour needed."""
    _register(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               SUM(l_quantity) AS total_qty
        FROM _subq_customer
        JOIN _subq_orders   ON c_custkey = o_custkey
        JOIN _subq_lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM _subq_lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """)


LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def promo_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved significant volume of a part family in a year
    (TPC-H Q20 shape, adapted: no partsupp, so "availability" is shipped
    quantity from lineitem): a NESTED IN chain — suppliers IN (heavy
    shippers of parts IN (the red family)) — that must lower to two
    stacked semi-joins with the part-family filter pushed inside the
    innermost subquery, never a per-supplier re-scan. Threshold 300 on
    the year's summed quantity keeps 4/44/412 suppliers at the three SFs
    (and drops some at each) — both branches always fire."""
    _register(spark, sf_dir, ["supplier", "lineitem", "part"])
    return spark.sql("""
        SELECT s_suppkey, s_name, s_acctbal
        FROM _subq_supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM _subq_lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM _subq_part WHERE p_name LIKE 'red%'
            )
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey HAVING SUM(l_quantity) > 300
        )
        ORDER BY s_suppkey
    """)


PROMO_STOCK_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey HAVING SUM(l_quantity) > 300
)
ORDER BY s_suppkey
"""


def lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated-subquery join (SQL:1999 / Spark 4): for every
    nation, its top-2 customers by account balance — the subquery in the
    FROM clause references the outer row, and carries ORDER BY + LIMIT.

    Scale shape: Catalyst decorrelates the per-row LIMIT into a single
    rank-filter over customer partitioned by nation (one shuffle on
    c_nationkey, map-side pre-ranking under AQE) joined back to the dim —
    NEVER a nested re-scan of customer per nation. The tie-break on
    c_custkey makes the top-2 deterministic, so the oracle (DuckDB's own
    LATERAL) hash-matches exactly."""
    _register(spark, sf_dir, ["nation", "customer"])
    return spark.sql("""
        SELECT n.n_name, t.c_custkey, t.c_name, t.bal
        FROM _subq_nation n,
        LATERAL (
          SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
          FROM _subq_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
    """)


LATERAL_TOPK_PER_GROUP_SQL = """
SELECT n.n_name, t.c_custkey, t.c_name, t.bal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


def recursive_inventory_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4.1 WITH RECURSIVE): a double-clamped
    inventory balance walked quarter by quarter — each step refills on a
    seasonal 0x/1x/2x-of-average-demand schedule (quarter index mod 3),
    subtracts that quarter's actual demand, and clamps into [0, cap]. The LOWER clamp alone would
    still be window-expressible (the Lindley/reflection identity turns a
    max(0, ·) recursion into running-min prefix sums); the UPPER clamp at
    ``cap`` breaks that closed form, so this is a genuinely sequential
    recurrence — exactly the workload WITH RECURSIVE exists for.

    Exactness: all arithmetic is integer cents (the o_totalprice →
    DECIMAL(30,2) → ×100 → BIGINT ladder is exact; ``DIV`` is integer
    division, ``//`` on the DuckDB side), so the two engines agree
    bit-for-bit at every step of the recursion. Constants are
    data-derived (cap = start = demand avg ×3/4; the seasonal refill
    swings ±avg against a 0.75-avg band) so BOTH clamps bind at every SF
    — a never-firing bound would make the LEAST/GREATEST vacuous;
    pinned by tests/test_vacuity_guards.py
    (test_recursive_chain_both_clamps_bind).

    Scale shape: the recursion runs over the AGGREGATED quarterly series
    (~28 rows after one groupBy shuffle of orders) — per-step state is
    one row, the joined side is a broadcast of the tiny seq frame; the
    data-sized work is a single scan. Depth ≈ #quarters stays far under
    spark.sql.cteRecursionLevelLimit (100).

    r14 optimization (guide §2.4/§5): UnionLoop inlines non-recursive CTEs
    into every iteration, so ``seq``/``consts`` spelled as CTEs
    re-aggregated orders once per recursion step (~2×28 scans with the
    scalar subqueries). Both are materialized ONCE (localCheckpoint, ~28
    rows + 1 row) and the recursion runs over the materialized views —
    identical arithmetic (consts is the same SUM/COUNT over the same
    demand rows), one data-sized scan total.

    r14 optimization, second pass (guide §1.2): even over the
    materialized 1-row consts view, the recursion BODY's two scalar
    subqueries re-executed as separate subquery jobs on EVERY UnionLoop
    step (~2×28 tiny jobs — measured ~35% of the query's wall). The
    constants now ride the recursion state instead: the anchor selects
    ``refill_c``/``cap_c`` from the consts view into two extra columns
    of ``bal``, each step references ``b.refill_c``/``b.cap_c`` and
    passes them through, and the outer projection drops them. Zero
    subqueries and zero extra joins per step, same BIGINT values in the
    same expressions ⇒ identical output (row/schema-equality and the
    UnionLoop + no-BNLJ plan pin re-verified; 6.4 → 4.2 s warm median
    at sf0.01)."""
    _register(spark, sf_dir, ["orders"])
    spark.sql("""
        WITH demand AS (
          SELECT CONCAT(CAST(YEAR(o_orderdate) AS STRING), '-Q',
                        CAST(QUARTER(o_orderdate) AS STRING)) AS qtr,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                               AS BIGINT)) AS BIGINT) AS demand_c
          FROM _subq_orders GROUP BY 1
        )
        SELECT qtr, demand_c, ROW_NUMBER() OVER (ORDER BY qtr) AS i
        FROM demand
    """).localCheckpoint(eager=True).createOrReplaceTempView("_subq_inv_seq")
    spark.sql("""
        SELECT SUM(demand_c) DIV COUNT(*) AS refill_c,
               (SUM(demand_c) * 3) DIV (COUNT(*) * 4) AS cap_c
        FROM _subq_inv_seq
    """).localCheckpoint(eager=True).createOrReplaceTempView("_subq_inv_consts")
    return spark.sql("""
        WITH RECURSIVE bal (i, qtr, balance_c, refill_c, cap_c) AS (
          SELECT 0, CAST('start' AS STRING), cap_c, refill_c, cap_c
          FROM _subq_inv_consts
          UNION ALL
          SELECT s.i, s.qtr,
                 LEAST(GREATEST(b.balance_c + b.refill_c * (s.i % 3)
                                - s.demand_c, 0),
                       b.cap_c),
                 b.refill_c, b.cap_c
          FROM bal b JOIN _subq_inv_seq s ON s.i = b.i + 1
        )
        SELECT qtr, balance_c FROM bal WHERE i > 0
    """)


RECURSIVE_INVENTORY_CHAIN_SQL = """
WITH RECURSIVE demand AS (
  SELECT CONCAT(CAST(YEAR(o_orderdate) AS VARCHAR), '-Q',
                CAST(QUARTER(o_orderdate) AS VARCHAR)) AS qtr,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                       AS BIGINT)) AS BIGINT) AS demand_c
  FROM orders GROUP BY 1
),
consts AS (
  -- DuckDB's SUM(BIGINT) widens to HUGEINT; pin both constants (and with
  -- them the whole recursion) back to BIGINT so the output dtype matches
  SELECT CAST(SUM(demand_c) // COUNT(*) AS BIGINT) AS refill_c,
         CAST((SUM(demand_c) * 3) // (COUNT(*) * 4) AS BIGINT) AS cap_c
  FROM demand
),
seq AS (
  SELECT qtr, demand_c, ROW_NUMBER() OVER (ORDER BY qtr) AS i
  FROM demand
),
bal (i, qtr, balance_c) AS (
  SELECT 0, CAST('start' AS VARCHAR),
         (SELECT cap_c FROM consts)
  UNION ALL
  SELECT s.i, s.qtr,
         LEAST(GREATEST(b.balance_c
                        + (SELECT refill_c FROM consts) * (s.i % 3)
                        - s.demand_c, 0),
               (SELECT cap_c FROM consts))
  FROM bal b JOIN seq s ON s.i = b.i + 1
)
SELECT qtr, balance_c FROM bal WHERE i > 0
"""


QUERIES = {
    "small_quantity_revenue": small_quantity_revenue,
    "suppliers_with_waiting_orders": suppliers_with_waiting_orders,
    "concentrated_part_types": concentrated_part_types,
    "cheapest_supplier_per_part": cheapest_supplier_per_part,
    "idle_customer_balances": idle_customer_balances,
    "top_supplier_revenue": top_supplier_revenue,
    "supplier_part_variety": supplier_part_variety,
    "large_volume_customers": large_volume_customers,
    "promo_stock_suppliers": promo_stock_suppliers,
    "lateral_topk_per_group": lateral_topk_per_group,
    "recursive_inventory_chain": recursive_inventory_chain,
}

ORACLES = {
    "lateral_topk_per_group": LATERAL_TOPK_PER_GROUP_SQL,
    "recursive_inventory_chain": RECURSIVE_INVENTORY_CHAIN_SQL,
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "suppliers_with_waiting_orders": SUPPLIERS_WITH_WAITING_ORDERS_SQL,
    "concentrated_part_types": CONCENTRATED_PART_TYPES_SQL,
    "cheapest_supplier_per_part": CHEAPEST_SUPPLIER_PER_PART_SQL,
    "idle_customer_balances": IDLE_CUSTOMER_BALANCES_SQL,
    "top_supplier_revenue": TOP_SUPPLIER_REVENUE_SQL,
    "supplier_part_variety": SUPPLIER_PART_VARIETY_SQL,
    "large_volume_customers": LARGE_VOLUME_CUSTOMERS_SQL,
    "promo_stock_suppliers": PROMO_STOCK_SUPPLIERS_SQL,
}
