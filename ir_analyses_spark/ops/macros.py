"""Macro queries: TPC-H-shaped multi-operator compositions over the
synthetic star schema — the "whole query" tier above the per-operator
inventory (SURVEY §2B), exercising join ordering, semi-join rewrites, and
aggregate pushdown the way real analytics do.

Shapes (adapted to the columns TESTDATA actually has):
- regional_revenue  — Q5 shape: 6-table join chain with a region filter and
  per-nation revenue rollup; the classic "does the optimizer broadcast the
  dims and defer the fact shuffle" test.
- order_priority_counts — Q4 shape: EXISTS → left-semi join rewrite.
- top_unshipped_parts — Q12/Q3 hybrid: anti-join + conditional agg + top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .helpers import dsum, sql_dsum


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation within one region (TPC-H Q5 shape): lineitem ⋈
    orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, customer and supplier
    constrained to the same nation — dims broadcast, the fact table
    shuffles once for the final rollup."""
    t = {n: load_table(spark, n, sf_dir) for n in
         ["region", "nation", "customer", "supplier", "orders", "lineitem"]}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


REGIONAL_REVENUE_SQL = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority having at least one late-shipped line (TPC-H Q4
    shape): the EXISTS subquery as a left-semi join — no fact-side
    duplication, one shuffle per side."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    late = li.filter(F.month("l_shipdate") >= 6).select("l_orderkey")
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORDER_PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND MONTH(l_shipdate) >= 6
)
GROUP BY o_orderpriority
"""


def top_unshipped_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never shipped by any top-decile-balance supplier (anti-join)
    with conditional aggregation and a deterministic top-10."""
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    rich = supplier.filter(F.col("s_acctbal") > 9000).select("s_suppkey")
    shipped_by_rich = (
        li.join(F.broadcast(rich), li["l_suppkey"] == rich["s_suppkey"], "left_semi")
        .select("l_partkey")
        .distinct()
    )
    return (
        part.join(
            shipped_by_rich,
            part["p_partkey"] == shipped_by_rich["l_partkey"],
            "left_anti",
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count(F.when(F.col("p_size") >= 25, 1)).alias("n_large"),
        )
        .orderBy(F.col("n_parts").desc(), "p_brand")
        .limit(10)
    )


TOP_UNSHIPPED_PARTS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       COUNT(CASE WHEN p_size >= 25 THEN 1 END) AS n_large
FROM part
WHERE p_partkey NOT IN (
  SELECT DISTINCT l_partkey FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_acctbal > 9000
)
GROUP BY p_brand
ORDER BY n_parts DESC, p_brand
LIMIT 10
"""


def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-revenue urgent orders still unshipped at a cutoff (TPC-H Q3
    shape): two selective date/segment filters pushed to the scans, two
    broadcast-eligible build sides, one fact shuffle for the per-order
    rollup, then TakeOrderedAndProject for the top-10 — the canonical
    "filter early, aggregate once, never globally sort" pattern."""
    cust = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1997-06-15").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1997-06-15").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_TOPK_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15'
  AND l_shipdate > TIMESTAMP '1997-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top customers by revenue lost to returns in one quarter (TPC-H Q10
    shape): time-windowed fact filter, returnflag predicate, customer join
    AFTER the fact aggregation — aggregate first on the join key so only
    one group row per customer reaches the join, not every lineitem."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, "customer", sf_dir)
    lost = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("lost_revenue"))
    )
    return (
        lost.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "lost_revenue")
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


RETURNED_ITEM_REPORT_SQL = f"""
WITH lost AS (
  SELECT o_custkey,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS lost_revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, c_mktsegment, lost_revenue
FROM lost JOIN customer ON o_custkey = c_custkey
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


QUERIES = {
    "regional_revenue": regional_revenue,
    "order_priority_counts": order_priority_counts,
    "top_unshipped_parts": top_unshipped_parts,
    "shipping_priority_topk": shipping_priority_topk,
    "returned_item_report": returned_item_report,
}

ORACLES = {
    "regional_revenue": REGIONAL_REVENUE_SQL,
    "order_priority_counts": ORDER_PRIORITY_COUNTS_SQL,
    "top_unshipped_parts": TOP_UNSHIPPED_PARTS_SQL,
    "shipping_priority_topk": SHIPPING_PRIORITY_TOPK_SQL,
    "returned_item_report": RETURNED_ITEM_REPORT_SQL,
}
