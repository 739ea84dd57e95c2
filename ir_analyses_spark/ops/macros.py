"""Macro queries: TPC-H-shaped multi-operator compositions over the
synthetic star schema — the "whole query" tier above the per-operator
inventory (SURVEY §2B), exercising join ordering, semi-join rewrites, and
aggregate pushdown the way real analytics do.

Shapes (adapted to the columns TESTDATA actually has). Together with
subqueries.py and pricing_summary/join_multiway_topk, every one of the 22
TPC-H query shapes has an adapted, oracle-gated twin in the registry:
- regional_revenue  — Q5 shape: 6-table join chain with a region filter and
  per-nation revenue rollup; the classic "does the optimizer broadcast the
  dims and defer the fact shuffle" test.
- order_priority_counts — Q4 shape: EXISTS → left-semi join rewrite.
- top_unshipped_parts — Q12/Q3 hybrid: anti-join + conditional agg + top-k.
- shipping_priority_topk (Q3), returned_item_report (Q10),
  market_share (Q8), product_profit (Q9), promo_revenue_ratio (Q14),
  disjunctive_pushdown (Q19), forecast_revenue_change (Q6),
  volume_shipping (Q7), late_shipment_priority (Q12),
  customer_order_distribution (Q13).
- subqueries.py carries the correlated tier: Q2, Q11, Q15, Q16, Q17,
  Q18, Q20, Q21, Q22.
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


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One supplier-nation's share of a region's STANDARD-part revenue per
    order year (TPC-H Q8 shape): an 7-table snowflake with a conditional-
    numerator ratio. Scale posture: the two tiny dims (nation, region)
    broadcast; customer and part join the fact via hash shuffles Catalyst
    orders after the selective region/type filters have pruned both sides
    — at 100 TB part is NOT broadcastable, so the plan must not depend on
    it. The share division happens once per year group, double/double on
    two order-insensitive decimal sums."""
    t = {n: load_table(spark, n, sf_dir) for n in
         ["region", "nation", "customer", "supplier", "orders", "lineitem",
          "part"]}
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    supp_nation = t["supplier"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_region = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("cn_nationkey"), "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("cn_nationkey"),
        )
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol))
                / dsum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_NATION_VOL_CASE = (
    "CASE WHEN n2.n_name = 'NATION_3'"
    " THEN l_extendedprice * (1 - l_discount) END"
)

MARKET_SHARE_SQL = f"""
SELECT YEAR(o_orderdate) AS o_year,
       {sql_dsum(_NATION_VOL_CASE)}
         / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
GROUP BY YEAR(o_orderdate)
ORDER BY o_year
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation × order year over one part family (TPC-H
    Q9 shape, adapted: TESTDATA has no partsupp, so supply cost is the
    part's retail price — profit = discounted revenue − retailprice·qty).
    The p_name LIKE filter prunes part BEFORE its fact join; nation
    broadcasts; the profit expression folds into one codegen projection so
    only (nationkey, year, profit) reaches the final rollup shuffle."""
    t = {n: load_table(spark, n, sf_dir) for n in
         ["nation", "supplier", "orders", "lineitem", "part"]}
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            t["part"]
            .filter(F.col("p_name").like("%widget%"))
            .select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"].select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)'
                 ' - p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one quarter's revenue from PROMO parts (TPC-H Q14
    shape): a conditional-sum / total-sum ratio in a single aggregate over
    one fact pass — the date filter is pushed to the lineitem scan, part
    arrives via hash join, and no second scan or self-join computes the
    denominator."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", vol))
                / dsum(vol)
            ).alias("promo_revenue_pct")
        )
    )


_PROMO_VOL_CASE = (
    "CASE WHEN p_type = 'PROMO'"
    " THEN l_extendedprice * (1 - l_discount) END"
)

PROMO_REVENUE_RATIO_SQL = f"""
SELECT 100.0 * {sql_dsum(_PROMO_VOL_CASE)}
         / {sql_dsum('l_extendedprice * (1 - l_discount)')}
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


def disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR-of-ANDs band predicate (TPC-H Q19 shape): three
    disjoint (brand, size, quantity) bands OR'd together. The shape test:
    Catalyst must extract the common-column conjuncts — p_size ≤ 15 and
    the quantity envelope hold in every branch — push them into BOTH scans
    ahead of the join (CNF conversion / join-predicate pushdown), and keep
    the residual disjunction a single codegen filter, never a 3-way union
    of scans."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(dsum(vol).alias("revenue"))
    )


DISJUNCTIVE_PUSHDOWN_SQL = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue delta from dropping a discount band (TPC-H Q6 shape): a
    pure scan-aggregate with three range predicates — the baseline "do the
    filters reach the parquet scan" query. All three predicates are
    scan-pushable (`PushedFilters` shows the shipdate window, discount
    band, and quantity cap), so at 100 TB this reads only row groups whose
    min/max stats overlap the band and never shuffles more than one
    partial-agg row per task.

    Discount domain is 11 distinct steps 0.00–0.10; the 0.04–0.06 band +
    qty<24 + year-1997 keeps 138/1162/12018 rows at sf0.001/0.01/0.1 —
    non-vacuous keep AND drop at every SF."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"))
    )


FORECAST_REVENUE_CHANGE_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations by ship year, both directions
    (TPC-H Q7 shape): the supplier side and the customer side each resolve
    a nation name via a BROADCAST dim join, and the two-direction pair
    predicate — (A→B) OR (B→A) — is a residual filter on the joined frame
    (an OR across two tables can't push into either scan; what CAN push is
    each nation dim's pre-filter to the two candidate names, which prunes
    both broadcast sides to 2 rows before the fact ever joins)."""
    t = {n: load_table(spark, n, sf_dir) for n in
         ["nation", "customer", "supplier", "orders", "lineitem"]}
    two = ["NATION_1", "NATION_2"]
    supp_n = t["supplier"].join(
        F.broadcast(
            t["nation"].filter(F.col("n_name").isin(two)).select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust_n = t["customer"].join(
        F.broadcast(
            t["nation"].filter(F.col("n_name").isin(two)).select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == two[0]) & (F.col("cust_nation") == two[1]))
            | ((F.col("supp_nation") == two[1]) & (F.col("cust_nation") == two[0]))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(vol).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-vs-other line counts by shipping-latency bucket (TPC-H Q12
    shape, adapted: TESTDATA has no l_shipmode/l_receiptdate, so the
    grouping key is a FAST/SLOW bucket on datediff(shipdate, orderdate)
    at a 60-day cut — measured delay spans −1300…+1400 days with median
    ≈50, so both buckets are populated at every SF). The CASE-counting
    pair (high-priority vs low-priority lines per bucket) is the Q12
    core: conditional aggregation after an orders⋈lineitem join, one
    fact shuffle, integer counts — hash-exact cross-engine."""
    t = {n: load_table(spark, n, sf_dir) for n in ["orders", "lineitem"]}
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= 60, "SLOW"
    ).otherwise("FAST")
    return (
        t["lineitem"].select("l_orderkey", "l_shipdate")
        .join(t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("latency_bucket"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("latency_bucket")
    )


LATE_SHIPMENT_PRIORITY_SQL = """
SELECT CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) >= 60
            THEN 'SLOW' ELSE 'FAST' END AS latency_bucket,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY latency_bucket
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count (TPC-H Q13 shape): a LEFT
    OUTER join with the filter IN THE JOIN CONDITION (orders placed in
    2001 — every synthetic customer has orders overall, so a WHERE-side
    filter would silently turn the outer join inner; measured, ~41% of
    customers have NO 2001 order, so the c_count=0 bucket is real at
    every SF), then a second aggregation over the first — the classic
    two-level rollup where the outer-join null branch must survive into
    the histogram."""
    t = {n: load_table(spark, n, sf_dir) for n in ["customer", "orders"]}
    return (
        t["customer"].select("c_custkey")
        .join(
            t["orders"]
            .filter(F.year("o_orderdate") == 2001)
            .select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND YEAR(o_orderdate) = 2001
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


QUERIES = {
    "regional_revenue": regional_revenue,
    "order_priority_counts": order_priority_counts,
    "top_unshipped_parts": top_unshipped_parts,
    "shipping_priority_topk": shipping_priority_topk,
    "returned_item_report": returned_item_report,
    "market_share": market_share,
    "product_profit": product_profit,
    "promo_revenue_ratio": promo_revenue_ratio,
    "disjunctive_pushdown": disjunctive_pushdown,
    "forecast_revenue_change": forecast_revenue_change,
    "volume_shipping": volume_shipping,
    "late_shipment_priority": late_shipment_priority,
    "customer_order_distribution": customer_order_distribution,
}

ORACLES = {
    "regional_revenue": REGIONAL_REVENUE_SQL,
    "order_priority_counts": ORDER_PRIORITY_COUNTS_SQL,
    "top_unshipped_parts": TOP_UNSHIPPED_PARTS_SQL,
    "shipping_priority_topk": SHIPPING_PRIORITY_TOPK_SQL,
    "returned_item_report": RETURNED_ITEM_REPORT_SQL,
    "market_share": MARKET_SHARE_SQL,
    "product_profit": PRODUCT_PROFIT_SQL,
    "promo_revenue_ratio": PROMO_REVENUE_RATIO_SQL,
    "disjunctive_pushdown": DISJUNCTIVE_PUSHDOWN_SQL,
    "forecast_revenue_change": FORECAST_REVENUE_CHANGE_SQL,
    "volume_shipping": VOLUME_SHIPPING_SQL,
    "late_shipment_priority": LATE_SHIPMENT_PRIORITY_SQL,
    "customer_order_distribution": CUSTOMER_ORDER_DISTRIBUTION_SQL,
}
