"""Join operators: broadcast/shuffle equi-joins, outer family, semi/anti,
cross/theta, range, and as-of (SURVEY §2A J1–J5, §2B Joins).

Scale posture baked into each shape:
- dimensions (region/nation/supplier/part at TPC-H ratios) are broadcast —
  the fact side never shuffles for a dim join (§2A J1);
- fact⋈fact joins shuffle on their equi-key and rely on AQE for skew splits;
- the as-of join uses the union+window trick: one shuffle of both inputs by
  key, zero row explosion — the composition-of-built-ins path SURVEY §2B
  prescribes before reaching for applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table
from .helpers import dsum, local_df, sql_dsum


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dims: revenue by brand and supplier nation (J1).

    The reference's fact⋈items join (reference
    utils/repositories/financial_data_repository.py:21-35) at TPC-H shape:
    lineitem joins part and supplier→nation without shuffling the fact side.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


JOIN_BROADCAST_DIMS_SQL = f"""
SELECT p_brand, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
"""


def join_multiway_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + top-k with a total order.

    customer ⋈ orders ⋈ lineitem: shipped revenue of BUILDING-segment
    orders placed before 1997, top 10 by revenue (orderkey tiebreak so the
    limit is deterministic — SURVEY §7.3.4). TakeOrderedAndProject: the
    top-k never materializes a global sort at scale.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


JOIN_MULTIWAY_TOPK_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer + null-aware aggregates: per-customer order stats, keeping
    order-less customers with zeroed measures (§2B outer family)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


JOIN_LEFT_OUTER_SQL = f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       COALESCE({sql_dsum('o_totalprice')}, 0.0) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two keyed aggregates (§2B outer family)."""
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    c = cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    s = supp.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
ON c.k = s.k
"""


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi (EXISTS) and left anti (NOT EXISTS) in one result: customers
    flagged by whether they have any open order (§2A A6 existence-check as a
    set operation; §2B semi/anti)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    with_open = cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
    without_open = cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti"
    )
    return with_open.select(
        "c_custkey", F.lit(True).alias("has_open_order")
    ).unionByName(without_open.select("c_custkey", F.lit(False).alias("has_open_order")))


JOIN_SEMI_ANTI_SQL = """
SELECT c_custkey, TRUE AS has_open_order FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, FALSE AS has_open_order FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def join_theta_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi theta join against a literal band table (§2B cross/theta).

    Price-band classification: part ⋈ bands ON lo <= price < hi. No equi-key
    → BroadcastNestedLoopJoin; correct strategy because the band side is
    O(1) rows. Never do this with two large sides — bucketize first.
    """
    part = load_table(spark, "part", sf_dir)
    bands = local_df(
        spark,
        [("budget", 0.0, 1200.0), ("mid", 1200.0, 1600.0), ("premium", 1600.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("sum_price"),
        )
    )


JOIN_THETA_BANDS_SQL = f"""
SELECT band, COUNT(*) AS n_parts, {sql_dsum('p_retailprice')} AS sum_price
FROM part
JOIN (VALUES ('budget', 0.0, 1200.0), ('mid', 1200.0, 1600.0),
             ('premium', 1600.0, 1e12)) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def join_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join with an equi-key: orders ⋈ lineitem shipped within
    90 days of the order date (§2B range join).

    The equi-key (orderkey) carries the shuffle; the range predicate is a
    post-join filter, so this stays a sort-merge join — the pattern that
    scales. A keyless range join would need bucketized prefiltering.
    """
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped_90d"),
            dsum("l_quantity").alias("qty_90d"),
        )
    )


JOIN_RANGE_WINDOW_SQL = f"""
SELECT o_orderkey, COUNT(*) AS n_shipped_90d, {sql_dsum('l_quantity')} AS qty_90d
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderkey
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at or
    before the event timestamp (§2B as-of join).

    Implemented as union + last_value-ignore-nulls window — one shuffle by
    user, linear state, no M×N candidate explosion. Tie rules (total order,
    SURVEY §7.3.4): at equal timestamps the order is visible to the event
    (<= semantics, orders sort before events); among equal order dates the
    greatest o_orderkey wins.
    """
    events = load_table(spark, "events", sf_dir)
    orders = load_table(spark, "orders", sf_dir)

    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),  # orders first at equal t → <= match
        F.col("o_orderkey"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct("o_orderkey", "o_orderdate").alias("ord"),
    )
    e = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
        "ts",
        F.lit(None).cast("struct<o_orderkey:bigint,o_orderdate:timestamp>").alias("ord"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "side", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.unionByName(e)
        .withColumn("asof", F.last("ord", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof.o_orderkey").alias("asof_orderkey"),
            F.col("asof.o_orderdate").alias("asof_orderdate"),
        )
    )


JOIN_ASOF_SQL = """
SELECT event_id, user_id, ts, asof_orderkey, asof_orderdate
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
WHERE rn = 1
"""


QUERIES = {
    "join_broadcast_dims": join_broadcast_dims,
    "join_multiway_topk": join_multiway_topk,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi_anti": join_semi_anti,
    "join_theta_bands": join_theta_bands,
    "join_range_window": join_range_window,
    "join_asof": join_asof,
}

ORACLES = {
    "join_broadcast_dims": JOIN_BROADCAST_DIMS_SQL,
    "join_multiway_topk": JOIN_MULTIWAY_TOPK_SQL,
    "join_left_outer": JOIN_LEFT_OUTER_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "join_semi_anti": JOIN_SEMI_ANTI_SQL,
    "join_theta_bands": JOIN_THETA_BANDS_SQL,
    "join_range_window": JOIN_RANGE_WINDOW_SQL,
    "join_asof": JOIN_ASOF_SQL,
}
