"""Skew-mitigation operators (SURVEY §2B scale posture: "skewed keys →
salting or AQE skew-join").

AQE's skew-join split handles most cases automatically (enabled in
session.py); these operators are the *explicit* forms for when the skew is
in an aggregation (AQE does not split hot groupBy keys) or must be
controlled deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .helpers import sql_dsum

_N_SALTS = 16


def salted_twophase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically hot key space
    (l_returnflag: 3 values → 3 reducers own the whole table in a naive
    plan). Phase 1 aggregates (key, salt) — fan-out ×16 spreads each hot
    key over 16 reducers; phase 2 re-aggregates the 48 partials.

    The salt must be deterministic per ROW (not rand()) for replay-exact
    results: here it derives from xxhash64 of the line identity. Decimal
    accumulators make the two-phase sum bit-equal to any other grouping
    order, which is WHY the oracle can be the plain one-phase GROUP BY.
    """
    li = load_table(spark, "lineitem", sf_dir)
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_N_SALTS)).alias("salt")
    partial = (
        li.select("l_returnflag", salt,
                  F.col("l_quantity").cast("decimal(38,6)").alias("qty"))
        .groupBy("l_returnflag", "salt")
        .agg(F.sum("qty").alias("pq"), F.count(F.lit(1)).alias("pn"))
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pq").cast("double").alias("sum_qty"),
            F.sum("pn").alias("n_rows"),
        )
    )


SALTED_TWOPHASE_AGG_SQL = f"""
SELECT l_returnflag,
       {sql_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join: fact side salts each row into one of N
    buckets; the (tiny, hot-keyed) build side replicates ×N, so one hot
    join key spreads over N reducers instead of one. Oracle = the plain
    join, because salting only changes physical placement.

    (With a build side this small a broadcast would win — the operator
    exists for the general case where the build side is too big to
    broadcast but its keys are hot.)
    """
    li = load_table(spark, "lineitem", sf_dir)
    flags = (
        li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("flag_rows"))
    )
    salts = spark.range(_N_SALTS).select(F.col("id").cast("int").alias("salt"))
    build = flags.crossJoin(salts)  # replicate build side ×N
    probe = li.select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_N_SALTS))
        .cast("int").alias("salt"),
    )
    return (
        probe.join(build, ["l_returnflag", "salt"])
        .select("l_orderkey", "l_linenumber", "l_returnflag", "flag_rows")
    )


SALTED_SKEW_JOIN_SQL = """
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, f.flag_rows
FROM lineitem l
JOIN (
  SELECT l_returnflag, COUNT(*) AS flag_rows FROM lineitem GROUP BY l_returnflag
) f USING (l_returnflag)
"""


QUERIES = {
    "salted_twophase_agg": salted_twophase_agg,
    "salted_skew_join": salted_skew_join,
}

ORACLES = {
    "salted_twophase_agg": SALTED_TWOPHASE_AGG_SQL,
    "salted_skew_join": SALTED_SKEW_JOIN_SQL,
}
