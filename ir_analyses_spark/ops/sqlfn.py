"""SQL-defined functions and pipe syntax (Spark 4.1 SQL surface).

SQL UDFs (``CREATE FUNCTION … RETURN <expr>``) are the engine's free
abstraction layer: unlike Python UDFs they INLINE into the Catalyst plan
(the physical plan shows plain column arithmetic — no eval operator, no
serialization boundary), so a library of business formulas costs nothing
at 100 TB. Pipe syntax (``FROM … |> WHERE … |> AGGREGATE``) is the same
logical plan written operator-first; both entries pin that the sugar
lowers to the identical scan→filter→partial/final-aggregate physics the
DataFrame queries use.

Functions and views register with a ``_sqlfn_`` prefix: the driver hands
these queries an arbitrary SparkSession, and bare names would clobber the
caller's own temp objects (same convention as ``_subq_*``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.sources import load_table


def sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDF + SQL table function, composed: a TVF slices the
    small-quantity lineitems, a scalar UDF computes the discounted price,
    and the aggregate folds it through the decimal accumulator. The
    per-row double multiply is IEEE-deterministic; only the SUM needs the
    decimal cast (engine partial-agg order would otherwise reorder float
    adds). Oracle inlines both function bodies — if Spark's inlining
    changed the semantics (e.g. re-typed the expression), the hash
    breaks."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView(
        "_sqlfn_lineitem"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION _sqlfn_disc_price(
          p DOUBLE, d DOUBLE) RETURNS DOUBLE
        RETURN p * (1 - d)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION _sqlfn_small_items()
        RETURNS TABLE (
          l_returnflag STRING, l_extendedprice DOUBLE, l_discount DOUBLE)
        RETURN SELECT l_returnflag, l_extendedprice, l_discount
               FROM _sqlfn_lineitem WHERE l_quantity < 25
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(_sqlfn_disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM _sqlfn_small_items()
        GROUP BY l_returnflag
        """
    )


SQL_UDF_PRICING_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem WHERE l_quantity < 25
GROUP BY l_returnflag
"""


def pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-syntax query (operator-first SQL): scan |> filter |> derive a
    column |> aggregate |> order. Must plan to the same pushed-filter +
    partial/final hash aggregate as the nested-SQL twin — pipes are pure
    syntax, and the plan pin in tests/test_plans.py holds them to it."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_sqlfn_orders")
    return spark.sql(
        """
        FROM _sqlfn_orders
        |> WHERE o_orderstatus <> 'F'
        |> EXTEND substr(o_orderpriority, 1, 1) AS prio
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                          AS DOUBLE) AS total
           GROUP BY prio
        |> ORDER BY prio
        """
    )


PIPE_SYNTAX_ROLLUP_SQL = """
SELECT substr(o_orderpriority, 1, 1) AS prio,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY prio
ORDER BY prio
"""


QUERIES = {
    "sql_udf_pricing": sql_udf_pricing,
    "pipe_syntax_rollup": pipe_syntax_rollup,
}

ORACLES = {
    "sql_udf_pricing": SQL_UDF_PRICING_SQL,
    "pipe_syntax_rollup": PIPE_SYNTAX_ROLLUP_SQL,
}
