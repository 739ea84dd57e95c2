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


def collated_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated strings (Spark 4 ``COLLATE UTF8_LCASE``): group and
    count-distinct under case-insensitive comparison semantics, on a
    deterministically case-mangled column (even part keys lowercase their
    type). The engine-level collation must agree exactly with the
    explicit ``lower()`` normalization the oracle uses — true for this
    ASCII domain; the GROUP key is re-canonicalized as ``lower(any_value(...))`` on
    output because the collation makes 'PROMO' and 'promo' EQUAL but
    leaves which spelling survives as the group label unspecified —
    ``lower()`` of ANY member of a CI class is one deterministic value,
    the one collation behavior a portable query must not depend on."""
    load_table(spark, "part", sf_dir).createOrReplaceTempView("_sqlfn_part")
    return spark.sql(
        """
        SELECT lower(any_value(mangled)) AS p_type_ci,
               COUNT(*) AS n_parts,
               COUNT(DISTINCT p_brand COLLATE UTF8_LCASE) AS n_brands_ci
        FROM (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
                      ELSE p_type END AS mangled,
                 CASE WHEN p_partkey % 3 = 0 THEN lower(p_brand)
                      ELSE p_brand END AS p_brand
          FROM _sqlfn_part
        )
        GROUP BY mangled COLLATE UTF8_LCASE
        """
    )


COLLATED_STRING_OPS_SQL = """
SELECT lower(mangled) AS p_type_ci,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT lower(p_brand)) AS n_brands_ci
FROM (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
              ELSE p_type END AS mangled,
         CASE WHEN p_partkey % 3 = 0 THEN lower(p_brand)
              ELSE p_brand END AS p_brand
  FROM part
)
GROUP BY lower(mangled)
"""


def pivot_sql_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``PIVOT`` clause (vs the DataFrame ``pivot_agg`` twin): brand ×
    part-type count matrix. The IN list is literal by construction — SQL
    PIVOT cannot discover columns at runtime — so the six type names are
    hard-coded and guarded non-vacuous by tests/test_vacuity_guards.py.
    The input is pre-projected to exactly (brand, type): PIVOT groups by
    every non-pivoted column, and a stray column silently explodes the
    row grain."""
    load_table(spark, "part", sf_dir).createOrReplaceTempView("_sqlfn_part")
    return spark.sql(
        """
        SELECT p_brand,
               COALESCE(promo, 0) AS promo, COALESCE(economy, 0) AS economy,
               COALESCE(medium, 0) AS medium, COALESCE(small, 0) AS small,
               COALESCE(large, 0) AS large, COALESCE(standard, 0) AS standard
        FROM (SELECT p_brand, p_type FROM _sqlfn_part)
        PIVOT (COUNT(*) FOR p_type IN (
          'PROMO' AS promo, 'ECONOMY' AS economy, 'MEDIUM' AS medium,
          'SMALL' AS small, 'LARGE' AS large, 'STANDARD' AS standard))
        """
    )


PIVOT_SQL_CLAUSE_SQL = """
SELECT p_brand,
       COUNT(*) FILTER (WHERE p_type = 'PROMO') AS promo,
       COUNT(*) FILTER (WHERE p_type = 'ECONOMY') AS economy,
       COUNT(*) FILTER (WHERE p_type = 'MEDIUM') AS medium,
       COUNT(*) FILTER (WHERE p_type = 'SMALL') AS small,
       COUNT(*) FILTER (WHERE p_type = 'LARGE') AS large,
       COUNT(*) FILTER (WHERE p_type = 'STANDARD') AS standard
FROM part
GROUP BY p_brand
"""


QUERIES = {
    "sql_udf_pricing": sql_udf_pricing,
    "pipe_syntax_rollup": pipe_syntax_rollup,
    "collated_string_ops": collated_string_ops,
    "pivot_sql_clause": pivot_sql_clause,
}

ORACLES = {
    "sql_udf_pricing": SQL_UDF_PRICING_SQL,
    "pipe_syntax_rollup": PIPE_SYNTAX_ROLLUP_SQL,
    "collated_string_ops": COLLATED_STRING_OPS_SQL,
    "pivot_sql_clause": PIVOT_SQL_CLAUSE_SQL,
}
