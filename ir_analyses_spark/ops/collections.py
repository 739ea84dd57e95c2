"""Array / map / explode operators (SURVEY §2B "Scalar: array/map/json").

JSON path extraction lives in relational.json_extract_ops; this module
covers the collection constructors and higher-order consumers: collect →
sort → element access / fold, map building and lookup, and explode
(the row-generating side).

Oracle discipline: arrays never cross the comparison boundary — every
output is a scalar *derived* from the array (size, element_at, fold), so
the DuckDB twin can compute the same scalars relationally and the hash
compare never sees engine-specific collection rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table


def array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line-number array: collect_list → array_sort (collect
    order is partition-dependent, the sort restores determinism) → size /
    element_at / contains / aggregate-fold."""
    li = load_table(spark, "lineitem", sf_dir)
    arr = F.array_sort(F.collect_list("l_linenumber"))
    return (
        li.groupBy("l_orderkey")
        .agg(arr.alias("arr"))
        .select(
            "l_orderkey",
            F.size("arr").alias("n_lines"),
            F.element_at("arr", 1).alias("first_line"),
            F.element_at("arr", -1).alias("last_line"),
            F.array_contains("arr", F.lit(3)).alias("has_line3"),
            F.aggregate(
                "arr", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("line_sum"),
        )
    )


ARRAY_AGG_OPS_SQL = """
SELECT l_orderkey,
       CAST(COUNT(*) AS INT) AS n_lines,
       MIN(l_linenumber) AS first_line,
       MAX(l_linenumber) AS last_line,
       BOOL_OR(l_linenumber = 3) AS has_line3,
       CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_sum
FROM lineitem GROUP BY l_orderkey
"""


def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local map build + lookup: map_from_arrays / element_at /
    map_keys — the engine's typed alternative to stringly JSON props."""
    li = load_table(spark, "lineitem", sf_dir)
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array("l_quantity", "l_extendedprice"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        m["qty"].alias("qty"),
        m["price"].alias("price"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


MAP_OPS_SQL = """
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty, l_extendedprice AS price, 2 AS n_keys
FROM lineitem
"""


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency top-20 via explode(split(text)) — the canonical
    row-generator + re-aggregate shape (word count). Ties broken by token
    for a deterministic limit."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


EXPLODE_TOKENS_SQL = """
SELECT tok, COUNT(*) AS n
FROM (
  SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
) WHERE tok != ''
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""


QUERIES = {
    "array_agg_ops": array_agg_ops,
    "map_ops": map_ops,
    "explode_tokens": explode_tokens,
}

ORACLES = {
    "array_agg_ops": ARRAY_AGG_OPS_SQL,
    "map_ops": MAP_OPS_SQL,
    "explode_tokens": EXPLODE_TOKENS_SQL,
}
