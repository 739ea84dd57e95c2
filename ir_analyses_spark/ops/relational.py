"""Relational scalar operators: projections, filters/predicates, conditional
and null semantics, string/date/math/regex/JSON function libraries, set ops,
and the reference's signature query shapes (candidate-priority coalesce,
guarded ratios) generalized onto the synthetic tables.

Maps SURVEY §2A P1–P4, F1–F12, C1–C16, J5/R3/R5 and §2B Scalar/Set-ops.
Everything is a native column expression — zero Python UDFs — so the whole
file stays inside whole-stage codegen and predicates reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table
from .helpers import dsum, sql_dsum


def filter_pushdown_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality/conjunctive filters + column-pruned projection (F1/F11/P2/P4).

    The shape of the reference's keyed lookups (reference
    utils/repositories/financial_data_repository.py:24-33): both predicates
    and the 4-column ReadSchema reach the parquet scan.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


FILTER_PUSHDOWN_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_returnflag = 'R' AND l_discount > 0.05
"""


def string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contains / startswith / rlike / IN-list predicate family
    (F3/F4/F5/F10, reference utils/data_mapper.py:174-176, utils/api.py:80-84)."""
    p = load_table(spark, "part", sf_dir)
    return p.filter(
        F.col("p_type").isin("ECONOMY", "PROMO", "STANDARD")
        | F.col("p_name").startswith("a")
    ).select(
        "p_partkey",
        "p_name",
        "p_type",
        F.col("p_name").contains("re").alias("has_re"),
        F.col("p_name").rlike("^[ab].*[0-9]$").alias("matches_pat"),
        F.col("p_brand").startswith("Brand#1").alias("brand1x"),
    )


STRING_PREDICATES_SQL = """
SELECT p_partkey, p_name, p_type,
       CONTAINS(p_name, 're') AS has_re,
       REGEXP_MATCHES(p_name, '^[ab].*[0-9]$') AS matches_pat,
       STARTS_WITH(p_brand, 'Brand#1') AS brand1x
FROM part
WHERE p_type IN ('ECONOMY', 'PROMO', 'STANDARD') OR STARTS_WITH(p_name, 'a')
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library (C1/C15/C16, §2B string lib): substring, trim/pad,
    split, translate, case mapping, concat, replace, length, levenshtein."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name8"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.split("c_name", "#").getItem(0).alias("name_prefix"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("dist_building"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


STRING_FUNCTIONS_SQL = """
SELECT c_custkey,
       SUBSTRING(c_name, 1, 8) AS name8,
       UPPER(c_mktsegment) AS seg_upper,
       LOWER(c_name) AS name_lower,
       LENGTH(c_name) AS name_len,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       CONCAT_WS('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
       REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_masked,
       TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
       STRING_SPLIT(c_name, '#')[1] AS name_prefix,
       LEVENSHTEIN(c_mktsegment, 'BUILDING') AS dist_building,
       TRIM('  pad  ') AS trimmed
FROM customer
"""


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive casts and null algebra (C2/C3/F6/F7, reference
    utils/data_mapper.py:40-49): try_cast→NULL on failure (the engine twin of
    ``pd.to_numeric(errors="coerce")``), nullif, coalesce, is-null flags."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.expr("try_cast(event_type AS DOUBLE)").alias("type_as_num"),  # all NULL
        F.expr("try_cast(value AS DECIMAL(20,0))").cast("double").alias("value_int"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_no_error"),
        F.coalesce(
            F.nullif("event_type", F.lit("error")), F.lit("(redacted)")
        ).alias("type_coalesced"),
        F.col("value").isNotNull().alias("is_numeric"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("value_ok"),
    )


NULL_SEMANTICS_SQL = """
SELECT event_id,
       TRY_CAST(event_type AS DOUBLE) AS type_as_num,
       CAST(TRY_CAST(value AS DECIMAL(20,0)) AS DOUBLE) AS value_int,
       NULLIF(event_type, 'error') AS type_no_error,
       COALESCE(NULLIF(event_type, 'error'), '(redacted)') AS type_coalesced,
       value IS NOT NULL AS is_numeric,
       CASE WHEN event_type != 'error' THEN value END AS value_ok
FROM events
"""


def case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chains (C4/C5, reference utils/data_mapper.py:186-190,
    320-322): categorical recode + substring-driven ternary."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "Filled")
        .when(F.col("o_orderstatus") == "O", "Open")
        .otherwise("Pending")
        .alias("status_en"),
        F.when(
            F.col("o_orderpriority").contains("URGENT"), "expedite"
        )
        .otherwise("routine")
        .alias("handling"),
        (F.col("o_totalprice") > 200000).cast("string").alias("is_big"),
    )


CASE_CONDITIONAL_SQL = """
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'Filled' WHEN 'O' THEN 'Open'
            ELSE 'Pending' END AS status_en,
       CASE WHEN CONTAINS(o_orderpriority, 'URGENT') THEN 'expedite'
            ELSE 'routine' END AS handling,
       CAST(o_totalprice > 200000 AS VARCHAR) AS is_big
FROM orders
"""


def regexp_extract_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction with fallback chains (C6–C8, reference
    utils/parser.py:27-57): pull numeric id out of brand, first word of
    p_name, digit-run out of priority, with coalesce fallback."""
    p = load_table(spark, "part", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    parts = p.select(
        F.col("p_partkey").alias("key"),
        F.lit("part").alias("src"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("extracted_num"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_token"),
    )
    orders = o.select(
        F.col("o_orderkey").alias("key"),
        F.lit("order").alias("src"),
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).cast("int").alias(
            "extracted_num"
        ),
        F.coalesce(
            F.nullif(F.regexp_extract("o_orderpriority", r"-(\w+)$", 1), F.lit("")),
            F.lit("none"),
        ).alias("first_token"),
    )
    return parts.unionByName(orders)


REGEXP_EXTRACT_OPS_SQL = r"""
SELECT p_partkey AS key, 'part' AS src,
       CAST(REGEXP_EXTRACT(p_brand, 'Brand#(\d+)', 1) AS INT) AS extracted_num,
       REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_token
FROM part
UNION ALL
SELECT o_orderkey AS key, 'order' AS src,
       CAST(REGEXP_EXTRACT(o_orderpriority, '^(\d+)', 1) AS INT) AS extracted_num,
       COALESCE(NULLIF(REGEXP_EXTRACT(o_orderpriority, '-(\w+)$', 1), ''), 'none')
           AS first_token
FROM orders
"""


def json_extract_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access (§2B array/map/json): events.props is a JSON string;
    extract scalar, typed cast, schema'd from_json, existence flag."""
    ev = load_table(spark, "events", sf_dir)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_scalar"),
        parsed.getField("k").alias("k_struct"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
        (F.get_json_object("props", "$.k").cast("int") % 10 == 0).alias("k_mod10"),
    )


JSON_EXTRACT_OPS_SQL = """
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_scalar,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_struct,
       JSON_EXTRACT_STRING(props, '$.missing') AS missing_key,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) % 10 = 0 AS k_mod10
FROM events
"""


def variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path (§2B array/map/json, current-gen form):
    ``parse_json`` once into a binary variant, then typed ``variant_get``
    accesses — the open-format successor of get_json_object that parses
    the document a single time instead of re-parsing the string per
    extraction (the difference between O(fields) and O(fields × doc) on a
    wide-payload scan). Same observable values as the string path, so the
    DuckDB JSON functions oracle it exactly."""
    ev = load_table(spark, "events", sf_dir)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_key"),
        F.is_variant_null(F.try_variant_get(v, "$.k", "variant")).alias(
            "k_is_json_null"
        ),
    )


VARIANT_JSON_OPS_SQL = """
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_typed,
       JSON_EXTRACT_STRING(props, '$.missing') AS missing_key,
       JSON_EXTRACT(props, '$.k') = 'null'::JSON AS k_is_json_null
FROM events
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library (C13/C14, §2B date lib): trunc, month add,
    diff, last_day, extract fields, formatting."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # date-valued results surface as ISO strings: keeps the result schema
        # engine-portable (DATE → datetime.date objects vs pandas datetime64
        # diverge between clients)
        F.add_months(F.col("o_orderdate"), 3).cast("string").alias("plus3m"),
        F.last_day(F.col("o_orderdate")).cast("string").alias("month_end"),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym_label"),
    )


DATE_FUNCTIONS_SQL = """
SELECT o_orderkey,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
       CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
       DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       STRFTIME(o_orderdate, '%Y-%m') AS ym_label
FROM orders
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math library (§2B math lib): rounding modes, abs, sqrt, exact
    products, log (rounded: libm implementations differ at the last ulp)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln6"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.sign(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
    )


MATH_FUNCTIONS_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       ABS(l_discount - 0.05) AS disc_dev,
       SQRT(l_quantity) AS qty_sqrt,
       l_quantity * l_quantity AS qty_sq,
       ROUND(LN(l_extendedprice), 6) AS price_ln6,
       GREATEST(l_tax, l_discount) AS max_rate,
       LEAST(l_tax, l_discount) AS min_rate,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil
FROM lineitem
"""


def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT, distinct and ALL variants (§2B set ops),
    tagged into one result for a single oracle check."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    buyers = orders.select(F.col("o_custkey").alias("k"))
    knowns = cust.select(F.col("c_custkey").alias("k"))
    return (
        buyers.intersect(knowns)
        .select("k", F.lit("buyer").alias("tag"))
        .unionByName(knowns.exceptAll(buyers).select("k", F.lit("never_bought").alias("tag")))
        .unionByName(
            buyers.union(knowns).distinct().select("k", F.lit("any").alias("tag"))
        )
    )


SET_OPERATIONS_SQL = """
SELECT k, 'buyer' AS tag FROM (
  SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey FROM customer)
UNION ALL
SELECT k, 'never_bought' AS tag FROM (
  SELECT c_custkey AS k FROM customer EXCEPT ALL SELECT o_custkey FROM orders)
UNION ALL
SELECT k, 'any' AS tag FROM (
  SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer)
"""


def pivot_coalesce_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-priority resolution (§2A J5/R3, the reference's signature
    read-path move, reference utils/service/financial_service.py:54-75,127):
    pivot a long/EAV-shaped table to one wide row per entity over a
    *declared* column list, then coalesce synonyms in priority order.

    Here: per user, 'headline_value' prefers purchase ⇐ click ⇐ view —
    exactly how NetSales prefers jppfs_cor:NetSales ⇐ OperatingRevenue1 ⇐ …
    Deterministic scalar per (user, type): max value.
    """
    ev = load_table(spark, "events", sf_dir)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["purchase", "click", "view", "signup", "error"])
        .agg(F.max("value"))
    )
    return wide.select(
        "user_id",
        F.col("purchase").alias("v_purchase"),
        F.col("click").alias("v_click"),
        F.col("view").alias("v_view"),
        F.coalesce("purchase", "click", "view").alias("headline_value"),
    )


PIVOT_COALESCE_PRIORITY_SQL = """
SELECT user_id,
       MAX(CASE WHEN event_type = 'purchase' THEN value END) AS v_purchase,
       MAX(CASE WHEN event_type = 'click' THEN value END) AS v_click,
       MAX(CASE WHEN event_type = 'view' THEN value END) AS v_view,
       COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN value END),
                MAX(CASE WHEN event_type = 'click' THEN value END),
                MAX(CASE WHEN event_type = 'view' THEN value END)) AS headline_value
FROM events
GROUP BY user_id
"""


def guarded_ratio_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded ratio + unit rescale (§2A C10/C11, reference
    utils/service/financial_service.py:150-164): margin% only when the
    denominator is non-null and non-zero — NULL otherwise, never a crash —
    and measures rescaled to millions. Fixes the reference's unguarded
    divide (SURVEY §7.3.3) by propagating NULL."""
    li = load_table(spark, "lineitem", sf_dir)
    base = dsum("l_extendedprice")
    disc = dsum(F.col("l_extendedprice") * F.col("l_discount"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        base.alias("gross"), disc.alias("given_away")
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("gross") / 1e6).alias("gross_m"),
        F.when(
            F.col("gross").isNotNull() & (F.col("gross") != 0),
            F.col("given_away") / F.col("gross") * 100,
        ).alias("discount_pct"),
    )


GUARDED_RATIO_MARGIN_SQL = f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         {sql_dsum('l_extendedprice')} AS gross,
         {sql_dsum('l_extendedprice * l_discount')} AS given_away
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       gross / 1e6 AS gross_m,
       CASE WHEN gross IS NOT NULL AND gross != 0
            THEN given_away / gross * 100 END AS discount_pct
FROM agg
"""


QUERIES = {
    "filter_pushdown_project": filter_pushdown_project,
    "string_predicates": string_predicates,
    "string_functions": string_functions,
    "null_semantics": null_semantics,
    "case_conditional": case_conditional,
    "regexp_extract_ops": regexp_extract_ops,
    "json_extract_ops": json_extract_ops,
    "variant_json_ops": variant_json_ops,
    "date_functions": date_functions,
    "math_functions": math_functions,
    "set_operations": set_operations,
    "pivot_coalesce_priority": pivot_coalesce_priority,
    "guarded_ratio_margin": guarded_ratio_margin,
}

ORACLES = {
    "filter_pushdown_project": FILTER_PUSHDOWN_PROJECT_SQL,
    "string_predicates": STRING_PREDICATES_SQL,
    "string_functions": STRING_FUNCTIONS_SQL,
    "null_semantics": NULL_SEMANTICS_SQL,
    "case_conditional": CASE_CONDITIONAL_SQL,
    "regexp_extract_ops": REGEXP_EXTRACT_OPS_SQL,
    "json_extract_ops": JSON_EXTRACT_OPS_SQL,
    "variant_json_ops": VARIANT_JSON_OPS_SQL,
    "date_functions": DATE_FUNCTIONS_SQL,
    "math_functions": MATH_FUNCTIONS_SQL,
    "set_operations": SET_OPERATIONS_SQL,
    "pivot_coalesce_priority": PIVOT_COALESCE_PRIORITY_SQL,
    "guarded_ratio_margin": GUARDED_RATIO_MARGIN_SQL,
}
