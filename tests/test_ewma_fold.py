"""ewma_forecast: the in-order aggregate() fold must reproduce the
WITH RECURSIVE recurrence bit-for-bit (r14 optimization, guide §1.2).

The recurrence is s_1 = double(d_1); s_i = (d_i + 3·s_{i-1}) / 4. The
fold claims bit-identity because (a) element order — sort_array over
structs keyed by the unique qtr — equals the recursion's ROW_NUMBER()
OVER (ORDER BY qtr) walk, (b) the init is the anchor's cast, (c) each
step is the byte-identically spelled IEEE expression. These tests pin
that claim three ways: against an iterative pure-Python reference on
random series (Python floats are IEEE doubles, so `(x + 3*s) / 4`
performs the same correctly-rounded ops), against Spark's own executed
WITH RECURSIVE on the same random frame, and on the real sf0.001 table.
"""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from ir_analyses_spark.ops.windows import EWMA_FOLD_SQL, ewma_forecast

import pytest

# the SHIPPED fold text (r14 ADVICE 1: a verbatim copy here would let the
# production SQL drift out from under the random-series bit pins)
_FOLD_SQL = EWMA_FOLD_SQL

_RECURSIVE_SQL = """
WITH RECURSIVE seq AS (
  SELECT qtr, demand_c, ROW_NUMBER() OVER (ORDER BY qtr) AS i FROM {src}
),
sm (i, qtr, demand_c, ewma) AS (
  SELECT i, qtr, demand_c, CAST(demand_c AS DOUBLE)
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.i, s.qtr, s.demand_c,
         (CAST(s.demand_c AS DOUBLE) + 3 * m.ewma) / 4
  FROM sm m JOIN seq s ON s.i = m.i + 1
)
SELECT qtr, demand_c, ewma FROM sm
"""


def _python_ewma(series: list[tuple[str, int]]) -> dict[str, float]:
    """Iterative reference in Python floats (IEEE doubles, same ops)."""
    out: dict[str, float] = {}
    s = None
    for qtr, d in sorted(series):
        s = float(d) if s is None else (float(d) + 3 * s) / 4
        out[qtr] = s
    return out


def _random_series(rng: random.Random, n: int) -> list[tuple[str, int]]:
    # unique qtr keys; demand values span sign/magnitude corners that
    # stay exactly representable as doubles (the query's cents are ≤2^53)
    qtrs = rng.sample([f"{y}-Q{q}" for y in range(1990, 2050) for q in (1, 2, 3, 4)], n)
    return [(q, rng.randint(-(2**52), 2**52)) for q in qtrs]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_fold_matches_python_reference_on_random_series(spark):
    rng = random.Random(0xEA14)
    for n in (1, 2, 7, 28, 61):
        series = _random_series(rng, n)
        df = spark.createDataFrame(series, "qtr string, demand_c long")
        df.createOrReplaceTempView("_t_ewma_rand")
        got = {
            r["qtr"]: r["ewma"]
            for r in spark.sql(_FOLD_SQL.format(src="_t_ewma_rand")).collect()
        }
        want = _python_ewma(series)
        assert set(got) == set(want)
        for qtr in want:
            assert _bits(got[qtr]) == _bits(want[qtr]), (n, qtr)


# slow: executes Spark's WITH RECURSIVE as the reference; the Python-reference bit pin covers the same equality fast
@pytest.mark.slow
def test_fold_matches_executed_recursion_on_random_series(spark):
    rng = random.Random(0xF01D)
    series = _random_series(rng, 23)
    df = spark.createDataFrame(series, "qtr string, demand_c long")
    df.createOrReplaceTempView("_t_ewma_rec")
    fold = {
        (r["qtr"], r["demand_c"]): _bits(r["ewma"])
        for r in spark.sql(_FOLD_SQL.format(src="_t_ewma_rec")).collect()
    }
    rec = {
        (r["qtr"], r["demand_c"]): _bits(r["ewma"])
        for r in spark.sql(_RECURSIVE_SQL.format(src="_t_ewma_rec")).collect()
    }
    assert fold == rec


def test_query_output_on_real_table(spark, sf_dir):
    """The shipped query over the real table: recompute the quarterly
    series independently and fold it in Python; every double must be
    bit-identical and the schema unchanged."""
    out = ewma_forecast(spark, sf_dir)
    assert out.schema.simpleString() == (
        "struct<qtr:string,demand_c:bigint,ewma:double>"
    )
    rows = out.collect()
    # the ewma_forecast call above already registered the view; building
    # the whole query a second time just to reach it was pure waste
    # (r14 ADVICE 3)
    demand = (
        spark.table("_win_orders")
        .groupBy(
            F.concat(
                F.year("o_orderdate").cast("string"),
                F.lit("-Q"),
                F.quarter("o_orderdate").cast("string"),
            ).alias("qtr")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(30,2)") * 100).cast("long")
            ).cast("long").alias("demand_c")
        )
        .collect()
    )
    series = [(r["qtr"], r["demand_c"]) for r in demand]
    want = _python_ewma(series)
    assert len(rows) == len(series)
    for r in rows:
        assert dict(series)[r["qtr"]] == r["demand_c"]
        assert _bits(want[r["qtr"]]) == _bits(r["ewma"]), r["qtr"]


def test_plan_has_no_recursion_and_no_global_window(spark, sf_dir):
    """The fold's plan: one aggregate chain — no UnionLoop recursion
    jobs, no single-partition ROW_NUMBER window (the WindowExec
    all-data-to-one-partition shape the recursion needed)."""
    plan = (
        ewma_forecast(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "UnionLoop" not in plan
    # match the physical operator's own rendering ("Window [<exprs>...")
    # — a bare "Window" substring would false-fail on any future
    # operator/expression NAME containing the word (r14 ADVICE 2)
    assert "Window [" not in plan
    assert "Generate" in plan  # posexplode of the packed series
