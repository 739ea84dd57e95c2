"""ops/helpers.local_df: the Arrow LocalRelation route for driver-local
literal frames (r14, guide §4). The contract is strict equality with
``spark.createDataFrame(list, schema)`` — rows, schema, and null
semantics — while planning as a pure-JVM LocalRelation (no Python-RDD
scan, whose every action measured 5-7 s on this box)."""

from __future__ import annotations

import pytest

from ir_analyses_spark.ops.helpers import local_df
from ir_analyses_spark.schemas import RAW_FILING_SCHEMA

_CASES = [
    ([(1, 2, "s", 3, "r")],
     "k int, window int, hash_scheme string, format_version int, "
     "identity_rendering string"),
    ([("compact", 1723900000.25, 10, 5, 100, 50)],
     "op string, ts double, rows_before bigint, rows_after bigint, "
     "bytes_before bigint, bytes_after bigint"),
    ([(7,)], "n_epochs int"),
    ([(1, "alpha"), (1, "beta"), (2, "gamma")], "query_id int, w string"),
    ([("budget", 0.0, 1200.0), ("premium", 1600.0, 1e12)],
     "band string, lo double, hi double"),
    ([(0, "a", "b", 12), (1, None, "c", None)],
     "round INT, left_sym STRING, right_sym STRING, pair_count BIGINT"),
    ([("x", 5), ("y", None)], "stage string, n_rows long"),
    ([(True, 1.5), (False, None)], "f boolean, v double"),
]


@pytest.mark.parametrize("rows,schema", _CASES)
def test_rows_schema_and_plan(spark, rows, schema):
    a = spark.createDataFrame(rows, schema)
    b = local_df(spark, rows, schema)
    assert a.schema == b.schema
    assert a.collect() == b.collect()
    plan = b._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
    assert plan == "LocalRelation"


def test_struct_type_schema_and_nulls(spark):
    n = len(RAW_FILING_SCHEMA.fields)
    rows = [
        tuple(f"v{i}" for i in range(n)),
        tuple(None if i % 3 == 0 else f"w{i}" for i in range(n)),
    ]
    a = spark.createDataFrame(rows, RAW_FILING_SCHEMA)
    b = local_df(spark, rows, RAW_FILING_SCHEMA)
    assert a.schema == b.schema and a.collect() == b.collect()


def test_empty_rows_fall_back(spark):
    df = local_df(spark, [], "a int, b string")
    assert df.count() == 0 and len(df.schema.fields) == 2


def test_non_primitive_cell_raises(spark):
    import datetime

    with pytest.raises(TypeError, match="primitives"):
        local_df(spark, [(datetime.datetime(2024, 1, 1),)], "t timestamp")
