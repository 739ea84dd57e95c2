"""Differential comparison utilities mirroring the driver's oracle check:
row-count + schema + order-insensitive value comparison between a Spark
result and a DuckDB result over the same parquet tables."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ir_analyses_spark.schemas import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _null_or_str(v):
    """Canonical string for object cells; EVERY null flavor → None.
    DuckDB's .df() can deliver float('nan')/NaT where Spark delivers None
    for the same NULL — stringifying those to 'nan' would sort differently
    and falsely mismatch. Non-scalars (arrays) fall through to str()."""
    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass  # pd.isna on arrays returns an array — treat as a value
    return str(v)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            # date objects / decimals → canonical strings for sort stability
            df[c] = s.map(_null_or_str)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: mirrors value-hash strictness
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) or pd.isna(b):
        return False
    return a == b


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name=""):
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(sql).df())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        # i/u vs f is tolerated only when one side has NULLs (pandas upcasts)
        compatible = (
            gk == wk
            or {gk, wk} <= {"i", "u"}
            or ({gk, wk} <= {"i", "u", "f"} and (got[c].isna().any() or want[c].isna().any()))
        )
        assert compatible, f"{name}: column {c} dtype {got[c].dtype} vs {want[c].dtype}"
    for c in got.columns:
        ga, wa = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(ga, wa)):
            assert _cell_equal(a, b), (
                f"{name}: column {c} row {i}: spark={a!r} oracle={b!r}"
            )
