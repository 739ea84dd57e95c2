"""Shared helpers for the operator library.

Oracle-exact aggregation: the driver hash-compares our results against a
DuckDB oracle. Floating-point SUM is not associative, and Spark's partial/
final aggregation adds doubles in a different order than DuckDB's sequential
scan — the low-order bits would diverge and the value-hash would miss. So
every headline SUM/AVG over a double column routes through an exact decimal
accumulator (associative, order-insensitive) and casts the final result back
to double. The per-row double→decimal cast happens inside whole-stage
codegen; at 100 TB this is the price of a reproducible answer, and it is the
same trick TPC-H kit queries use (decimal money types) expressed on parquet
double columns.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-insensitive SUM of a double column, returned as double."""
    return F.sum(_c(col).cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-insensitive AVG: exact decimal sum, double division by count."""
    c = _c(col)
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
