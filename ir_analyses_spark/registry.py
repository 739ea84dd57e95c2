"""Central query registry: merges every module's (queries, oracles) pair.

``__spark_entry__.py`` (the driver contract) is a thin shim over this module.
Each ops/queries/llm/streaming module exports

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL twins; a query
  without an oracle entry gets the driver's weaker rows-only check (reserved
  for genuinely non-SQL-expressible ops: sketches, LSH, streaming state).

Names must be globally unique; the merge asserts it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .llm import dedup, multimodal, similarity, textstats
from .ops import (
    aggregates,
    collections,
    joins,
    macros,
    relational,
    skew,
    udfs,
    windows,
)
from .queries import ir_demo
from .streaming import pipeline as streaming_pipeline

_MODULES = [
    aggregates,
    joins,
    relational,
    windows,
    collections,
    macros,
    skew,
    udfs,
    dedup,
    similarity,
    textstats,
    multimodal,
    streaming_pipeline,
    ir_demo,
]


def _with_engine_conf(fn: Callable) -> Callable:
    """Queries must behave identically on ANY session the caller supplies
    (the driver harness builds its own); retrofit the engine's runtime SQL
    confs before the plan is constructed."""
    from functools import wraps

    from .session import ensure_engine_conf

    @wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(ensure_engine_conf(spark), sf_dir)

    return wrapped


def _merge() -> tuple[dict[str, Callable], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            assert name not in queries, f"duplicate query name: {name}"
            queries[name] = _with_engine_conf(fn)
        for name, sql in getattr(mod, "ORACLES", {}).items():
            assert name in mod.QUERIES, f"oracle without query: {name}"
            oracles[name] = sql
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merge()[0]


def all_oracles() -> dict[str, str]:
    return _merge()[1]
