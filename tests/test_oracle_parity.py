"""Differential correctness: every registered query with an oracle must
match DuckDB exactly at sf0.001 (the driver runs the same check at sf0.01).

Queries without an oracle entry are still executed (rows-only smoke)."""

from __future__ import annotations

import pytest

from ir_analyses_spark.registry import all_oracles, all_queries

from .compare import assert_matches_oracle, duckdb_conn

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_matches_oracle(df, con, ORACLES[name], name=name)
    else:
        assert df.count() >= 0  # rows-only: runs and has a stable schema
