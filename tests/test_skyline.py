"""Skyline operator invariants (ops/skyline.py).

Value parity vs DuckDB is covered by test_oracle_parity; these pin the
two-phase decomposition's soundness and the tie contract.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io.sources import load_table
from ir_analyses_spark.ops.skyline import skyline
from ir_analyses_spark.registry import all_oracles


@pytest.fixture(scope="module", params=["0.001", "0.01"])
def frontier(request):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf{request.param}/part.parquet')"
    )
    return con.execute(all_oracles()["skyline_parts"]).df()


def test_frontier_nontrivial_and_mutually_nondominating(frontier):
    """The frontier must be a strict subset, and no member may dominate
    another (pairwise check over the small result)."""
    assert 1 < len(frontier) < 50
    rows = frontier[["p_retailprice", "p_size"]].values.tolist()
    for i, (pi, si) in enumerate(rows):
        for j, (pj, sj) in enumerate(rows):
            if i == j:
                continue
            dominates = pj <= pi and sj >= si and (pj < pi or sj > si)
            assert not dominates, (rows[i], rows[j])


def test_partition_invariance(spark, sf_dir):
    """The two-phase plan's defining property: the frontier is the same
    set under a hostile repartitioning (local phase sees arbitrary row
    subsets)."""
    parts = load_table(spark, "part", sf_dir)
    base = {tuple(r) for r in skyline(parts).collect()}
    shuffled = {
        tuple(r)
        for r in skyline(
            parts.repartition(13, (F.col("p_partkey") * 7919) % 13)
        ).collect()
    }
    assert base == shuffled and base


def test_duplicate_frontier_points_all_survive(spark):
    """Tie contract: exact (price, size) duplicates do not dominate each
    other — every copy of a frontier point is returned."""
    df = spark.createDataFrame(
        [
            (1, 10.0, 5),
            (2, 10.0, 5),  # duplicate of the frontier point
            (3, 11.0, 5),  # dominated (worse price, same size)
            (4, 10.0, 4),  # dominated (same price, smaller size)
            (5, 9.0, 1),   # frontier (cheapest)
        ],
        "p_partkey long, p_retailprice double, p_size int",
    )
    got = {r["p_partkey"] for r in skyline(df).collect()}
    assert got == {1, 2, 5}


def test_local_phase_is_sound(spark, sf_dir):
    """The mapInPandas pre-filter must be a superset of the frontier and
    a subset of the input (it is a filter, and it never drops a
    global-frontier row)."""
    from ir_analyses_spark.ops.skyline import _SCHEMA, _local_skyline

    parts = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_retailprice", "p_size"
    )
    local = parts.mapInPandas(_local_skyline, schema=_SCHEMA)
    n_in, n_local = parts.count(), local.count()
    assert n_local <= n_in
    frontier = {r["p_partkey"] for r in skyline(parts).collect()}
    local_keys = {r["p_partkey"] for r in local.collect()}
    assert frontier <= local_keys
