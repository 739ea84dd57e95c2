"""Skyline (Pareto-frontier) operator — Börzsönyi et al., ICDE 2001.

"Find the parts no other part beats on BOTH price and size": the rows
not dominated by any other row, where q dominates p iff q is ≤ p on the
minimized dimension, ≥ p on the maximized one, and strictly better on
at least one. Classic OLAP operator with no native Spark expression.

Spark-first decomposition (the distributed-skyline literature's
partition-then-merge shape, e.g. Wu et al. "Parallelizing Skyline
Queries", and the same local-prune/global-verify split the dedup ladder
uses):

1. **Local phase — mapInPandas, shuffle-free.** The skyline of a union
   is contained in the union of skylines, so each Arrow batch is
   pre-filtered to its local frontier with the O(n log n) sort-sweep
   (sort by price ASC, size DESC over distinct points; keep a point iff
   its size strictly exceeds the best size seen). At 100 TB this is the
   phase that does the work: a batch of millions reduces to a frontier
   of (typically) dozens before anything moves.
2. **Global phase — dominance anti-join** over the tiny survivor set,
   dominator side broadcast. Exact, and order-independent: the final
   frontier is a pure set function of the data, whatever the
   partitioning (pinned in tests/test_skyline.py by re-running under a
   hostile repartition).

Tie semantics (part of the operator contract): exact (price, size)
duplicates do not dominate each other — ALL copies of a frontier point
survive, matching the NOT EXISTS oracle.

Dimensions here: minimize p_retailprice, maximize p_size. Comparisons
only — no float arithmetic — so cross-engine value parity is exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

_SCHEMA = "p_partkey long, p_retailprice double, p_size int"


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch frontier pre-filter (sound: a locally dominated row is
    globally dominated; never drops a global-frontier row)."""
    for pdf in batches:
        if pdf.empty:
            yield pdf
            continue
        pts = (
            pdf[["p_retailprice", "p_size"]]
            .drop_duplicates()
            .sort_values(
                ["p_retailprice", "p_size"], ascending=[True, False]
            )
        )
        best = -1
        keep = []
        for price, size in pts.itertuples(index=False):
            if size > best:
                keep.append((price, size))
                best = size
        frontier = pd.DataFrame(keep, columns=["p_retailprice", "p_size"])
        yield pdf.merge(frontier, on=["p_retailprice", "p_size"])


def skyline(parts: DataFrame) -> DataFrame:
    """Pareto frontier of (min p_retailprice, max p_size)."""
    rows = parts.select("p_partkey", "p_retailprice", "p_size")
    survivors = rows.mapInPandas(_local_skyline, schema=_SCHEMA)
    dom = survivors.select(
        F.col("p_retailprice").alias("d_price"), F.col("p_size").alias("d_size")
    )
    dominated = (
        (F.col("d_price") <= F.col("p_retailprice"))
        & (F.col("d_size") >= F.col("p_size"))
        & (
            (F.col("d_price") < F.col("p_retailprice"))
            | (F.col("d_size") > F.col("p_size"))
        )
    )
    return survivors.join(F.broadcast(dom), dominated, "left_anti")


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: part-table skyline."""
    return skyline(load_table(spark, "part", sf_dir))


SKYLINE_PARTS_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice
    AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
"""

QUERIES = {"skyline_parts": skyline_parts}
ORACLES = {"skyline_parts": SKYLINE_PARTS_SQL}
