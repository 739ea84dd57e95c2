"""ops/sketch_bounds.py: the bound-check certificates must be LIVE
comparisons, not vacuous TRUE literals — each tolerance is proven to
bite on a deterministically-degraded estimator (same data, coarser
sketch parameters; Spark's sketch hashes are fixed, so the degraded
estimates are reproducible constants, not flaky randomness), and each
exact band is proven non-degenerate on the correctness SFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io.sources import load_table
from ir_analyses_spark.ops.sketch_bounds import (
    _ACD_REL_TOL,
    _BRP_RADIUS,
    _BRP_SEED,
    _HLL_ABS_TOL,
    _HLL_REL_TOL,
    _RECALL_FLOOR,
    approx_sketches_bound,
    brp_lsh_bound,
    hll_union_bound,
)

SF = "/root/testdata/sf0.01"


def test_verdicts_true_and_exact_counts(spark):
    got = {r["l_returnflag"]: r for r in approx_sketches_bound(spark, SF).collect()}
    assert set(got) == {"A", "N", "R"}
    for r in got.values():
        assert r["exact_parts"] > 0
        assert r["hll_ok"] and r["q50_ok"] and r["q95_ok"] and r["q99_ok"]
    got2 = {r["l_returnflag"]: r for r in hll_union_bound(spark, SF).collect()}
    assert all(r["union_ok"] for r in got2.values())
    row = brp_lsh_bound(spark, SF).collect()[0]
    assert row["n_exact_pairs"] > 0
    assert row["sound_ok"] and row["recall_ok"]


def test_acd_tolerance_bites_on_coarser_sketch(spark):
    """The 15% HLL++ bound must reject a genuinely bad estimate: the
    same data sketched at rsd=0.3 lands ~22% off (deterministic —
    fixed hash), which the bound flags."""
    li = load_table(spark, "lineitem", SF)
    r = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("est"),
        F.approx_count_distinct("l_partkey", 0.3).alias("bad"),
    ).collect()
    for row in r:
        good_err = abs(row["est"] - row["exact"]) / row["exact"]
        bad_err = abs(row["bad"] - row["exact"]) / row["exact"]
        assert good_err > 0          # the estimator genuinely estimates
        assert good_err <= _ACD_REL_TOL
        assert bad_err > _ACD_REL_TOL  # ... and the bound genuinely bites


def test_hll_union_tolerance_bites_on_coarser_sketch(spark):
    """Same proof for the datasketches rollup: lgConfigK=4 (rsd ≈ 26%)
    estimates ~59% off on this data — far outside the 6% + floor."""
    li = load_table(spark, "lineitem", SF)
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey", F.lit(4)).alias("sk")
    )
    bad = cells.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact")
    )
    for row in exact.join(bad, "l_returnflag").collect():
        tol = max(_HLL_ABS_TOL, _HLL_REL_TOL * row["exact"])
        assert abs(row["est"] - row["exact"]) > tol


def test_quantile_band_nondegenerate_and_live(spark):
    """The exact rank bands must have real width (a collapsed band
    passes trivially) and the membership comparison must be able to
    say NO: the approx median sits outside the p94–p96 band."""
    li = load_table(spark, "lineitem", SF)
    r = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("a50"),
        F.expr(
            "percentile(l_extendedprice, array(0.49, 0.51, 0.94, 0.96))"
        ).alias("band"),
    ).collect()
    for row in r:
        b = row["band"]
        assert b[0] < b[1] < b[2] < b[3]          # non-degenerate
        assert b[0] <= row["a50"] <= b[1]          # in its own band
        assert not (b[2] <= row["a50"] <= b[3])    # out of the wrong one


# slow: sabotage-direction certificate over a full MLlib LSH build
@pytest.mark.slow
def test_brp_recall_floor_bites_on_sabotaged_params(spark):
    """recall_ok must be falsifiable: one hash table over tiny buckets
    (deterministic, same seed) finds only ~56% of the exact pair set —
    under the 0.8 floor — while the certified configuration's recall
    is high WITH real misses (so soundness/recall aren't counting an
    identical set)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, "embeddings", SF).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sq = F.expr(
        "aggregate(zip_with(e1, e2, (x, y) -> "
        "(cast(x as double) - cast(y as double)) * "
        "(cast(x as double) - cast(y as double))), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    a = emb.select(F.col("vec_id").alias("v1"), F.col("e").alias("e1"))
    b = emb.select(F.col("vec_id").alias("v2"), F.col("e").alias("e2"))
    exact = (
        a.join(b, F.col("v1") < F.col("v2"))
        .filter(sq <= F.lit(_BRP_RADIUS) * F.lit(_BRP_RADIUS))
        .select("v1", "v2")
    )
    n_exact = exact.count()
    assert n_exact > 0
    vec = emb.select("vec_id", array_to_vector("e").alias("features"))

    def recall(tables: int, blen: float) -> float:
        lsh = BucketedRandomProjectionLSH(
            inputCol="features", outputCol="hashes",
            bucketLength=blen, numHashTables=tables, seed=_BRP_SEED,
        )
        pairs = (
            lsh.fit(vec)
            .approxSimilarityJoin(vec, vec, _BRP_RADIUS, distCol="d")
            .filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
            .select(
                F.col("datasetA.vec_id").alias("v1"),
                F.col("datasetB.vec_id").alias("v2"),
            )
            .distinct()
        )
        return pairs.join(exact, ["v1", "v2"], "inner").count() / n_exact

    good = recall(4, 2.0)
    assert _RECALL_FLOOR <= good < 1.0  # high recall, but real misses
    assert recall(1, 0.25) < _RECALL_FLOOR  # the floor genuinely bites
