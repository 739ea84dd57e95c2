"""Full-oracle bound-check certificates for the engine's sketch/LSH
primitives — r9 VERDICT item 5. The three rows-only registry entries
(``approx_sketches``, ``hll_mergeable_rollup`` in `ops/aggregates.py`,
``ann_ml_brp_lsh`` in `llm/similarity.py`) emit estimator-specific
values no other engine can recompute, so they can never take a value
hash. These twins certify the same operators CROSS-ENGINE anyway by
restating each estimate as a checkable claim:

- the EXACT side of every claim (distinct counts, quantile band edges,
  the exact neighbor-pair set) is recomputed independently by DuckDB
  and value-hashed — a real cross-engine result, not a fixture;
- the estimate is compared to its exact side INSIDE the query, and
  only the boolean verdict is emitted, which the oracle asserts TRUE.
  If Spark's sketch ever drifts past its documented error bound, the
  verdict flips and the driver's hash check fails loudly.

The bounds are deliberately generous multiples of each estimator's
published error (HLL++ rsd 5% default → 15%; datasketches HLL lgK=12
rsd ≈1.6% → 6% + a small-cardinality absolute floor; percentile rank
accuracy 1/10000 → a ±0.01-rank exact band; BRP-LSH soundness is exact
by construction and recall ≥ 0.8 matches the module's pinned property)
so they hold at every tested SF while still failing on any real
regression — ``tests/test_vacuity_guards.py`` proves each comparison
is live (a wrong estimate flips it) and each band is non-degenerate.

New module per the evidence-ledger rule: the sketch ops themselves
stay untouched in their certified modules; helpers are imported.

Scale note: these are CERTIFICATION queries, run at correctness SFs —
the exact sides (count_distinct, exact percentile, the quadratic exact
pair set) are the very computations the certified sketches exist to
REPLACE at 100 TB. Production traffic uses the rows-only twins; these
rows exist so the driver can hash-check that the sketches stay inside
their bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: relative error accepted for approx_count_distinct (HLL++, default
#: rsd = 0.05 → 3σ with margin)
_ACD_REL_TOL = 0.15

#: rank half-width of the exact band an approx percentile must land in
#: (percentile_approx default accuracy 10000 → rank error ≤ 1e-4; the
#: band is 100× that)
_PCT_RANK_TOL = 0.01

#: datasketches HLL (lgConfigK = 12 → rsd ≈ 1.6%): relative bound for
#: the two-level union rollup, 3.7σ, plus an absolute floor where tiny
#: cardinalities make the relative form meaninglessly tight
_HLL_REL_TOL = 0.06
_HLL_ABS_TOL = 2

#: BRP-LSH parameters — SAME as llm/similarity.ann_ml_brp_lsh so this
#: row certifies that operator's configuration, not a friendlier one
_BRP_RADIUS = 1.2
_BRP_BUCKET_LEN = 2.0
_BRP_TABLES = 4
_BRP_SEED = 42
_RECALL_FLOOR = 0.8


def approx_sketches_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-check twin of ``approx_sketches`` (`ops/aggregates.py`):
    per returnflag, the HLL++ distinct estimate must sit within
    ``_ACD_REL_TOL`` of the exact count, and each approx percentile
    must land inside the exact [p−0.01, p+0.01] rank band. The exact
    count rides along for the cross-engine hash; the verdicts are
    booleans the oracle asserts TRUE."""
    li = load_table(spark, "lineitem", sf_dir)
    # r14 optimization (guide §2.3/§7.2): count_distinct may NOT share a
    # groupBy with the percentile/sketch aggregates. Spark plans a mixed
    # distinct aggregation by first aggregating on
    # (l_returnflag, l_partkey) — and carries every ObjectHashAggregate
    # buffer (two exact-percentile value maps, three KLL sketches, the
    # HLL) through that ~|distinct partkey| group expansion: ~200k
    # percentile buffers built, shuffled and merged instead of 3.
    # Measured at sf0.1: mixed form 14–19 s; the split below ~2.5 s —
    # identical values (per-group aggregates are independent; the 3-row
    # join is broadcast).
    dist = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts")
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_acd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_a50"),
        F.percentile_approx("l_extendedprice", 0.95).alias("_a95"),
        F.percentile_approx("l_extendedprice", 0.99).alias("_a99"),
        F.expr(
            "percentile(l_extendedprice, "
            "array(0.49, 0.51, 0.94, 0.96, 0.98, 1.0))"
        ).alias("_band"),
    )
    agg = dist.join(F.broadcast(sketches), "l_returnflag")

    def ok(a, lo_i, hi_i):
        return (F.col(a) >= F.element_at("_band", lo_i)) & (
            F.col(a) <= F.element_at("_band", hi_i)
        )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_acd") - F.col("exact_parts"))
            <= F.lit(_ACD_REL_TOL) * F.col("exact_parts")
        ).alias("hll_ok"),
        ok("_a50", 1, 2).alias("q50_ok"),
        ok("_a95", 3, 4).alias("q95_ok"),
        ok("_a99", 5, 6).alias("q99_ok"),
    )


APPROX_SKETCHES_BOUND_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS hll_ok,
       TRUE AS q50_ok,
       TRUE AS q95_ok,
       TRUE AS q99_ok
FROM lineitem
GROUP BY l_returnflag
"""


def hll_union_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-check twin of ``hll_mergeable_rollup``: the two-level
    rollup (per-cell datasketches HLL → union to per-returnflag) must
    estimate within ``max(_HLL_ABS_TOL, _HLL_REL_TOL · exact)`` of the
    exact per-returnflag distinct count. Exercises the exact pipeline
    the rows-only entry ships — sketch build, sketch UNION (where
    estimates don't add but registers do), estimate — and converts it
    into an oracle-checkable verdict."""
    li = load_table(spark, "lineitem", sf_dir)
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    unioned = cells.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts")
    )
    return exact.join(unioned, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_est") - F.col("exact_parts"))
            <= F.greatest(
                F.lit(float(_HLL_ABS_TOL)),
                F.lit(_HLL_REL_TOL) * F.col("exact_parts"),
            )
        ).alias("union_ok"),
    )


HLL_UNION_BOUND_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS union_ok
FROM lineitem
GROUP BY l_returnflag
"""

#: sequential in-order fold of the squared L2 distance — the SAME
#: deterministic-IEEE discipline as llm/similarity's dot product (both
#: engines fold identical doubles in index order → bit-equal), so the
#: ≤ radius² comparison can never straddle an ulp between engines
_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "(cast(x as double) - cast(y as double)) * "
    "(cast(x as double) - cast(y as double))), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)

_SQL_SQDIST = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
    "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)


def brp_lsh_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-check twin of ``ann_ml_brp_lsh`` (`llm/similarity.py`,
    same bucketLength/numHashTables/seed/radius): one row —

    - ``n_exact_pairs``: the EXACT count of unordered vector pairs
      within L2 ``_BRP_RADIUS``, recomputed independently by DuckDB
      (the value-hashed cross-engine fact);
    - ``sound_ok``: every pair the stock MLlib approxSimilarityJoin
      emitted is genuinely within the radius (checked against this
      module's deterministic fold distance, ulp-tolerant);
    - ``recall_ok``: the LSH join found ≥ ``_RECALL_FLOOR`` of the
      exact pair set — the same property `tests/test_similarity_bounds`
      pins in-repo, now driver-certified."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    a = emb.select(
        F.col("vec_id").alias("v1"), F.col("e").alias("e1")
    )
    b = emb.select(
        F.col("vec_id").alias("v2"), F.col("e").alias("e2")
    )
    sq = F.expr(_SQDIST.format(a="e1", b="e2"))
    # r14 probe, REJECTED: checkpointing this frame (it appears twice in
    # the one result plan — recall join + count) measured 1.04× at
    # sf0.01 warm interleaved — the MLlib LSH fit/join dominates the
    # certificate's wall and the barrier only serializes the stages.
    # Left as the single lazy plan.
    exact = (
        a.join(b, F.col("v1") < F.col("v2"))
        .filter(sq <= F.lit(_BRP_RADIUS) * F.lit(_BRP_RADIUS))
        .select("v1", "v2")
    )

    vec = emb.select(
        "vec_id", array_to_vector(F.col("e")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=_BRP_BUCKET_LEN,
        numHashTables=_BRP_TABLES,
        seed=_BRP_SEED,
    )
    pairs = (
        lsh.fit(vec)
        .approxSimilarityJoin(vec, vec, _BRP_RADIUS, distCol="dist")
        .filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("v1"),
            F.col("datasetB.vec_id").alias("v2"),
        )
        .distinct()
    )
    # soundness re-derives the distance with the deterministic fold
    # (MLlib's own distCol may differ in the last ulp) and allows that
    # ulp at the boundary
    lsh_d = pairs.join(a, "v1").join(b, "v2").select(
        "v1", "v2", sq.alias("_sq")
    )
    radius_sq = _BRP_RADIUS * _BRP_RADIUS
    stats = (
        lsh_d.join(
            exact.withColumn("_hit", F.lit(1)), ["v1", "v2"], "left"
        )
        .agg(
            F.count("*").alias("_n_lsh"),
            # coalesce both sums: over an EMPTY pair set sum() is NULL
            # and NULL==0 / NULL>=x would emit NULL verdicts where the
            # oracle asserts TRUE (review-caught — zero pairs within
            # the radius must certify, not hash-mismatch)
            F.coalesce(
                F.sum(
                    (
                        F.col("_sq") > F.lit(radius_sq * (1 + 1e-9))
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("_n_unsound"),
            F.coalesce(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))), F.lit(0)
            ).alias("_n_found"),
        )
        .crossJoin(exact.agg(F.count("*").alias("n_exact_pairs")))
    )
    return stats.select(
        "n_exact_pairs",
        (F.col("_n_unsound") == 0).alias("sound_ok"),
        (
            F.col("_n_found")
            >= F.lit(_RECALL_FLOOR) * F.col("n_exact_pairs")
        ).alias("recall_ok"),
    )


BRP_LSH_BOUND_SQL = f"""
SELECT COUNT(*) AS n_exact_pairs,
       TRUE AS sound_ok,
       TRUE AS recall_ok
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_SQL_SQDIST.format(a="a.embedding", b="b.embedding")}
      <= {_BRP_RADIUS} * {_BRP_RADIUS}
"""


QUERIES = {
    "approx_sketches_bound": approx_sketches_bound,
    "hll_union_bound": hll_union_bound,
    "brp_lsh_bound": brp_lsh_bound,
}

ORACLES = {
    "approx_sketches_bound": APPROX_SKETCHES_BOUND_SQL,
    "hll_union_bound": HLL_UNION_BOUND_SQL,
    "brp_lsh_bound": BRP_LSH_BOUND_SQL,
}
