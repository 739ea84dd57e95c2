"""Similarity search over embedding columns (SURVEY §2B LLM ext):
brute-force cosine top-k (exact baseline) and LSH-bucketed ANN (scale path).

Determinism discipline: dot products are in-order double folds (the fold
order is part of the operator contract), so scores — and therefore top-k
*selection* — are bit-identical across engines and partitionings; ranking
tiebreaks on vec_id. Even the LSH path is reproducible because its
hyperplanes are hash-derived, not RNG-drawn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.sources import load_table

#: deterministic query set: first 5 vectors
_QUERY_IDS = [0, 1, 2, 3, 4]
_TOP_K = 5

# Sequential left-fold dot product in doubles: aggregate(zip_with(…)) is
# an in-order fold, so the result is a *deterministic* IEEE value — the
# same value any engine computes folding the same products in index order
# (DuckDB twin: list_reduce). Order-insensitivity is NOT required here
# because the fold order is part of the operator contract; no decimal
# casts, no ulp drift from binary↔decimal rounding.
#
# Measured alternatives for the per-pair hot path (sf0.1, warm):
# expanding the fold into a 64-term element_at chain is ~2.7× SLOWER than
# the HOF (1.99 s vs 0.73 s per 600 k-pair scan — the deep Add tree blows
# up plan/codegen cost and element_at re-checks bounds per term), and an
# Arrow pandas UDF is marginally faster but not bit-identical (float32
# product rounding). The HOF fold stays. The real per-pair win is below:
# norms are per-VECTOR, so they are computed once per row (`_with_norm`)
# instead of re-folded O(pairs) times inside the cosine.
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v))"
)


def _dot_col(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def _norm_col(a: str) -> F.Column:
    return F.expr(_NORM.format(a=a))


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Attach the vector's L2 norm as a column. Norms are a per-VECTOR
    quantity — computing them once here keeps the per-PAIR expression down
    to the dot chain alone (the norm chains would otherwise be re-planned
    and re-evaluated O(pairs) times)."""
    return df.withColumn(out, _norm_col(vec_col))


def _assign_nearest(
    df: DataFrame,
    cent: DataFrame,
    vec_col: str,
    norm_col: str,
    id_col: str,
    out: str,
    cent_id_col: str = "cent_id",
) -> DataFrame:
    """Single-nearest-centroid assignment as a PARTIAL AGGREGATION
    (r14 optimization, guide §2.3 "aggregate before you shuffle").

    The former shape — ``row_number() OVER (PARTITION BY id ORDER BY csim
    DESC, cent_id)`` then ``= 1`` — shuffles and sorts the ENTIRE scored
    cross product (|rows| × |centroids| rows) just to keep one row per
    key. ``max(struct(csim, -cent_id))`` computes the same argmax with a
    map-side combine: only |rows| pre-aggregated rows reach the exchange,
    a |centroids|-fold shuffle reduction, and no sort at all. At 100 TB
    with FAISS-sized nlist (√n) that is the difference between shuffling
    the corpus once and shuffling it a thousand times over.

    Exact equivalence: struct comparison is lexicographic with the same
    double total order the window sort uses (NaN greatest, so a NaN score
    wins both forms), so ``max(struct(csim, -cent_id))`` picks the
    greatest csim with ties to the LOWEST centroid id — exactly the
    window's ``ORDER BY csim DESC, cent_id`` rank-1 row. min/max is
    associative+commutative, so partial aggregation cannot change the
    result. Requires non-negative centroid ids (negation must not wrap);
    every caller's ids are vec_id samples, which satisfy that.

    ``cent`` must carry (``cent_id_col``, cv, cnorm); broadcast like the
    window form — the scoring join shape (BroadcastNestedLoopJoin, pinned
    in tests/test_plans.py) is unchanged, only the post-scoring reduction
    differs (Window+Sort+Exchange(all scored rows) → partial+final
    HashAggregate with Exchange of one row per key)."""
    scored = df.join(F.broadcast(cent), how="cross").select(
        id_col,
        F.struct(
            (_dot_col(vec_col, "cv") / (F.col(norm_col) * F.col("cnorm"))).alias(
                "s"
            ),
            (-F.col(cent_id_col)).alias("nc"),
        ).alias("sc"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max("sc").alias("m"))
        .select(id_col, (-F.col("m.nc")).alias(out))
    )


def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: 5 query vectors × all candidates, rank per query
    (§2B brute-force baseline).

    The query side is broadcast (k vectors), so the candidate scan is
    embarrassingly parallel and shuffles only k×top_k rows for the final
    rank — the right physical shape even at 10^9 candidates.
    """
    emb = _with_norm(load_table(spark, "embeddings", sf_dir), "embedding", "enorm")
    q = (
        emb.filter(F.col("vec_id").isin(_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("enorm").alias("qnorm"),
        )
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        (_dot_col("embedding", "qv") / (F.col("enorm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


_SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
    "(acc, v) -> acc + v)"
)
_SQL_NORM = (
    "SQRT(list_reduce(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
)

ANN_BRUTE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_SQL_DOT.format(a='e.embedding', b='q.qv')}
           / ({_SQL_NORM.format(a='e.embedding')} * {_SQL_NORM.format(a='q.qv')})
           AS cosine
  FROM embeddings e JOIN q ON e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
"""


def _random_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component h[p][d] derives
    from a hash of (p, d) — reproducible across runs with no RNG state."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"plane:{p}:{d}".encode()).digest()[:8], "big"
            )
            row.append((h / 2**63) - 1.0)  # ≈ uniform [-1, 1)
        planes.append(row)
    return planes


_N_PLANES = 16
_N_BANDS = 4
_BAND_SIZE = 4
_PLANES = _random_hyperplanes(64, _N_PLANES)


#: The 16×64 hyperplane matrix as ONE parsed SQL literal (r14
#: optimization, guide §1.2 applied to the driver process): the former
#: ``F.array(*[F.array(*[F.lit(float(v)) ...])])`` construction issued
#: ~1,040 py4j round trips per invocation — measured 2.6 s of driver
#: time per query at any SF. ``repr(float)`` is the shortest
#: round-trip rendering and Spark's double parser returns the nearest
#: double, so every literal resolves to the bit-identical value the
#: F.lit tree produced (pinned by collect-equality in
#: tests/test_plans.py). One F.expr parse: ~7 ms.
_PLANES_SQL = "array(%s)" % ", ".join(
    "array(%s)" % ", ".join(f"{v!r}D" for v in row) for row in _PLANES
)

#: banded sign-bit signature, same expression the HOF-lambda Column tree
#: built (CASE WHEN == F.when, CAST(1 AS BIGINT) == F.lit(1).cast) — the
#: in-order fold and bit packing are unchanged, only the construction
#: route differs.
_BANDS_SQL = (
    "transform(sequence(0, {nb}), i -> aggregate("
    "slice(transform({planes}, p -> CASE WHEN aggregate("
    "zip_with(p, embedding, (a, b) -> a * CAST(b AS DOUBLE)), 0.0D, "
    "(acc, v) -> acc + v) >= 0 THEN CAST(1 AS BIGINT) "
    "ELSE CAST(0 AS BIGINT) END), i * {bs} + 1, {bs}), "
    "CAST(0 AS BIGINT), (acc, b) -> acc * 2 + b))"
).format(nb=_N_BANDS - 1, bs=_BAND_SIZE, planes=_PLANES_SQL)


def _band_signatures(emb: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """(vec_id, band_idx, band_val [, keep_cols]): sign-bit LSH signature
    banded à la MinHash — a candidate pair needs only ONE band to collide,
    which keeps recall usable even when exact 16-bit buckets would all be
    singletons."""
    return emb.select(
        "vec_id",
        *(keep_cols or []),
        F.posexplode(F.expr(_BANDS_SQL)).alias("band_idx", "band_val"),
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded random-hyperplane LSH ANN (§2B scale path): 16 sign bits in
    4 bands of 4; any band collision makes a candidate; exact cosine
    re-rank of candidates only.

    Scale shape: signatures shuffle by (band_idx, band_val) — each query
    probes its own buckets instead of scanning all candidates; the exact
    re-rank touches only the candidate set. Deterministic hyperplanes
    (hash-derived, no RNG state) make even this *approximate* operator
    bit-reproducible — which is why it can be oracle-checked at all.
    """
    emb = load_table(spark, "embeddings", sf_dir)
    sigs = _band_signatures(emb)
    qsigs = (
        sigs.filter(F.col("vec_id").isin(_QUERY_IDS))
        .withColumnRenamed("vec_id", "query_id")
    )
    cand = (
        sigs.join(F.broadcast(qsigs), ["band_idx", "band_val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    embn = _with_norm(emb, "embedding", "enorm")
    q = embn.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("enorm").alias("qnorm"),
    )
    scored = (
        cand.join(embn, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot_col("embedding", "qv") / (F.col("enorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


def _planes_values_sql() -> str:
    """The hyperplanes as a DuckDB VALUES list — float repr round-trips
    exactly, so both engines hash/sign the very same doubles."""
    rows = []
    for pid, row in enumerate(_PLANES):
        lits = ", ".join(repr(v) for v in row)
        rows.append(f"({pid}, [{lits}]::DOUBLE[])")
    return ",\n  ".join(rows)


ANN_LSH_TOPK_SQL = f"""
WITH planes(pid, pv) AS (VALUES
  {_planes_values_sql()}
),
bits AS (
  SELECT e.vec_id, p.pid,
         CASE WHEN {_SQL_DOT.format(a='p.pv', b='e.embedding')} >= 0
              THEN 1 ELSE 0 END AS b
  FROM embeddings e CROSS JOIN planes p
),
bands AS (
  SELECT vec_id, pid // {_BAND_SIZE} AS band_idx,
         SUM(b * (1 << ({_BAND_SIZE} - 1 - (pid % {_BAND_SIZE}))))::BIGINT AS band_val
  FROM bits GROUP BY vec_id, pid // {_BAND_SIZE}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM bands q
  JOIN bands c ON q.band_idx = c.band_idx AND q.band_val = c.band_val
  WHERE q.vec_id IN (0, 1, 2, 3, 4) AND c.vec_id != q.vec_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         {_SQL_DOT.format(a='e.embedding', b='q.embedding')}
           / ({_SQL_NORM.format(a='e.embedding')} * {_SQL_NORM.format(a='q.embedding')})
           AS cosine
  FROM cand
  JOIN embeddings e ON e.vec_id = cand.vec_id
  JOIN embeddings q ON q.vec_id = cand.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
"""


#: Per-label block size above which the exact all-pairs join hands off to
#: the banded-LSH candidate path. Sized so every block in the synthetic
#: testdata (max 218 at sf0.1) stays exact — but a production hot label
#: (the cartesian bomb at 100 TB) is bounded instead of exploding.
_BLOCK_CAP = 1024


def _exact_block_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """All same-label pairs with exact cosine — Σ|block|² cost, only safe
    for bounded blocks."""
    embn = _with_norm(emb, "embedding", "_nrm")
    a = embn.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"),
        F.col("_nrm").alias("n1"), "label",
    )
    b = embn.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"),
        F.col("_nrm").alias("n2"), F.col("label").alias("label2"),
    )
    return (
        a.join(b, (F.col("label") == F.col("label2")) & (F.col("v1") < F.col("v2")))
        .select(
            "v1",
            "v2",
            (_dot_col("e1", "e2") / (F.col("n1") * F.col("n2"))).alias("cosine"),
        )
        .filter(F.col("cosine") > threshold)
    )


def _hot_block_candidates(emb: DataFrame) -> DataFrame:
    """Candidate pairs for oversized label blocks: banded sign-bit LSH
    self-join within the label — (v1, v2) where the pair collides in at
    least one band. Cost is Σ|bucket|² over (label, band, value) buckets,
    sub-quadratic whenever the block's vectors spread across buckets (the
    non-dup bulk of a hot label does; true near-dups share sign bits and
    collide). Recall note: at very low cosine thresholds sign-bit LSH is
    probabilistic — this path targets the semantic-dedup regime (high
    cosine) where band collision is near-certain."""
    sigs = _band_signatures(emb, keep_cols=["label"])
    a = sigs.select(
        F.col("vec_id").alias("v1"), "label", "band_idx", "band_val"
    )
    b = sigs.select(
        F.col("vec_id").alias("v2"),
        F.col("label").alias("label2"),
        F.col("band_idx").alias("band_idx2"),
        F.col("band_val").alias("band_val2"),
    )
    return (
        a.join(
            b,
            (F.col("label") == F.col("label2"))
            & (F.col("band_idx") == F.col("band_idx2"))
            & (F.col("band_val") == F.col("band_val2"))
            & (F.col("v1") < F.col("v2")),
        )
        .select("v1", "v2")
        .distinct()
    )


#: below this cosine threshold the 4×16 sign-bit banding loses real recall
#: (single-bit agreement P ≈ 0.6 at cosine 0.3 → ~half the qualifying pairs
#: of a hot block would be silently dropped) — the hot path refuses instead
_LSH_SAFE_THRESHOLD = 0.6


def neardup_pairs_bounded(
    emb: DataFrame, threshold: float = 0.30, block_cap: int = _BLOCK_CAP
) -> DataFrame:
    """Near-duplicate pairs with a BOUNDED quadratic term: labels at or
    under ``block_cap`` take the exact all-pairs path; oversized (hot)
    labels generate candidates through the banded-LSH self-join first and
    exact-score only the candidates. The union is the operator — at 100 TB
    one skewed label degrades to the LSH path instead of a cartesian
    explosion.

    Exactness contract: candidates from banding are exact-verified, so
    false POSITIVES never survive; false NEGATIVES (missed candidates) are
    negligible only in the semantic-dedup regime (threshold ≥
    ``_LSH_SAFE_THRESHOLD``, where near-dup sign bits collide with
    near-certainty — pinned empirically by
    ``test_hot_label_matches_exact``). Below that threshold a hot block
    would silently lose ~half its qualifying pairs, so the call REFUSES
    (raise block_cap or the threshold) instead. The check reads the
    per-label size frame the plan materializes anyway — one tiny count on
    an already-computed aggregate, not an extra corpus scan. (An in-plan
    ``assert_true`` guard is NOT usable here: Catalyst's constraint
    inference copies projection expressions into pushed-down not-null
    filters, which would evaluate the side-effecting assert on every
    row below the size filter.)"""
    sizes = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("_blk")
    ).localCheckpoint(eager=True)
    if threshold < _LSH_SAFE_THRESHOLD and (
        sizes.filter(F.col("_blk") > block_cap).limit(1).count() > 0
    ):
        raise ValueError(
            f"banded-LSH hot-block path is unsound below cosine "
            f"{_LSH_SAFE_THRESHOLD}: a label block exceeds "
            f"block_cap={block_cap}; raise block_cap or the threshold"
        )
    sized = emb.join(F.broadcast(sizes), "label")
    cold = sized.filter(F.col("_blk") <= block_cap).drop("_blk")
    hot = sized.filter(F.col("_blk") > block_cap).drop("_blk")
    cold_pairs = _exact_block_pairs(cold, threshold)
    cand = _hot_block_candidates(hot)
    hotn = _with_norm(hot, "embedding", "_nrm")
    hot_pairs = (
        cand.join(
            hotn.select(
                F.col("vec_id").alias("v1"),
                F.col("embedding").alias("e1"),
                F.col("_nrm").alias("n1"),
            ),
            "v1",
        )
        .join(
            hotn.select(
                F.col("vec_id").alias("v2"),
                F.col("embedding").alias("e2"),
                F.col("_nrm").alias("n2"),
            ),
            "v2",
        )
        .select(
            "v1",
            "v2",
            (_dot_col("e1", "e2") / (F.col("n1") * F.col("n2"))).alias("cosine"),
        )
        .filter(F.col("cosine") > threshold)
    )
    return cold_pairs.unionByName(hot_pairs)


def embedding_cosine_nearup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine > 0.30) by label-block
    prefilter (§2B embedding near-dup): same-label vectors only, exact
    cosine — the all-pairs version of similarity search used for semantic
    dedup. Blocking on `label` (a cluster id) bounds the quadratic term,
    and blocks over ``_BLOCK_CAP`` are further bounded by the banded-LSH
    candidate path (see :func:`neardup_pairs_bounded`)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return neardup_pairs_bounded(emb)


EMBEDDING_COSINE_NEARDUP_SQL = f"""
SELECT a.vec_id AS v1, b.vec_id AS v2,
       {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
         / ({_SQL_NORM.format(a='a.embedding')} * {_SQL_NORM.format(a='b.embedding')})
         AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
        / ({_SQL_NORM.format(a='a.embedding')} * {_SQL_NORM.format(a='b.embedding')})
        > 0.30
"""


#: IVF coarse quantizer: every M-th vector is a centroid (deterministic
#: sample — no RNG, no iterative k-means, so the DuckDB oracle reproduces
#: the identical partition assignment); each query probes the P nearest
#: inverted lists.
_IVF_CENTROID_STRIDE = 100
_IVF_NPROBE = 3


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (§2B similarity scale path, the inverted-file
    counterpart of :func:`ann_lsh_topk`): coarse-quantize the corpus into
    inverted lists by nearest centroid, probe only the ``_IVF_NPROBE``
    closest lists per query, exact cosine re-rank inside the probed lists.

    Scale shape: assignment is one broadcast of the centroid set (|corpus|
    / stride rows) against the corpus scan; the probe join touches
    |corpus| × nprobe / nlist candidates instead of the full corpus —
    the standard IVF trade (recall vs lists probed). Determinism: centroids
    are a stride-sample of vec_ids (no RNG, no k-means iterations), so the
    whole index — and therefore the approximate RESULT — is reproducible
    cross-engine, which is what makes an approximate index oracle-checkable.
    """
    emb = _with_norm(
        load_table(spark, "embeddings", sf_dir), "embedding", "enorm"
    )
    cent = emb.filter(F.col("vec_id") % _IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cv"),
        F.col("enorm").alias("cnorm"),
    )

    def _nearest(df: DataFrame, vec_col: str, norm_col: str, id_col: str,
                 k: int, out: str) -> DataFrame:
        """Top-k centroids by cosine for each row of df (broadcast cent).
        Window form, kept for the k>1 probe side only: the probe input is
        the bounded query set, so the scored frame is k_queries×nlist rows
        and the sort is trivial. The corpus-sized k=1 assignment goes
        through :func:`_assign_nearest` instead (partial agg, no shuffle
        of the scored cross product — r14 optimization)."""
        scored = df.join(F.broadcast(cent), how="cross").select(
            id_col,
            "cent_id",
            (
                _dot_col(vec_col, "cv") / (F.col(norm_col) * F.col("cnorm"))
            ).alias("_csim"),
        )
        w = W.partitionBy(id_col).orderBy(F.col("_csim").desc(), F.col("cent_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .select(id_col, F.col("cent_id").alias(out))
        )

    # inverted lists: every vector assigned to its single nearest centroid
    # — argmax by aggregation, not window (see _assign_nearest)
    lists = _assign_nearest(
        emb.select("vec_id", "embedding", "enorm"), cent,
        "embedding", "enorm", "vec_id", "list_id",
    )
    # queries probe their _IVF_NPROBE nearest lists
    q = emb.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("enorm").alias("qnorm"),
    )
    probes = _nearest(q, "qv", "qnorm", "query_id", _IVF_NPROBE, "list_id")
    cand = (
        probes.join(lists, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    scored = (
        cand.join(emb.select("vec_id", "embedding", "enorm"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot_col("embedding", "qv") / (F.col("enorm") * F.col("qnorm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", "rnk")
    )


_SQL_COS = (
    f"{_SQL_DOT.format(a='{a}', b='{b}')}"
    f" / ({_SQL_NORM.format(a='{a}')} * {_SQL_NORM.format(a='{b}')})"
)

ANN_IVF_TOPK_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
  WHERE vec_id % {_IVF_CENTROID_STRIDE} = 0
),
assign AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.cv')} DESC,
                      c.cent_id) AS r
    FROM embeddings e CROSS JOIN cent c
  ) WHERE r = 1
),
probes AS (
  SELECT query_id, cent_id AS list_id FROM (
    SELECT e.vec_id AS query_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.cv')} DESC,
                      c.cent_id) AS r
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id IN (0, 1, 2, 3, 4)
  ) WHERE r <= {_IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON p.list_id = a.list_id
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         {_SQL_COS.format(a='e.embedding', b='q.embedding')} AS cosine
  FROM cand
  JOIN embeddings e ON e.vec_id = cand.vec_id
  JOIN embeddings q ON q.vec_id = cand.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
"""


def ann_ml_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via stock spark.ml ``BucketedRandomProjectionLSH`` (§2B names
    this primitive): Euclidean-bucketed approximate self-join under
    distance 1.2 (the corpus's minimum pairwise distance is ~1.04, so a
    1.0 radius would return ZERO pairs — see the threshold comment at
    the join call), seeded for within-Spark determinism. Rows-only check:
    the hash family is MLlib-internal, so no cross-engine oracle — the
    custom ann_lsh_topk above is the oracle-checked path; this entry
    proves the engine also drives the stock primitive.

    Verification posture: RECALL-BOUNDED VS EXACT TWIN. In-repo tests pin
    (a) soundness — every emitted pair's distance is genuinely under the
    join radius — and (b) completeness at recall ≥ 0.8 against BOTH the
    quadratic exact pair set and ann_brute_topk's top-k neighborhoods
    restricted to the join radius (tests/test_similarity_bounds.py::
    test_brp_lsh_sound_and_high_recall / test_brp_lsh_recall_vs_brute_topk)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(emb)
    # threshold sits at the ~1st percentile of the pairwise distance
    # distribution (min ≈ 1.04), so the join returns the genuinely nearest
    # pairs rather than matching vacuously
    pairs = model.approxSimilarityJoin(emb, emb, 1.2, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("v1"),
            F.col("datasetB.vec_id").alias("v2"),
            "dist",
        )
    )


#: k-means: seed every Nth vector (deterministic, reproducible
#: cross-engine — same discipline as the IVF coarse quantizer) and run a
#: FIXED number of Lloyd iterations so both engines compute the identical
#: trajectory. At the TESTDATA sizes the stride seeds 5 clusters.
_KM_STRIDE = 100
_KM_ITERS = 2


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means corpus clustering (the SemDeDup-style grouping
    step of embedding pipelines): stride-seeded centroids, then
    ``_KM_ITERS`` Lloyd rounds of [assign to nearest centroid by cosine →
    recompute centroids as element-wise means]. Returns the final
    (vec_id, cluster) assignment.

    Cross-engine exactness, the part that makes an ITERATIVE float
    algorithm oracle-checkable: (1) seeding is a stride sample, no RNG;
    (2) iteration count is fixed, no convergence test on floats; (3) the
    centroid mean runs per element through the decimal-accumulator trick
    (a float's 24-bit significand can never sit exactly ON a decimal(38,12)
    rounding boundary, so both engines round identically, sum exactly, and
    produce bit-equal double centroids); (4) cosine is the module's
    in-order fold; ties break on cluster id. Any divergence anywhere in
    the trajectory flips assignments and fails the hash.

    Scale shape: assignment is one broadcast of k centroids against the
    corpus scan per round (O(n·k) fused in codegen, no shuffle of
    embeddings); the centroid update shuffles (cluster, dim) partial sums
    — k·d rows — never vectors. This is exactly distributed Lloyd's.
    """
    emb = _with_norm(
        load_table(spark, "embeddings", sf_dir), "embedding", "enorm"
    ).select("vec_id", "embedding", "enorm")
    cent = emb.filter(F.col("vec_id") % _KM_STRIDE == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("enorm").alias("cnorm"),
    )

    def _assign(c: DataFrame) -> DataFrame:
        # nearest-centroid argmax by aggregation, not window: only one
        # pre-aggregated row per vector reaches the exchange instead of
        # the full corpus×k scored frame, each Lloyd round
        # (see _assign_nearest — r14 optimization)
        return _assign_nearest(
            emb, c, "embedding", "enorm", "vec_id", "cluster",
            cent_id_col="cid",
        )

    assign = _assign(cent)
    for _ in range(_KM_ITERS - 1):
        pos = emb.select(
            "vec_id", F.posexplode("embedding").alias("pos", "val")
        )
        means = (
            pos.join(assign, "vec_id")
            .groupBy(F.col("cluster").alias("cid"), "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("v")
            )
        )
        cent = means.groupBy("cid").agg(
            F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("s")
        ).select(
            "cid", F.expr("transform(s, x -> x.v)").alias("cv")
        )
        cent = _with_norm(cent, "cv", "cnorm")
        assign = _assign(cent)
    return assign


KMEANS_ASSIGN_SQL = f"""
WITH cent0 AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id % {_KM_STRIDE} = 0
),
a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_COS.format(a='e.embedding', b='c.cv')} DESC,
                      c.cid) AS r
    FROM embeddings e CROSS JOIN cent0 c
  ) WHERE r = 1
),
elems AS (
  SELECT e.vec_id, t.pos, e.embedding[t.pos] AS val
  FROM embeddings e,
       UNNEST(range(1, len(e.embedding) + 1)) AS t(pos)
),
means AS (
  SELECT a1.cluster AS cid, elems.pos,
         CAST(SUM(CAST(elems.val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS v
  FROM elems JOIN a1 ON elems.vec_id = a1.vec_id
  GROUP BY a1.cluster, elems.pos
),
cent1 AS (
  SELECT cid, list(v ORDER BY pos) AS cv FROM means GROUP BY cid
)
SELECT vec_id, cid AS cluster FROM (
  SELECT e.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_SQL_COS.format(a='e.embedding', b='c.cv')} DESC,
                    c.cid) AS r
  FROM embeddings e CROSS JOIN cent1 c
) WHERE r = 1
"""


#: semantic-dedup similarity threshold. The synthetic corpus has no true
#: near-duplicate embeddings (pairwise cosine maxes out ≈ 0.51), so the
#: demo threshold sits at the ~99th percentile of the pairwise
#: distribution — high enough to be selective, low enough that the drop
#: path is actually exercised; production SemDeDup would use ~0.9+.
_SEMDEDUP_TAU = 0.3


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus
    (:func:`kmeans_assign`), then inside each cluster drop every vector
    that has a more-similar-than-τ neighbor with a LOWER vec_id (the
    deterministic keep-the-smallest-id rule the exact-dedup path also
    uses). Returns (vec_id, cluster, is_kept) for the whole corpus.

    The clustering is what makes this scale: candidate pairs are confined
    to clusters (Σ|cluster|² instead of n², with cluster counts driven by
    k), so the quadratic step never sees the corpus — the same
    candidate-bounding role LSH bands play for text MinHash. Cosine uses
    the module's in-order fold, so the pair set — and therefore the
    keep/drop verdicts — are engine-exact."""
    # the assignment plan (k Lloyd rounds of broadcast-k scoring windows)
    # feeds THREE consumers: both self-join branches and the final keep
    # join — checkpoint it or each branch re-executes the O(n·k) scoring
    # (exchange reuse dedupes only the shuffle stages, not the
    # post-exchange windows; r6 review)
    assign = kmeans_assign(spark, sf_dir).localCheckpoint(eager=True)
    emb = _with_norm(
        load_table(spark, "embeddings", sf_dir), "embedding", "enorm"
    ).select("vec_id", "embedding", "enorm")
    both = emb.join(assign, "vec_id")
    a = both.alias("a")
    b = both.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .filter(
            (
                _dot_col("a.embedding", "b.embedding")
                / (F.col("a.enorm") * F.col("b.enorm"))
            )
            > _SEMDEDUP_TAU
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    return assign.join(
        dropped.withColumn("_dropped", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "cluster",
        # marker is True or NULL — the null test IS the verdict (and the
        # same form the oracle uses: d.vec_id IS NULL AS is_kept)
        F.col("_dropped").isNull().alias("is_kept"),
    )


SEMANTIC_DEDUP_SQL = f"""
WITH assign AS (
{KMEANS_ASSIGN_SQL}
),
memb AS (
  SELECT e.vec_id, e.embedding, a.cluster
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM memb a JOIN memb b
    ON a.cluster = b.cluster AND a.vec_id > b.vec_id
  WHERE {_SQL_COS.format(a='a.embedding', b='b.embedding')} > {_SEMDEDUP_TAU}
)
SELECT a.vec_id, a.cluster, d.vec_id IS NULL AS is_kept
FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (the compression step every
    large-scale vector index runs before storage): each embedding maps
    its own [min, max] onto 0..255, and the query reports the integer
    checksum of the codes, the code range, and the max dequantization
    error — the acceptance metrics a quantized-index build logs.

    Engine-exactness choices: code = floor(t·255 + 0.5) instead of
    round() (Spark's round is HALF_UP, DuckDB's differs on computed .5
    ties; floor is identical everywhere), all element math is per-element
    IEEE doubles (no cross-element fold), the checksum is an INTEGER sum
    (order-independent), and the error metric is a MAX (also
    order-independent) — nothing depends on array traversal order.
    Constant vectors (span 0) quantize to code 0 by definition.

    Scale shape: single-scan per-row projection — no shuffle, no Python.
    The array HOFs here evaluate per ELEMENT outside whole-stage codegen,
    which is fine at one row per vector (64 lambda evals/row); contrast
    _minhash_wide, whose per-SHINGLE volume is why that path avoids HOFs
    entirely."""
    emb = load_table(spark, "embeddings", sf_dir)
    x = F.transform("embedding", lambda v: v.cast("double"))
    mn = F.array_min(x)
    mx = F.array_max(x)
    span = mx - mn
    codes = F.transform(
        x,
        lambda v: F.when(span == 0, F.lit(0)).otherwise(
            F.floor((v - mn) / span * 255 + 0.5)
        ).cast("long"),
    )
    dq = F.transform(
        codes, lambda q: mn + q.cast("double") * span / 255
    )
    err = F.array_max(
        F.zip_with(x, dq, lambda a, b: F.abs(a - b))
    )
    return emb.select(
        "vec_id",
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "q_sum"
        ),
        F.array_min(codes).alias("q_min"),
        F.array_max(codes).alias("q_max"),
        err.alias("max_abs_err"),
    )


EMBEDDING_QUANTIZE_INT8_SQL = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
  FROM embeddings
),
scaled AS (
  SELECT vec_id, x,
         list_min(x) AS mn,
         list_max(x) - list_min(x) AS span
  FROM base
),
coded AS (
  SELECT vec_id, x, mn, span,
         list_transform(
           x,
           v -> CASE WHEN span = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(FLOOR((v - mn) / span * 255 + 0.5) AS BIGINT)
                END
         ) AS codes
  FROM scaled
)
SELECT vec_id,
       CAST(list_sum(codes) AS BIGINT) AS q_sum,
       list_min(codes) AS q_min,
       list_max(codes) AS q_max,
       list_max(
         list_transform(
           list_zip(x, list_transform(codes,
                                      q -> mn + CAST(q AS DOUBLE) * span / 255)),
           p -> ABS(p[1] - p[2])
         )
       ) AS max_abs_err
FROM coded
"""


QUERIES = {
    "ann_brute_topk": ann_brute_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_cosine_nearup": embedding_cosine_nearup,
    "ann_ml_brp_lsh": ann_ml_brp_lsh,
    "kmeans_assign": kmeans_assign,
    "semantic_dedup": semantic_dedup,
    "embedding_quantize_int8": embedding_quantize_int8,
}

ORACLES = {
    "ann_brute_topk": ANN_BRUTE_TOPK_SQL,
    "ann_lsh_topk": ANN_LSH_TOPK_SQL,
    "ann_ivf_topk": ANN_IVF_TOPK_SQL,
    "embedding_cosine_nearup": EMBEDDING_COSINE_NEARDUP_SQL,
    "kmeans_assign": KMEANS_ASSIGN_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_INT8_SQL,
}
